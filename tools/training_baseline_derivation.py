"""Auditable derivation of the reference pipeline's TRAINING step time.

Mirror of tools/baseline_derivation.py for the train step. The reference
trains fp16 Lightning on ONE GPU with ONE DataLoader worker
(reference: train.py:30,66-80,100; config BATCH_SIZE 16, DATA_WORKER_NUM 1
in config/toponet_vitb_512_cityscale.yaml) and commits no throughput
number. Two independent bounds determine its steps/s:

  device bound: analytic fwd+bwd FLOPs at B=16 fp16 over an A100
                mixed-precision efficiency band;
  feed bound:   the per-sample host label generation
                (GraphLabelGenerator.sample_patch — rtree box query, NMS,
                KDTree kNN, BFS; reference dataset.py:127-231) TIMED on
                this host at the reference's algorithmic shape, divided by
                DATA_WORKER_NUM=1.

The reference's shipped configuration is FEED-bound by an order of
magnitude: one Python worker produces a 16-sample batch far slower than
the A100 consumes it (the repo's own framework needs >= 4 workers to feed
one v5e chip at 0.37 s/step, docs/DESIGN.md). Both bounds are reported;
honest throughput comparisons should quote both the shipped (feed-bound)
number and the idealized (device-bound) number.

Run: python tools/training_baseline_derivation.py
Feeds the BASELINE.md training row.
"""

from __future__ import annotations

import json
import time

import numpy as np

from baseline_derivation import vit_b_forward_flops


def time_label_generation(samples: int = 24) -> float:
    """Per-sample cost of the training label generator at cityscale shape
    (2048px tile, ~4 px subdivision, 512px patches, TOPO_SAMPLE_NUM 512,
    16 neighbor queries): this framework's port runs the same algorithmic
    stages as the reference (rtree box query -> random-scored NMS ->
    weighted source choice -> KDTree kNN -> BFS connectivity). The port
    memoizes repeated BFS sources within one sample where the reference
    recomputes them (reference dataset.py:181-189), and numpy BFS vs
    igraph-C BFS differ in constants — both make this a LOWER bound on the
    reference's per-sample cost, i.e. conservative (it can only make the
    reference look faster). Returns seconds/sample."""
    from sam_road_tpu.config import load_config
    from sam_road_tpu.data.graph_labels import GraphLabelGenerator

    rng = np.random.default_rng(0)
    # synthetic 2048px street grid at ~64px spacing: ~1k intersections,
    # realistic density for cityscale tiles
    size, spacing = 2048, 64
    adj: dict = {}

    def add(a, b):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)

    for x in range(spacing, size - spacing, spacing):
        for y in range(spacing, size - spacing, spacing):
            jx = int(rng.integers(-8, 9))
            if x + spacing < size - spacing:
                add((y, x), (y, x + spacing))
            if y + spacing < size - spacing:
                add((y, x), (y + spacing, x + jx if spacing < x + jx < size else x))

    cfg = load_config(overrides=dict(
        DATASET="cityscale", PATCH_SIZE=512, TOPO_SAMPLE_NUM=512,
        MAX_NEIGHBOR_QUERIES=16, NEIGHBOR_RADIUS=64, ROAD_NMS_RADIUS=16,
    ))
    gen = GraphLabelGenerator(cfg, adj, lambda v: v[:, ::-1])
    srng = np.random.default_rng(1)
    t0 = time.time()
    for i in range(samples):
        x0 = int(srng.integers(64, size - 512 - 64))
        y0 = int(srng.integers(64, size - 512 - 64))
        gen.sample_patch(((x0, y0), (x0 + 512, y0 + 512)),
                         int(srng.integers(0, 4)), srng)
    return (time.time() - t0) / samples


def main():
    B = 16  # reference BATCH_SIZE (config/toponet_vitb_512_cityscale.yaml)
    f = vit_b_forward_flops()
    # fwd + bwd ~= 3x fwd for the encoder/decoder (toponet + sampler are
    # < 1% of FLOPs); optimizer update is memory-bound and folded into the
    # efficiency band
    step_tflops = 3 * f["total"] * B / 1e12

    # A100 fp16 tensor-core peak 312 TFLOP/s; eager mixed-precision ViT
    # TRAINING lands at 20-40% whole-step utilization (backward's reduced
    # arithmetic intensity + fp32 master-weight traffic)
    fp16_peak = 312.0
    eff_hi, eff_lo = 0.40, 0.20
    t_dev = [step_tflops / (fp16_peak * eff_hi),
             step_tflops / (fp16_peak * eff_lo)]

    t_sample = time_label_generation()
    # reference: ONE worker produces B samples serially per step
    t_feed_ref = B * t_sample

    ref_step = [max(t_dev[0], t_feed_ref), max(t_dev[1], t_feed_ref)]

    ours_step_s = 0.370  # measured, docs/DESIGN.md (v5e, B=16, bf16)
    out = {
        "train_step_tflops_b16": round(step_tflops, 1),
        "a100_fp16_assumption": {"peak_tflops": fp16_peak,
                                 "efficiency_band": [eff_lo, eff_hi]},
        "t_device_band_s": [round(t, 3) for t in t_dev],
        "t_label_gen_per_sample_s": round(t_sample, 3),
        "t_feed_per_step_1worker_s": round(t_feed_ref, 2),
        "ref_shipped_step_s": [round(t, 2) for t in ref_step],
        "ref_shipped_patches_per_s": [round(B / t, 1) for t in ref_step[::-1]],
        "ref_device_bound_patches_per_s": [round(B / t, 1)
                                           for t in t_dev[::-1]],
        "ours_measured_step_s": ours_step_s,
        "ours_patches_per_s_per_chip": round(B / ours_step_s, 1),
        "workers_needed_to_feed_one_chip": int(np.ceil(
            (B * t_sample) / ours_step_s)),
        "note": "reference as shipped is FEED-bound (1 worker); idealized "
                "device-bound numbers also reported. Label-gen timed on "
                "this host at reference algorithmic shape on a dense "
                "synthetic street grid — per-sample cost scales with road "
                "density (docs/DESIGN.md measured ~0.09 s/sample on "
                "sparser fixtures), so worker counts are per-workload.",
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
