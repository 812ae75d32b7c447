"""SP-path overhead A/B at its TARGET geometry (1024px patches) on ONE real
TPU chip — VERDICT r4 ask #5's paired measurement.

Sequence parallelism exists for big patches (1024px+, vit_l/h; SURVEY §2.2
SP row), but multi-chip hardware is not available here, so the measurable
question on one chip is: what does routing a region through the SP
machinery (shard_map programs + the collective encoder body, with identity
collectives at n=1) COST relative to the plain single-device engine at the
same geometry? Engine support: SP_SHARDS=1 with a 1-device mesh
(inference/engine.py), correctness pinned by
tests/test_multichip_inference.py::test_sp1_measurement_mode_matches_plain.

Both variants run the flax encoder (FUSED_ENCODER is mutually exclusive
with SP), the streamed k-band phase 1, and identical thresholds/workload;
rounds are interleaved (B A B A ...) so link weather hits both equally —
same protocol as tools/abtest_engine.py. Scale-out itself (SP=2..8) is
validated on the virtual CPU mesh (bit-identity + all_gather comms
envelope, tests/test_seq_parallel.py, tests/test_multichip_inference.py).

Usage: python tools/ab_sp_1024.py [reps=5] [region_px=2048]
"""

import json
import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    region = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from sam_road_tpu.config import load_config
    from sam_road_tpu.inference.engine import TiledInferenceEngine
    from sam_road_tpu.models.sam_road import init_params
    from sam_road_tpu.parallel.mesh import make_mesh

    base = dict(
        DATASET="cityscale", SAM_VERSION="vit_b", PATCH_SIZE=1024,
        INFER_BATCH_SIZE=4, INFER_PATCHES_PER_EDGE=4, SAMPLE_MARGIN=64,
        COMPUTE_DTYPE="bfloat16", TOPO_SAMPLE_NUM=512,
        NEIGHBOR_RADIUS=64, MAX_NEIGHBOR_QUERIES=16,
        # SP cannot use the fused-kernel encoder; pin A to the same flax
        # encoder so the paired delta isolates the SP machinery itself.
        FUSED_ENCODER=False,
    )
    cfg_a = load_config(overrides=base)
    cfg_b = load_config(overrides={**base, "SP_SHARDS": 1})
    params = init_params(cfg_a)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(region, region, 3), dtype=np.uint8)

    eng_a = TiledInferenceEngine(cfg_a, params)
    eng_b = TiledInferenceEngine(
        cfg_b, params, mesh=make_mesh(1, jax.devices()[:1])
    )
    assert eng_b.sp_shards == 1, "SP measurement mode failed to engage"

    # identical realistic workload for both (thresholds from A's masks)
    _, _, kp, road = eng_a.infer_one_img(img)
    for c in (eng_a.config, eng_b.config):
        c.ITSC_THRESHOLD = float(np.quantile(kp / 255.0, 0.99))
        c.ROAD_THRESHOLD = float(np.quantile(road / 255.0, 0.92))
    na = eng_a.infer_one_img(img)
    nb = eng_b.infer_one_img(img)  # warm B's compiles at workload shapes
    print(f"# A(plain) nodes/edges {na[0].shape[0]}/{na[1].shape[0]}  "
          f"B(SP1) {nb[0].shape[0]}/{nb[1].shape[0]}", flush=True)

    t_a, t_b, ph_a, ph_b = [], [], [], []
    for r in range(reps):
        for name, eng, ts, phs in (("B", eng_b, t_b, ph_b),
                                   ("A", eng_a, t_a, ph_a)):
            t0 = time.time()
            eng.infer_one_img(img)
            ts.append(time.time() - t0)
            phs.append(dict(eng.last_timings))
            print(f"# round {r} {name}: {ts[-1]:.3f}s "
                  f"p1={eng.last_timings.get('phase1', 0):.3f}", flush=True)

    deltas = [b - a for a, b in zip(t_a, t_b)]  # SP overhead = B - A
    out = {
        "what": "SP machinery overhead at 1024px target geometry "
                "(plain single-chip vs SP_SHARDS=1 identity-collective "
                "mesh), interleaved rounds",
        "region_px": region, "patch_px": 1024,
        "plain_s": [round(t, 3) for t in t_a],
        "sp1_s": [round(t, 3) for t in t_b],
        "plain_min": round(min(t_a), 3), "sp1_min": round(min(t_b), 3),
        "plain_median": round(float(np.median(t_a)), 3),
        "sp1_median": round(float(np.median(t_b)), 3),
        "paired_sp_overhead_s": [round(d, 3) for d in deltas],
        "paired_sp_overhead_median": round(float(np.median(deltas)), 3),
        "plain_phase1_min": round(min(p["phase1"] for p in ph_a), 3),
        "sp1_phase1_min": round(min(p["phase1"] for p in ph_b), 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()


