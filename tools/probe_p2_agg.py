"""Paired per-phase probe: host phase-2 aggregation vs INFER_P2_DEVICE_AGG.

Runs the same 2048px region through two engines in one process (tunnel
drift cancels), asserts the edge sets are bit-identical, then alternates
timed runs printing each engine's per-phase breakdown (phase1 / extract /
phase2 and the p2_build / p2_dispatch / p2_fetch split).

Recorded result (TPU, 2026-08-19, docs/DESIGN.md "Device-side phase-2
edge aggregation"): the device-agg path LOSES — host phase2 0.23-0.25 s
vs agg 0.29-0.38 s — so INFER_P2_DEVICE_AGG defaults to false.
Reference workload shape: /root/reference/inferencer.py:209-221.
"""
import time

import numpy as np

from sam_road_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

from sam_road_tpu.config import load_config
from sam_road_tpu.inference.engine import TiledInferenceEngine
from sam_road_tpu.models.sam_road import init_params


def main(rounds: int = 5) -> None:
    base = dict(DATASET="cityscale", PATCH_SIZE=512, INFER_BATCH_SIZE=32,
                INFER_PATCHES_PER_EDGE=16, SAMPLE_MARGIN=64,
                COMPUTE_DTYPE="bfloat16", TOPO_SAMPLE_NUM=512,
                FUSED_ENCODER=True)
    cfg_a = load_config(overrides=base)
    cfg_b = load_config(overrides={**base, "INFER_P2_DEVICE_AGG": True})
    params = init_params(cfg_a)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(2048, 2048, 3), dtype=np.uint8)
    ea = TiledInferenceEngine(cfg_a, params)
    eb = TiledInferenceEngine(cfg_b, params)
    _, _, kp, road = ea.infer_one_img(img)
    for c in (ea.config, eb.config):
        c.ITSC_THRESHOLD = float(np.quantile(kp / 255.0, 0.99))
        c.ROAD_THRESHOLD = float(np.quantile(road / 255.0, 0.92))
    na = ea.infer_one_img(img)
    nb = eb.infer_one_img(img)  # warm both paths
    assert np.array_equal(na[1], nb[1]), "edge sets must match"
    print("edges equal:", na[1].shape[0], flush=True)
    for r in range(rounds):
        for name, e in (("host", ea), ("agg", eb)):
            t0 = time.time()
            e.infer_one_img(img)
            dt = time.time() - t0
            lt = {k: round(v, 3) for k, v in e.last_timings.items()}
            print(f"{name}[{r}] {dt:.3f}s {lt}", flush=True)


if __name__ == "__main__":
    main()
