"""Paired same-process A/B: serialized vs concurrent streamed-slab uploads.

INFER_STREAM_SERIAL_UPLOAD is read per-call in engine._phase1_streamed and
changes NO compiled program, so flipping it between runs is a clean paired
comparison under identical weather. Interleaved A/B/A/B... rounds; reports
per-round phase1/total and paired deltas.

Run: python tools/ab_serial_upload.py [n_pairs]
"""

import json
import sys
import time

import numpy as np


def main(pairs=6):
    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from sam_road_tpu.config import load_config
    from sam_road_tpu.inference.engine import TiledInferenceEngine
    from sam_road_tpu.models.sam_road import init_params

    cfg = load_config(overrides=dict(
        DATASET="cityscale", PATCH_SIZE=512, INFER_BATCH_SIZE=32,
        INFER_PATCHES_PER_EDGE=16, SAMPLE_MARGIN=64,
        COMPUTE_DTYPE="bfloat16", TOPO_SAMPLE_NUM=512, FUSED_ENCODER=True,
    ))
    params = init_params(cfg)
    eng = TiledInferenceEngine(cfg, params)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(2048, 2048, 3), dtype=np.uint8)
    _, _, kp_mask, road_mask = eng.infer_one_img(img)  # warm compile
    eng.config.ITSC_THRESHOLD = float(np.quantile(kp_mask / 255.0, 0.99))
    eng.config.ROAD_THRESHOLD = float(np.quantile(road_mask / 255.0, 0.92))
    eng.infer_one_img(img)  # workload warm

    rows = []
    for r in range(pairs):
        rec = {"round": r}
        for mode, flag in (("serial", True), ("concurrent", False)):
            eng.config.INFER_STREAM_SERIAL_UPLOAD = flag
            t0 = time.time()
            eng.infer_one_img(img)
            rec[mode] = round(time.time() - t0, 3)
            rec[mode + "_p1"] = round(eng.last_timings["phase1"], 3)
        rec["delta"] = round(rec["concurrent"] - rec["serial"], 3)
        rec["delta_p1"] = round(
            rec["concurrent_p1"] - rec["serial_p1"], 3)
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    d = [r["delta"] for r in rows]
    dp = [r["delta_p1"] for r in rows]
    print(json.dumps({
        "paired_delta_total_median_s": round(float(np.median(d)), 3),
        "paired_delta_p1_median_s": round(float(np.median(dp)), 3),
        "serial_wins": sum(1 for x in d if x > 0),
        "n": len(d),
        "serial_min_total": min(r["serial"] for r in rows),
        "concurrent_min_total": min(r["concurrent"] for r in rows),
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
