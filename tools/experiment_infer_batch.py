"""INFER_BATCH_SIZE sweep on the real TPU (VERDICT r1 item 2).

Runs the bench workload (2048px region, ViT-B 512px patches, bf16) at
several phase-1 batch sizes, optionally with the fused encoder, and prints
min-of-3 region seconds + phase breakdown per variant. Usage:

    python tools/experiment_infer_batch.py [B ...]      # default 16 32 64
    FUSED=1 python tools/experiment_infer_batch.py ...  # fused encoder path
"""

import json
import os
import sys
import time

import numpy as np


def main(batch_sizes):
    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from sam_road_tpu.config import load_config
    from sam_road_tpu.inference.engine import TiledInferenceEngine
    from sam_road_tpu.models.sam_road import init_params

    fused = os.environ.get("FUSED", "0") == "1"
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(2048, 2048, 3), dtype=np.uint8)
    results = {}
    params = None
    for B in batch_sizes:
        config = load_config(
            overrides=dict(
                DATASET="cityscale", PATCH_SIZE=512, INFER_BATCH_SIZE=B,
                INFER_PATCHES_PER_EDGE=16, SAMPLE_MARGIN=64,
                COMPUTE_DTYPE="bfloat16", TOPO_SAMPLE_NUM=512,
                FUSED_ENCODER=fused,
            )
        )
        if params is None:
            params = init_params(config)
        try:
            engine = TiledInferenceEngine(config, params)
            _, _, kp, road = engine.infer_one_img(img)  # warmup/compile
            engine.config.ITSC_THRESHOLD = float(np.quantile(kp / 255.0, 0.99))
            engine.config.ROAD_THRESHOLD = float(np.quantile(road / 255.0, 0.92))
            engine.infer_one_img(img)
            times, details = [], []
            for _ in range(3):
                t0 = time.time()
                engine.infer_one_img(img)
                times.append(time.time() - t0)
                details.append({k: round(v, 3) for k, v in engine.last_timings.items()})
            best = int(np.argmin(times))
            results[f"B{B}" + ("_fused" if fused else "")] = {
                "min_s": round(min(times), 3),
                "timings": details[best],
            }
        except Exception as e:
            results[f"B{B}" + ("_fused" if fused else "")] = (
                f"FAIL: {str(e)[:4000]}"
            )
        print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    bs = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    main(bs)
