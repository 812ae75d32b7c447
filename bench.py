"""Benchmark: Cityscale 2km x 2km (2048px) region inference, flagship config
(ViT-B 512px patches, 16x16 sliding window = 256 patches, bf16).

Prints ONE JSON line:
  {"metric": "cityscale_2km_region_infer_s", "value": <seconds>,
   "unit": "s", "vs_baseline": <ref_seconds / ours>}

vs_baseline uses REF_A100_REGION_SECONDS, an estimate of the reference
PyTorch pipeline's per-region wall time on an A100-class GPU (the reference
commits no number in-tree — BASELINE.md; its inference_time.txt mechanism
reports ~20-30 s/region for the two-phase 256-patch pipeline with host-side
NMS and Python aggregation loops). Update when a measured reference number is
available.

Weights are random-init (throughput is weight-agnostic); decoder output
biases are offset so mask densities match real road scenes (~8% road, ~1%
keypoint), giving the host extraction/NMS stage a realistic workload instead
of a degenerate all-above-threshold one.
"""

import json
import time

import numpy as np

REF_A100_REGION_SECONDS = 25.0  # documented estimate, see module docstring


def main():
    from sam_road_tpu.config import load_config
    from sam_road_tpu.inference.engine import TiledInferenceEngine
    from sam_road_tpu.models.sam_road import init_params

    config = load_config(
        overrides=dict(
            DATASET="cityscale",
            PATCH_SIZE=512,
            INFER_BATCH_SIZE=32,
            INFER_PATCHES_PER_EDGE=16,
            SAMPLE_MARGIN=64,
            COMPUTE_DTYPE="bfloat16",
            TOPO_SAMPLE_NUM=512,
        )
    )
    params = init_params(config)
    # Shift decoder output bias so sigmoid(mask) densities look like real
    # scenes: keypoint ~1%, road ~8% above threshold.
    bias = np.asarray(params["map_decoder"]["up_4"]["bias"]).copy()
    bias[:] = (-4.0, -2.0)
    params["map_decoder"]["up_4"]["bias"] = bias

    engine = TiledInferenceEngine(config, params)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(2048, 2048, 3), dtype=np.uint8)

    # Warmup: compile phase-1/phase-2 programs.
    engine.infer_one_img(img)

    times = []
    for _ in range(3):
        t0 = time.time()
        engine.infer_one_img(img)
        times.append(time.time() - t0)
    region_s = float(np.median(times))

    print(
        json.dumps(
            {
                "metric": "cityscale_2km_region_infer_s",
                "value": round(region_s, 3),
                "unit": "s",
                "vs_baseline": round(REF_A100_REGION_SECONDS / region_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
