"""Weather decomposition probe: interleave bench-identical region runs with
a per-run mini-canary (matmul TFLOP/s + link RTT + H2D rate) to attribute
run-to-run region-time variance to device weather axes.

VERDICT r4 ask #1: the driver-captured bench MEDIAN (1.904 s) sits above the
5x line (1.70 s) while the min (1.64 s) is below it; this probe measures
whether the spread is explained by the shared chip's compute/link weather
(multi-tenant swings, docs/DESIGN.md round-3 protocol) or by something the
engine controls. Output: per-run (total, phase1, phase2, tflops, rtt,
h2d) rows + least-squares fit of phase1 against 1/tflops and rtt.

Usage: python tools/probe_weather.py [n_runs] [spacing_s]
"""

import json
import sys
import time

import numpy as np


def main():
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    spacing = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from sam_road_tpu.config import load_config
    from sam_road_tpu.inference.engine import TiledInferenceEngine
    from sam_road_tpu.models.sam_road import init_params

    sys.path.insert(0, "tools")
    from device_canary import measure as canary_measure

    base = dict(
        DATASET="cityscale", PATCH_SIZE=512, INFER_BATCH_SIZE=32,
        INFER_PATCHES_PER_EDGE=16, SAMPLE_MARGIN=64,
        COMPUTE_DTYPE="bfloat16", TOPO_SAMPLE_NUM=512, FUSED_ENCODER=True,
    )
    config = load_config(overrides=base)
    params = init_params(config)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(2048, 2048, 3), dtype=np.uint8)
    engine = TiledInferenceEngine(config, params)
    _, _, kp_mask, road_mask = engine.infer_one_img(img)  # warmup/compile
    engine.config.ITSC_THRESHOLD = float(np.quantile(kp_mask / 255.0, 0.99))
    engine.config.ROAD_THRESHOLD = float(np.quantile(road_mask / 255.0, 0.92))
    engine.infer_one_img(img)  # workload warmup (new thresholds)

    rows = []
    for i in range(n_runs):
        c = canary_measure(reps=1)
        t0 = time.time()
        engine.infer_one_img(img)
        total = time.time() - t0
        row = {
            "run": i, "total": round(total, 3),
            **{k: round(v, 3) for k, v in engine.last_timings.items()},
            "tflops": c["effective_tflops"], "rtt_ms": c["link_rtt_ms"],
            "h2d_mbps": c["h2d_mbps"],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if spacing:
            time.sleep(spacing)

    # least-squares: phase1 ~ a * (1/tflops) + b * rtt_ms + c
    p1 = np.array([r["phase1"] for r in rows])
    tot = np.array([r["total"] for r in rows])
    inv_tf = np.array([1.0 / r["tflops"] for r in rows])
    rtt = np.array([r["rtt_ms"] for r in rows]) / 1e3
    inv_bw = np.array([1.0 / r["h2d_mbps"] for r in rows])

    def fit(y, cols, names):
        X = np.stack(cols + [np.ones_like(y)], axis=1)
        coef, *_ = np.linalg.lstsq(X, y, rcond=None)
        pred = X @ coef
        ss_res = float(((y - pred) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else float("nan")
        return {"coef": {n: round(float(cv), 4)
                         for n, cv in zip(names + ["const"], coef)},
                "r2": round(r2, 3)}

    out = {
        "n": n_runs,
        "total_min": round(float(tot.min()), 3),
        "total_median": round(float(np.median(tot)), 3),
        "phase1_fit_invtflops": fit(p1, [inv_tf], ["inv_tflops"]),
        "phase1_fit_full": fit(p1, [inv_tf, rtt, inv_bw],
                               ["inv_tflops", "rtt_s", "inv_h2d"]),
        "total_fit_full": fit(tot, [inv_tf, rtt, inv_bw],
                              ["inv_tflops", "rtt_s", "inv_h2d"]),
        "corr_phase1_invtflops": round(
            float(np.corrcoef(p1, inv_tf)[0, 1]), 3) if n_runs > 2 else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
