"""Paired same-process engine A/B on the real TPU.

The shared tunnel's run-to-run drift (documented up to ~30%, with whole
days of multi-second dispatch RTTs) swallows 0.1 s-scale engine
optimizations when variants are measured in separate processes. This tool
builds TWO TiledInferenceEngines in one process — A: the flagship default
config, B: default + a JSON override — warms both on the same 2048px
region, then runs them INTERLEAVED (B A B A ...) so link drift hits both
equally. Reports per-variant min/median and the paired per-round deltas
(the statistic that actually decides an A/B).

Usage:
  python tools/abtest_engine.py '<B overrides json>' [reps] ['<A overrides json>']
  # A defaults to the flagship config; pass a third arg to pin A too
  # (e.g. isolate one knob on top of a shared fused baseline).
"""

import json
import sys
import time

import numpy as np


def main():
    overrides = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    overrides_a = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from sam_road_tpu.config import load_config
    from sam_road_tpu.inference.engine import TiledInferenceEngine
    from sam_road_tpu.models.sam_road import init_params

    base = dict(
        DATASET="cityscale", PATCH_SIZE=512, INFER_BATCH_SIZE=32,
        INFER_PATCHES_PER_EDGE=16, SAMPLE_MARGIN=64,
        COMPUTE_DTYPE="bfloat16", TOPO_SAMPLE_NUM=512,
    )
    cfg_a = load_config(overrides={**base, **overrides_a})
    cfg_b = load_config(overrides={**base, **overrides})
    params = init_params(cfg_a)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(2048, 2048, 3), dtype=np.uint8)

    eng_a = TiledInferenceEngine(cfg_a, params)
    eng_b = TiledInferenceEngine(cfg_b, params)

    # identical realistic workload for both (thresholds from A's masks)
    _, _, kp, road = eng_a.infer_one_img(img)
    for c in (eng_a.config, eng_b.config):
        c.ITSC_THRESHOLD = float(np.quantile(kp / 255.0, 0.99))
        c.ROAD_THRESHOLD = float(np.quantile(road / 255.0, 0.92))
    na = eng_a.infer_one_img(img)
    nb = eng_b.infer_one_img(img)  # warm B's compiles at workload shapes
    print(f"# A nodes/edges {na[0].shape[0]}/{na[1].shape[0]}  "
          f"B {nb[0].shape[0]}/{nb[1].shape[0]}", flush=True)

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

    deltas = [a - b for a, b in zip(t_a, t_b)]
    out = {
        "overrides": overrides,
        "overrides_a": overrides_a,
        "a_s": [round(t, 3) for t in t_a],
        "b_s": [round(t, 3) for t in t_b],
        "a_min": round(min(t_a), 3), "b_min": round(min(t_b), 3),
        "a_median": round(float(np.median(t_a)), 3),
        "b_median": round(float(np.median(t_b)), 3),
        "paired_delta_a_minus_b": [round(d, 3) for d in deltas],
        "paired_delta_median": round(float(np.median(deltas)), 3),
        "a_phase1_min": round(min(p["phase1"] for p in ph_a), 3),
        "b_phase1_min": round(min(p["phase1"] for p in ph_b), 3),
    }
    # surface any speculative-phase-2 counters from the last rounds
    spec_b = {k: v for k, v in ph_b[-1].items() if k.startswith("spec")}
    if spec_b:
        out["b_spec_last"] = spec_b
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
