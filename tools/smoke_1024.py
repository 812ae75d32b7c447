"""1024px-config TPU smoke: run the flagship-depth encoder at the
toponet_vitb_1024.yaml geometry (4096 tokens, blocked flash attention for
the global blocks' 64 MB score matrices) on real hardware, timing the
Pallas blocked-flash path against the plain-XLA attention path and
checking their agreement (SURVEY §5 long-context row; VERDICT r2 missing
#5 — the config had never executed on a chip).

Runs a phase-1-shaped batch: encoder + decoder forward at B=4, 1024px,
bf16, both FLASH_ATTENTION settings, scanned-in-jit timing (per-call RTT
amortized). Records go to docs/DESIGN.md.

Usage: python tools/smoke_1024.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from sam_road_tpu.config import load_config
    from sam_road_tpu.models.sam_road import SAMRoad, build_model, init_params

    results = {}
    ITERS = 3
    B = 4
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 255, size=(B, 1024, 1024, 3)),
                      jnp.float32)

    outs = {}
    for flash in (True, False):
        cfg = load_config("configs/toponet_vitb_1024.yaml",
                          overrides=dict(FLASH_ATTENTION=flash))
        model = build_model(cfg)
        params = init_params(cfg)

        @jax.jit
        def run(p, xx):
            def step(c, _):
                scores, feats = model.apply(
                    {"params": p}, xx + c,
                    method=SAMRoad.infer_masks_and_features,
                )
                s = jnp.abs(scores.astype(jnp.float32)).sum()
                return (s * 1e-30).astype(xx.dtype), (s, scores[0, ::64, ::64, 0])
            _, (ss, probe) = jax.lax.scan(
                step, jnp.zeros((), xx.dtype), None, length=ITERS
            )
            return ss, probe[0]

        label = "flash" if flash else "xla"
        t0 = time.time()
        ss, probe = run(params, rgb)
        l1 = float(ss[0])
        results[label + "_compile_s"] = round(time.time() - t0, 1)
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(run(params, rgb)[0][0])
            ts.append(time.time() - t0)
        results[label + "_batch_ms"] = round(min(ts) / ITERS * 1e3, 1)
        results[label + "_l1"] = l1
        outs[label] = np.asarray(probe)
        print(f"# {label}: {results[label + '_batch_ms']} ms/batch "
              f"(B={B}, 1024px)", flush=True)

    # init_params is PRNGKey(0)-deterministic and FLASH_ATTENTION does not
    # change parameter shapes, so both variants ran identical weights and
    # the probes are directly comparable.
    results["mask_probe_maxdiff"] = float(
        np.abs(outs["flash"] - outs["xla"]).max()
    )
    results["per_patch_ms"] = {
        k: round(results[k + "_batch_ms"] / B, 1) for k in ("flash", "xla")
    }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
