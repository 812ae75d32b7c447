"""Training-throughput batch sweep (VERDICT r4 ask #3): measure flagship
train-step patches/s/chip at B in {16, 32, 48} x remat on/off.

The AOT memory table (tools/experiment_train_memory.py, docs/DESIGN.md)
shows ~3x batch headroom under remat at B=16; this tool measures whether
larger batches actually buy steps-per-second on the chip. Pure device
throughput: the batch is staged on device once and the timed loop chains
donated TrainStates, so the number is comparable to BASELINE.md's
idealized A100 device band (92-183 patches/s; v5e-normalized floor ~58).

Output: one JSON line per config {batch, remat, s_per_step, patches_per_s}
plus a canary before/after for weather attribution.

Run: python tools/sweep_train_throughput.py [n_steps]
"""

import json
import sys
import time
from functools import partial

import numpy as np


def make_batch(rng, b, jnp):
    s, p = 512, 16
    return {
        "rgb": jnp.asarray(
            rng.uniform(0, 255, (b, 512, 512, 3)), jnp.float32),
        "keypoint_mask": jnp.asarray(
            rng.random((b, 512, 512)) > 0.95, jnp.float32),
        "road_mask": jnp.asarray(
            rng.random((b, 512, 512)) > 0.8, jnp.float32),
        "graph_points": jnp.asarray(
            rng.uniform(0, 512, (b, 256, 2)), jnp.float32),
        "pairs": jnp.asarray(rng.integers(0, 256, (b, s, p, 2)), jnp.int32),
        "connected": jnp.asarray(rng.random((b, s, p)) > 0.5),
        "valid": jnp.asarray(rng.random((b, s, p)) > 0.2),
    }


def main(n_steps=8):
    import jax
    import jax.numpy as jnp

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from sam_road_tpu.config import load_config
    from sam_road_tpu.models.sam_road import init_params
    from sam_road_tpu.training.harness import (
        TrainState, build_optimizer, make_train_step,
    )

    sys.path.insert(0, "tools")
    from device_canary import measure as canary_measure

    print(json.dumps({"canary_before": canary_measure(reps=2)}), flush=True)

    results = []
    for b in (16, 32, 48):
        for remat in (False, True):
            cfg = load_config(overrides=dict(
                PATCH_SIZE=512, BATCH_SIZE=b, COMPUTE_DTYPE="bfloat16",
                TOPO_SAMPLE_NUM=512, MAX_NEIGHBOR_QUERIES=16,
                REMAT_ENCODER=remat,
            ))
            params = init_params(cfg)
            tx = build_optimizer(cfg, params, steps_per_epoch=100)
            state = TrainState(
                step=jnp.zeros((), jnp.int32), params=params,
                opt_state=tx.init(params),
            )
            step = jax.jit(
                partial(make_train_step(cfg), tx=tx), donate_argnums=(0,)
            )
            rng = np.random.default_rng(0)
            batch = make_batch(rng, b, jnp)
            key = jax.random.PRNGKey(0)
            label = f"B{b}_remat{int(remat)}"
            try:
                # warmup (compile) + 2 steady-state steps
                for _ in range(3):
                    state, aux = step(state, batch, key)
                jax.block_until_ready(state.step)
                t0 = time.time()
                for _ in range(n_steps):
                    state, aux = step(state, batch, key)
                jax.block_until_ready(state.step)
                dt = (time.time() - t0) / n_steps
                row = {
                    "config": label, "batch": b, "remat": remat,
                    "s_per_step": round(dt, 4),
                    "patches_per_s": round(b / dt, 1),
                    "loss_finite": bool(np.isfinite(float(aux["loss"]))),
                }
            except Exception as e:  # OOM or compile failure: record, move on
                row = {"config": label, "batch": b, "remat": remat,
                       "error": f"{type(e).__name__}: {str(e)[:200]}"}
            results.append(row)
            print(json.dumps(row), flush=True)
            # free the donated chain before the next config
            del state, step, tx, params, batch

    print(json.dumps({"canary_after": canary_measure(reps=2)}), flush=True)
    ok = [r for r in results if "patches_per_s" in r]
    if ok:
        best = max(ok, key=lambda r: r["patches_per_s"])
        print(json.dumps({"best": best,
                          "target_floor_patches_per_s": 58.0}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
