"""One-config training-throughput re-measure (B16 no-remat, the sweep's
best) to add a second weather point to TRAIN_SWEEP_r05.json's
compute-bound analysis: if s/step scales with delivered TFLOP/s across
weather states, the "compute-bound, projects to >=58 patches/s at healthy
capability" claim gains a measured slope instead of a single-point ratio.

Run: python tools/remeasure_train_best.py [n_steps]
"""

import json
import sys
import time
from functools import partial

import numpy as np


def main(n_steps=12):
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
    from sweep_train_throughput import make_batch

    canary = canary_measure(reps=2)
    print(json.dumps({"canary": canary}), flush=True)

    b = 16
    cfg = load_config(overrides=dict(
        PATCH_SIZE=512, BATCH_SIZE=b, COMPUTE_DTYPE="bfloat16",
        TOPO_SAMPLE_NUM=512, MAX_NEIGHBOR_QUERIES=16,
        REMAT_ENCODER=False,
    ))
    params = init_params(cfg)
    tx = build_optimizer(cfg, params, steps_per_epoch=100)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
    )
    step = jax.jit(partial(make_train_step(cfg), tx=tx), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    batch = make_batch(rng, b, jnp)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        state, aux = step(state, batch, key)
    jax.block_until_ready(state.step)
    t0 = time.time()
    for _ in range(n_steps):
        state, aux = step(state, batch, key)
    jax.block_until_ready(state.step)
    dt = (time.time() - t0) / n_steps
    print(json.dumps({
        "config": "B16_remat0", "s_per_step": round(dt, 4),
        "patches_per_s": round(b / dt, 1),
        "canary_tflops": canary.get("effective_tflops"),
        "loss_finite": bool(np.isfinite(float(aux["loss"]))),
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
