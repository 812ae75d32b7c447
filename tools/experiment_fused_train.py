"""Paired A/B: flax train step vs FUSED_ENCODER_TRAIN step (same process,
interleaved rounds) at flagship training shape — vit_b 512px B=16 bf16
(configs/toponet_vitb_512_cityscale.yaml; reference train step:
model.py:511-544, reference BATCH_SIZE 16).

Measures seconds/step and patches/s/chip for both paths. Feeds the
docs/DESIGN.md "Fused training step" record (VERDICT round-3 item 3:
target < 0.30 s/step vs the 0.37 s flax step).

Run (TPU): python tools/experiment_fused_train.py [--steps 8] [--rounds 3]
           [--remat] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from functools import partial

from sam_road_tpu.config import load_config
from sam_road_tpu.models.sam_road import init_params
from sam_road_tpu.training.harness import (
    TrainState,
    build_optimizer,
    make_train_step,
)


def _fake_batch(cfg, batch, n_pts=256, seed=0):
    rng = np.random.default_rng(seed)
    s, p = int(cfg.TOPO_SAMPLE_NUM), int(cfg.MAX_NEIGHBOR_QUERIES)
    ps = int(cfg.PATCH_SIZE)
    return {
        "rgb": rng.integers(0, 255, (batch, ps, ps, 3)).astype(np.uint8),
        "keypoint_mask": (rng.random((batch, ps, ps)) > 0.95).astype(np.uint8) * 255,
        "road_mask": (rng.random((batch, ps, ps)) > 0.8).astype(np.uint8) * 255,
        "graph_points": rng.uniform(0, ps, (batch, n_pts, 2)).astype(np.float32),
        "pairs": rng.integers(0, n_pts, (batch, s, p, 2)).astype(np.int32),
        "connected": rng.random((batch, s, p)) > 0.5,
        "valid": rng.random((batch, s, p)) > 0.2,
    }


def _build(cfg, params, batch):
    tx = build_optimizer(cfg, params, steps_per_epoch=100)
    # each arm gets its OWN device buffers: the step donates its state, so
    # sharing param arrays between arms would delete the other arm's state
    own = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=own,
        opt_state=jax.device_put(tx.init(own)),
    )
    raw = make_train_step(cfg)
    step = jax.jit(partial(raw, tx=tx), donate_argnums=(0,))
    dev_batch = jax.device_put({k: jnp.asarray(v) for k, v in batch.items()})
    return step, state, dev_batch


def _run(step, state, batch, rng, n):
    t0 = time.time()
    for i in range(n):
        rng, drng = jax.random.split(rng)
        state, aux = step(state, batch, drng)
    jax.block_until_ready(aux["loss"])
    return (time.time() - t0) / n, state, rng, float(aux["loss"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--remat", action="store_true",
                    help="REMAT_ENCODER on for both arms")
    args = ap.parse_args()

    over = dict(DP_SHARDS=0, DATA_WORKER_NUM=0, BATCH_SIZE=args.batch)
    if args.remat:
        over["REMAT_ENCODER"] = True
    cfg_a = load_config("configs/toponet_vitb_512_cityscale.yaml",
                        overrides=over)
    cfg_b = load_config("configs/toponet_vitb_512_cityscale.yaml",
                        overrides={**over, "FUSED_ENCODER_TRAIN": True})

    params = init_params(cfg_a)
    batch = _fake_batch(cfg_a, args.batch)
    step_a, state_a, dev_a = _build(cfg_a, params, batch)
    step_b, state_b, dev_b = _build(cfg_b, params, batch)

    rng = jax.random.PRNGKey(0)
    # compile + first-step warmup for both arms
    _, state_a, rng, loss_a = _run(step_a, state_a, dev_a, rng, 1)
    _, state_b, rng, loss_b = _run(step_b, state_b, dev_b, rng, 1)
    print(f"warmup losses: flax {loss_a:.4f} fused {loss_b:.4f}", flush=True)

    res_a, res_b = [], []
    for r in range(args.rounds):
        ta, state_a, rng, _ = _run(step_a, state_a, dev_a, rng, args.steps)
        tb, state_b, rng, _ = _run(step_b, state_b, dev_b, rng, args.steps)
        res_a.append(ta)
        res_b.append(tb)
        print(f"round {r}: flax {ta:.4f} s/step, fused {tb:.4f} s/step",
              flush=True)

    out = {
        "shape": f"vit_b 512px B={args.batch} bf16 remat={bool(args.remat)}",
        "flax_s_per_step": [round(t, 4) for t in res_a],
        "fused_s_per_step": [round(t, 4) for t in res_b],
        "flax_min": round(min(res_a), 4),
        "fused_min": round(min(res_b), 4),
        "speedup": round(min(res_a) / min(res_b), 3),
        "flax_patches_per_s": round(args.batch / min(res_a), 1),
        "fused_patches_per_s": round(args.batch / min(res_b), 1),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
