"""Training-memory A/B: flash-attention kernel vs XLA attention, remat on
vs off — measured by the COMPILER (AOT memory analysis), not by OOM
probing.

Round-2 verdict flagged that fused_attention's backward is an XLA
recompute, so training might get no memory win from the kernel. This tool
compiles the FULL flagship train step (ViT-B 512px, B=16, bf16 — forward,
losses, grads, per-group Adam) in all four configurations and prints the
compiler's memory breakdown (temp/argument/output bytes), which is what
actually determines the largest trainable batch.

Run: python tools/experiment_train_memory.py [batch]
"""

import json
import sys

import numpy as np


def main(batch=16):
    import jax
    import jax.numpy as jnp

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from functools import partial

    from sam_road_tpu.config import load_config
    from sam_road_tpu.models.sam_road import init_params
    from sam_road_tpu.training.harness import (
        TrainState,
        build_optimizer,
        make_train_step,
    )

    results = {}
    for flash in (True, False):
        for remat in (True, False):
            cfg = load_config(overrides=dict(
                PATCH_SIZE=512, BATCH_SIZE=batch, COMPUTE_DTYPE="bfloat16",
                TOPO_SAMPLE_NUM=512, MAX_NEIGHBOR_QUERIES=16,
                FLASH_ATTENTION=flash, REMAT_ENCODER=remat,
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
            s, p = 512, 16
            b = batch
            batch_data = {
                "rgb": jnp.asarray(
                    rng.uniform(0, 255, (b, 512, 512, 3)), jnp.float32),
                "keypoint_mask": jnp.asarray(
                    rng.random((b, 512, 512)) > 0.95, jnp.float32),
                "road_mask": jnp.asarray(
                    rng.random((b, 512, 512)) > 0.8, jnp.float32),
                "graph_points": jnp.asarray(
                    rng.uniform(0, 512, (b, 256, 2)), jnp.float32),
                "pairs": jnp.asarray(
                    rng.integers(0, 256, (b, s, p, 2)), jnp.int32),
                "connected": jnp.asarray(rng.random((b, s, p)) > 0.5),
                "valid": jnp.asarray(rng.random((b, s, p)) > 0.2),
            }
            label = f"flash{int(flash)}_remat{int(remat)}"
            try:
                compiled = step.lower(
                    state, batch_data, jax.random.PRNGKey(0)
                ).compile()
                ma = compiled.memory_analysis()
                results[label] = {
                    "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
                    "arg_mb": round(ma.argument_size_in_bytes / 2**20, 1),
                    "out_mb": round(ma.output_size_in_bytes / 2**20, 1),
                    "peak_hint_mb": round(
                        (ma.temp_size_in_bytes + ma.argument_size_in_bytes)
                        / 2**20, 1),
                }
            except Exception as e:
                results[label] = f"FAIL: {str(e)[:140]}"
            print(f"# {label}: {results[label]}", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
