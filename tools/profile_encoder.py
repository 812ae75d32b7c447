"""Encoder component timing sweep on the real TPU.

Times the flagship geometry (ViT-B, 512px, B=32, bf16) component by
component — full encoder, windowed block, global block, each with/without
rel-pos, MLP-only — with the repetition loop INSIDE one jitted scan so
per-call link overhead (~28 ms) is amortized. Prints ms per single
application and effective TFLOP/s. Never run concurrently with another TPU
process.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from sam_road_tpu.models.vit import Block, ImageEncoderViT

    B, GRID, DIM, HEADS = 32, 32, 768, 12
    DT = jnp.bfloat16
    results = {}

    def timed_scan(apply_fn, params, x, iters):
        @jax.jit
        def run(params, x):
            def step(h, _):
                out = apply_fn(params, h)
                return out.astype(x.dtype), ()

            out, _ = jax.lax.scan(step, x, None, length=iters)
            return out.astype(jnp.float32).sum()

        float(run(params, x))  # compile+warmup
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(run(params, x))
            ts.append(time.time() - t0)
        return min(ts) / iters

    rng = np.random.default_rng(0)
    x_tok = jnp.asarray(rng.normal(size=(B, GRID, GRID, DIM)) * 0.02, DT)

    def block_variant(name, window, use_rel_pos, iters=20):
        blk = Block(
            dim=DIM, num_heads=HEADS, mlp_ratio=4.0, window_size=window,
            input_size=(GRID, GRID), use_rel_pos=use_rel_pos, dtype=DT,
        )
        params = blk.init(jax.random.PRNGKey(0), x_tok)["params"]
        dt = timed_scan(lambda p, h: blk.apply({"params": p}, h), params,
                        x_tok, iters)
        results[name] = round(dt * 1e3, 2)

    block_variant("windowed_block_ms", 14, True)
    block_variant("windowed_block_norelpos_ms", 14, False)
    block_variant("global_block_ms", 0, True)
    block_variant("global_block_norelpos_ms", 0, False)

    # MLP-only proxy: two Dense layers + exact gelu at block shape
    from flax import linen as nn

    class MLPOnly(nn.Module):
        @nn.compact
        def __call__(self, h):
            y = nn.Dense(4 * DIM, dtype=DT)(h)
            y = jax.nn.gelu(y, approximate=False)
            return h + nn.Dense(DIM, dtype=DT)(y)

    mlp = MLPOnly()
    mp = mlp.init(jax.random.PRNGKey(0), x_tok)["params"]
    results["mlp_only_ms"] = round(
        timed_scan(lambda p, h: mlp.apply({"params": p}, h), mp, x_tok, 20) * 1e3, 2)

    # Full encoder (12 blocks + patch embed + neck) once per scan step.
    enc = ImageEncoderViT(img_size=512, embed_dim=DIM, depth=12,
                          num_heads=HEADS, window_size=14,
                          global_attn_indexes=(2, 5, 8, 11), dtype=DT)
    x_img = jnp.asarray(rng.normal(size=(B, 512, 512, 3)), jnp.float32)
    ep = enc.init(jax.random.PRNGKey(0), x_img)["params"]

    @jax.jit
    def enc_run(params, x):
        return enc.apply({"params": params}, x).astype(jnp.float32).sum()

    float(enc_run(ep, x_img))
    ts = []
    for _ in range(5):
        t0 = time.time()
        float(enc_run(ep, x_img))
        ts.append(time.time() - t0)
    results["full_encoder_ms"] = round(min(ts) * 1e3, 2)

    # effective TFLOP/s (encoder-only analytic cost: 226.1 GFLOP/patch,
    # tools/baseline_derivation.py)
    tflop = 226.1e-3 * B
    results["full_encoder_tflops"] = round(
        tflop / (results["full_encoder_ms"] / 1e3), 1)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
