"""Stage-level timing of the v3 windowed block on the real TPU.

Times nested prefixes of _windowed_block_v3 (ViT-B flagship geometry,
B=32, bf16) in one scanned jit each, interleaved:

  ln_qkv:  LN1 + qkv dense (token-tiled Pallas kernel)
  biasrows: + pad to window grid + rel-pos bias-row einsums (XLA)
  attn:     + grid-layout window attention kernel
  full:     + proj/LN2/MLP/residual tail kernel (whole block)

The deltas localize the block's ~16 ms across its four HBM stages.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from sam_road_tpu.models import fast_encoder as fe
    from sam_road_tpu.models.vit import Block
    from sam_road_tpu.ops.fused_block import window_attention_rows_grid
    from sam_road_tpu.ops.fused_ln import ln_dense, proj_ln_mlp_residual

    B, GRID, DIM, HEADS, WS = 32, 32, 768, 12, 14
    DT = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, GRID, GRID, DIM)) * 0.02, DT)

    blk = Block(dim=DIM, num_heads=HEADS, mlp_ratio=4.0, window_size=WS,
                input_size=(GRID, GRID), dtype=DT)
    # device-resident params: numpy args re-upload per jit call (~28 MB
    # here), which would add tens of ms/iter to every stage timing
    bp = jax.device_put(blk.init(jax.random.PRNGKey(0), x)["params"])

    def stage_ln_qkv(bp, x):
        Bq, H, W, C = x.shape
        return ln_dense(
            x.reshape(Bq * H * W, C), bp["norm1"]["scale"],
            bp["norm1"]["bias"], bp["attn"]["qkv"]["kernel"], None,
        ).reshape(Bq, H, W, 3 * C)

    def stage_biasrows(bp, x):
        qkv_nb = stage_ln_qkv(bp, x)
        Bq, H, W, _ = x.shape
        C = DIM
        pad = (WS - GRID % WS) % WS
        qkv_p = jnp.pad(qkv_nb, ((0, 0), (0, pad), (0, pad), (0, 0)))
        nI = (GRID + pad) // WS
        hd = C // HEADS
        coords = np.arange(WS)[:, None] - np.arange(WS)[None, :] + WS - 1
        Rh = jnp.asarray(bp["attn"]["rel_pos_h"])[coords].astype(DT)
        Rw = jnp.asarray(bp["attn"]["rel_pos_w"])[coords].astype(DT)
        q_p = qkv_p[..., :C].reshape(Bq, nI, WS, nI, WS, HEADS, hd)
        bh = jnp.einsum("bIiJjhc,iac->bIJhija", q_p, Rh)
        bw = jnp.einsum("bIiJjhc,jac->bIJhija", q_p, Rw)
        N = WS * WS
        return (qkv_p, bh.reshape(Bq, nI, nI, HEADS, N, WS),
                bw.reshape(Bq, nI, nI, HEADS, N, WS))

    def stage_attn(bp, x):
        qkv_p, bh, bw = stage_biasrows(bp, x)
        out_p = window_attention_rows_grid(
            qkv_p, bp["attn"]["qkv"]["bias"].astype(DT), bh, bw, WS, HEADS)
        return out_p[:, :GRID, :GRID, :]

    def stage_full(bp, x):
        return fe._windowed_block_v3(x, bp, HEADS, WS, DT, True)

    runners = {}
    results = {}
    ITERS = 20
    for name, fn in [("ln_qkv", stage_ln_qkv), ("biasrows", stage_biasrows),
                     ("attn", stage_attn), ("full", stage_full)]:
        @jax.jit
        def run(bp, x, fn=fn):
            def step(c, _):
                out = fn(bp, (x * (1 + c * 1e-30)).astype(x.dtype))
                leaf = jax.tree_util.tree_leaves(out)[-1]
                s = jnp.abs(leaf.astype(jnp.float32)).sum()
                return (s * 1e-30).astype(jnp.float32), s
            _, ss = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                                 length=ITERS)
            return ss
        float(run(bp, x)[0])
        runners[name] = run
        print(f"# {name}: compiled", flush=True)

    times = {k: [] for k in runners}
    for r in range(5):
        for name, run in runners.items():
            t0 = time.time()
            float(run(bp, x)[0])
            times[name].append((time.time() - t0) / ITERS)
    for name, ts in times.items():
        results[name + "_ms"] = round(min(ts) * 1e3, 2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
