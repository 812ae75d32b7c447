"""Block-level encoder variants on the real TPU (B=32, ViT-B, bf16).

For windowed (win=14) and global (N=1024) blocks:
  flash   — current production path (Pallas whole-N kernel + aug concat)
  xla     — use_flash=False: XLA attention (lets XLA fuse transposes/epilogues)
  inker   — Pallas kernel with rel-pos computed IN-KERNEL from row-expanded
            tables (no aug einsums/concats outside; q/k stay 64-dim)
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sam_road_tpu.models.vit import Block, window_partition, window_unpartition

    B, GRID, DIM, HEADS = 32, 32, 768, 12
    DT = jnp.bfloat16
    HD = DIM // HEADS

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, GRID, GRID, DIM)) * 0.02, DT)

    def timed(apply_fn, params, iters=20):
        @jax.jit
        def run(params, x):
            def step(h, _):
                return apply_fn(params, h).astype(x.dtype), ()

            out, _ = jax.lax.scan(step, x, None, length=iters)
            return out.astype(jnp.float32).sum()

        float(run(params, x))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(run(params, x))
            ts.append(time.time() - t0)
        return min(ts) / iters * 1e3

    results = {}

    for label, win in (("win", 14), ("glob", 0)):
        for sub, flash in (("flash", True), ("xla", False)):
            blk = Block(dim=DIM, num_heads=HEADS, mlp_ratio=4.0,
                        window_size=win, input_size=(GRID, GRID),
                        use_flash=flash, dtype=DT)
            p = blk.init(jax.random.PRNGKey(0), x)["params"]
            results[f"{label}_{sub}_ms"] = round(
                timed(lambda pp, h, blk=blk: blk.apply({"params": pp}, h), p), 2)

    # ---- in-kernel rel-pos variant ----
    def make_inker_kernel(N, win_h, win_w):
        def kern(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref):
            q = q_ref[0]
            k = k_ref[0]
            scale = HD ** -0.5
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            qf = q.astype(jnp.float32)
            rh = rh_ref[...].astype(jnp.float32)  # (N, win_h, HD)
            rw = rw_ref[...].astype(jnp.float32)  # (N, win_w, HD)
            bh = jnp.sum(qf[:, None, :] * rh, axis=-1)  # (N, win_h)
            bw = jnp.sum(qf[:, None, :] * rw, axis=-1)  # (N, win_w)
            a_idx = jax.lax.broadcasted_iota(jnp.int32, (win_h, N), 0)
            k_idx = jax.lax.broadcasted_iota(jnp.int32, (win_h, N), 1)
            sel_h = (k_idx // win_w == a_idx).astype(jnp.float32)
            a2 = jax.lax.broadcasted_iota(jnp.int32, (win_w, N), 0)
            k2 = jax.lax.broadcasted_iota(jnp.int32, (win_w, N), 1)
            sel_w = (k2 % win_w == a2).astype(jnp.float32)
            s = s + jnp.dot(bh, sel_h, preferred_element_type=jnp.float32)
            s = s + jnp.dot(bw, sel_w, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot((p / denom).astype(v_ref.dtype), v_ref[0],
                        preferred_element_type=jnp.float32)
            o_ref[0] = o.astype(o_ref.dtype)

        return kern

    def inker_attention(q, k, v, rh_exp, rw_exp, win_h, win_w):
        BH, N, _ = q.shape
        spec = lambda d: pl.BlockSpec((1, N, d), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
        full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                      memory_space=pltpu.VMEM)
        return pl.pallas_call(
            make_inker_kernel(N, win_h, win_w),
            out_shape=jax.ShapeDtypeStruct((BH, N, HD), v.dtype),
            grid=(BH,),
            in_specs=[spec(HD), spec(HD), spec(HD),
                      full((N, win_h, HD)), full((N, win_w, HD))],
            out_specs=spec(HD),
        )(q, k, v, rh_exp, rw_exp)

    class InkerBlock(nn.Module):
        window: int  # 0 = global

        @nn.compact
        def __call__(self, x):
            win = self.window if self.window else GRID
            shortcut = x
            h = nn.LayerNorm(epsilon=1e-6, name="norm1", dtype=DT)(x)
            if self.window:
                h, pad_hw = window_partition(h, win)
            Bw = h.shape[0]
            N = win * win
            qkv = nn.Dense(DIM * 3, name="qkv", dtype=DT)(h.reshape(Bw, N, DIM))
            qkv = qkv.reshape(Bw, N, 3, HEADS, HD)
            q, k, v = jnp.moveaxis(qkv, 2, 0).transpose(0, 1, 3, 2, 4)
            rel_pos_h = self.param("rel_pos_h", nn.initializers.normal(0.02),
                                   (2 * win - 1, HD))
            rel_pos_w = self.param("rel_pos_w", nn.initializers.normal(0.02),
                                   (2 * win - 1, HD))
            coords = np.arange(win)[:, None] - np.arange(win)[None, :] + win - 1
            rh = rel_pos_h[coords]  # (win, win, hd): [qi, a, c]
            rw = rel_pos_w[coords]
            rh_exp = jnp.repeat(rh, win, axis=0).astype(DT)  # (N, win, hd)
            rw_exp = jnp.tile(rw, (win, 1, 1)).astype(DT)
            BH = Bw * HEADS
            o = inker_attention(
                q.reshape(BH, N, HD), k.reshape(BH, N, HD),
                v.reshape(BH, N, HD), rh_exp, rw_exp, win, win,
            )
            o = o.reshape(Bw, HEADS, N, HD).transpose(0, 2, 1, 3).reshape(
                Bw, win, win, DIM)
            o = nn.Dense(DIM, name="proj", dtype=DT)(o)
            if self.window:
                o = window_unpartition(o, win, pad_hw, x.shape[1:3])
            x = shortcut + o
            h = nn.LayerNorm(epsilon=1e-6, name="norm2", dtype=DT)(x)
            h = nn.Dense(4 * DIM, name="mlp_lin1", dtype=DT)(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(DIM, name="mlp_lin2", dtype=DT)(h)
            return x + h

    for label, win in (("win", 14), ("glob", 0)):
        blk = InkerBlock(window=win)
        p = blk.init(jax.random.PRNGKey(0), x)["params"]
        results[f"{label}_inker_ms"] = round(
            timed(lambda pp, h, blk=blk: blk.apply({"params": pp}, h), p), 2)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
