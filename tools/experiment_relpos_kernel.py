"""Rel-pos attention variants, timed as FULL windowed blocks (B=32 ViT-B).

V0: current Block (aug concat into q/k, kernel over 92-dim contraction)
V1: selector kernel — q/k stay 64-dim; qh/qw bias rows [*, N, win] computed
    by einsum outside, expanded to (N, N) inside the kernel via static 0/1
    selector matmuls (no q_aug/k_aug concats, no one-hot broadcast).
V2: V1 but qh/qw computed with a single combined einsum over a static
    (N, 2*win, hd) table.
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

    B, GRID, DIM, HEADS, WIN = 32, 32, 768, 12, 14
    DT = jnp.bfloat16
    N = WIN * WIN
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

    # --- V0: current block ---
    blk = Block(dim=DIM, num_heads=HEADS, mlp_ratio=4.0, window_size=WIN,
                input_size=(GRID, GRID), dtype=DT)
    p0 = blk.init(jax.random.PRNGKey(0), x)["params"]
    results["v0_current_ms"] = round(
        timed(lambda p, h: blk.apply({"params": p}, h), p0), 2)

    # --- selector kernel ---
    def sel_kernel(q_ref, k_ref, v_ref, qh_ref, qw_ref, o_ref):
        win = WIN
        n = win * win
        a_idx = jax.lax.broadcasted_iota(jnp.int32, (win, n), 0)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (win, n), 1)
        sel_h = (k_idx // win == a_idx).astype(jnp.float32)
        sel_w = (k_idx % win == a_idx).astype(jnp.float32)
        s = jnp.dot(q_ref[0], k_ref[0].T, preferred_element_type=jnp.float32)
        s = s + jnp.dot(qh_ref[0].astype(jnp.float32), sel_h,
                        preferred_element_type=jnp.float32)
        s = s + jnp.dot(qw_ref[0].astype(jnp.float32), sel_w,
                        preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot((p / denom).astype(v_ref.dtype), v_ref[0],
                    preferred_element_type=jnp.float32)
        o_ref[0] = o.astype(o_ref.dtype)

    def sel_attention(q, k, v, qh, qw):
        BH = q.shape[0]
        spec = lambda d: pl.BlockSpec((1, N, d), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
        return pl.pallas_call(
            sel_kernel,
            out_shape=jax.ShapeDtypeStruct((BH, N, HD), v.dtype),
            grid=(BH,),
            in_specs=[spec(HD), spec(HD), spec(HD), spec(WIN), spec(WIN)],
            out_specs=spec(HD),
        )(q, k, v, qh, qw)

    class SelBlock(nn.Module):
        combined: bool = False

        @nn.compact
        def __call__(self, x):
            shortcut = x
            h = nn.LayerNorm(epsilon=1e-6, name="norm1", dtype=DT)(x)
            h, pad_hw = window_partition(h, WIN)
            Bw = h.shape[0]
            qkv = nn.Dense(DIM * 3, name="qkv", dtype=DT)(h.reshape(Bw, N, DIM))
            qkv = qkv.reshape(Bw, N, 3, HEADS, HD)
            q, k, v = jnp.moveaxis(qkv, 2, 0).transpose(0, 1, 3, 2, 4)
            scale = HD ** -0.5
            rel_pos_h = self.param("rel_pos_h", nn.initializers.normal(0.02),
                                   (2 * WIN - 1, HD))
            rel_pos_w = self.param("rel_pos_w", nn.initializers.normal(0.02),
                                   (2 * WIN - 1, HD))
            coords = np.arange(WIN)[:, None] - np.arange(WIN)[None, :] + WIN - 1
            r_q = q.reshape(Bw, HEADS, WIN, WIN, HD)
            if not self.combined:
                Rh = rel_pos_h[coords].astype(DT)  # (win, win, hd)
                Rw = rel_pos_w[coords].astype(DT)
                qh = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
                qw = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
            else:
                # one einsum over a (win, win, 2*win, hd) table
                T = np.zeros((WIN, WIN, 2 * WIN, 2 * rel_pos_h.shape[0] - 1),
                             np.float32)  # placeholder; not used
                raise NotImplementedError
            qh = qh.reshape(Bw, HEADS, N, WIN)
            qw = qw.reshape(Bw, HEADS, N, WIN)
            BH = Bw * HEADS
            o = sel_attention(
                (q * scale).reshape(BH, N, HD), k.reshape(BH, N, HD),
                v.reshape(BH, N, HD), qh.reshape(BH, N, WIN),
                qw.reshape(BH, N, WIN),
            )
            o = o.reshape(Bw, HEADS, N, HD).transpose(0, 2, 1, 3).reshape(
                Bw, WIN, WIN, DIM)
            o = nn.Dense(DIM, name="proj", dtype=DT)(o)
            h = window_unpartition(o, WIN, pad_hw, x.shape[1:3])
            x = shortcut + h
            h = nn.LayerNorm(epsilon=1e-6, name="norm2", dtype=DT)(x)
            h = nn.Dense(4 * DIM, name="mlp_lin1", dtype=DT)(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(DIM, name="mlp_lin2", dtype=DT)(h)
            return x + h

    sb = SelBlock()
    p1 = sb.init(jax.random.PRNGKey(0), x)["params"]
    results["v1_selector_ms"] = round(
        timed(lambda p, h: sb.apply({"params": p}, h), p1), 2)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
