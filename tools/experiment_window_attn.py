"""Windowed-attention variants timed on the real TPU (B=32, ViT-B geometry).

Variants:
  kernel   — current Pallas whole-window kernel (1 program per window*head)
  xla      — plain einsum + softmax (XLA fusion decides layout)
  grouped  — Pallas kernel with G windows per program (unrolled loop inside)

Prints ms per block application.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, GRID, DIM, HEADS, WIN = 32, 32, 768, 12, 14
    DT = jnp.bfloat16
    N = WIN * WIN  # 196
    NW = 9  # windows per patch at grid 32, window 14 (pad to 42)
    BH = B * NW * HEADS  # 3456
    D_AUG = 64 + 2 * WIN  # 92
    DV = 64

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BH, N, D_AUG)) * 0.1, DT)
    k = jnp.asarray(rng.normal(size=(BH, N, D_AUG)) * 0.1, DT)
    v = jnp.asarray(rng.normal(size=(BH, N, DV)) * 0.1, DT)

    def timed(fn, *args, iters=30):
        @jax.jit
        def run(*a):
            def step(c, _):
                o = fn(*a)
                return c + o.astype(jnp.float32).mean(), ()

            out, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
            return out

        float(run(*args))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(run(*args))
            ts.append(time.time() - t0)
        return min(ts) / iters * 1e3

    results = {}

    # --- xla path ---
    def xla_attn(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bnm,bmd->bnd", p, v)

    results["xla_ms"] = round(timed(xla_attn, q, k, v), 3)

    # --- current kernel (1 window per program) ---
    def kern1(q_ref, k_ref, v_ref, o_ref):
        s = jnp.dot(q_ref[0], k_ref[0].T, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                    preferred_element_type=jnp.float32)
        o_ref[0] = (o / denom).astype(o_ref.dtype)

    def pallas1(q, k, v):
        return pl.pallas_call(
            kern1,
            out_shape=jax.ShapeDtypeStruct((BH, N, DV), v.dtype),
            grid=(BH,),
            in_specs=[
                pl.BlockSpec((1, N, D_AUG), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D_AUG), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, DV), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, N, DV), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(q, k, v)

    results["kernel1_ms"] = round(timed(pallas1, q, k, v), 3)

    # --- grouped kernel: G windows per program, unrolled ---
    for G in (4, 16):
        def kernG(q_ref, k_ref, v_ref, o_ref, G=G):
            for g in range(G):
                s = jnp.dot(q_ref[g], k_ref[g].T,
                            preferred_element_type=jnp.float32)
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                denom = jnp.sum(p, axis=-1, keepdims=True)
                o = jnp.dot(p.astype(v_ref.dtype), v_ref[g],
                            preferred_element_type=jnp.float32)
                o_ref[g] = (o / denom).astype(o_ref.dtype)

        def pallasG(q, k, v, G=G, kernG=kernG):
            return pl.pallas_call(
                kernG,
                out_shape=jax.ShapeDtypeStruct((BH, N, DV), v.dtype),
                grid=(BH // G,),
                in_specs=[
                    pl.BlockSpec((G, N, D_AUG), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((G, N, D_AUG), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((G, N, DV), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((G, N, DV), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(q, k, v)

        try:
            results[f"kernel_g{G}_ms"] = round(timed(pallasG, q, k, v), 3)
        except Exception as e:  # Mosaic rejection
            results[f"kernel_g{G}_ms"] = f"FAILED: {str(e)[:120]}"

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
