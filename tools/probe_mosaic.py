"""Mosaic lowering probes: which constructs does this jax/Mosaic version
accept on TPU? Round-1 notes say (G, 196, C) -> (G*196, C) merges are
rejected; check whether padding windows to 200 tokens (multiple of 8)
unlocks the merge, and whether leading-batch dot_general lowers.
"""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = {}
    rng = np.random.default_rng(0)

    def probe(name, fn):
        try:
            fn()
            results[name] = "OK"
        except Exception as e:
            results[name] = f"FAIL: {str(e)[:160]}"

    # 1. merge reshape at N=196 (expected FAIL per round-1 notes)
    def mk_merge(NP):
        G, C = 4, 256
        x = jnp.asarray(rng.normal(size=(G * 8, NP, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(C, C)), jnp.bfloat16)

        def kern(x_ref, w_ref, o_ref):
            h = x_ref[...].reshape(G * NP, C)
            y = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
            o_ref[...] = y.astype(o_ref.dtype).reshape(G, NP, C)

        def run():
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((G * 8, NP, C), x.dtype),
                grid=(8,),
                in_specs=[
                    pl.BlockSpec((G, NP, C), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, C), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((G, NP, C), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(x, w)
            out.block_until_ready()

        return run

    probe("merge_reshape_N196", mk_merge(196))
    probe("merge_reshape_N200", mk_merge(200))

    # 2. leading-batch dot_general inside the kernel
    def batched_dot():
        G, N, D = 4, 200, 64
        q = jnp.asarray(rng.normal(size=(8 * G, N, D)), jnp.bfloat16)

        def kern(q_ref, o_ref):
            qv = q_ref[...]
            s = jax.lax.dot_general(
                qv, qv,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, N, N)
            o_ref[...] = s.max(axis=-1).astype(o_ref.dtype)

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8 * G, N), q.dtype),
            grid=(8,),
            in_specs=[pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(q)
        out.block_until_ready()

    probe("leading_batch_dot_general", batched_dot)

    # 3. lane-dim slice of a value at 64 alignment (head split from qkv)
    def lane_slice():
        N, C = 200, 768

        def kern(x_ref, o_ref):
            x = x_ref[...]
            h0 = x[:, 0:64]
            h1 = x[:, 64:128]
            o_ref[...] = (
                jnp.dot(h0, h1.T, preferred_element_type=jnp.float32)
                .max(axis=-1)
                .astype(o_ref.dtype)
            )

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.bfloat16),
            grid=(8,),
            in_specs=[pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(rng.normal(size=(8, N, C)), jnp.bfloat16))
        out.block_until_ready()

    probe("lane_slice_64", lane_slice)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
