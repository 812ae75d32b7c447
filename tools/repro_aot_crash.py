"""Minimal repro: batched dot_general inside a Pallas TPU kernel crashes
this platform's remote AOT compile helper (HTTP 500, `tpu_compile_helper
subprocess exit code 1`), while the identical math as a per-batch Python
loop of 2D dots compiles and runs.

Context: the encoder's windowed attention is latency-bound (288+ programs
x 12 unrolled per-head tiny-matmul chains, ~11 ms for ~0.4 ms of MXU
math — docs/DESIGN.md round-3 findings). The natural fix is heads as a
dot_general BATCH dim; this repro shows the wall. Tried 2026-08-17 with
both 196-token (lane-misaligned) and 256-token (lane-aligned) shapes,
group sizes 1-8: all crash. The same wall previously blocked the v2
grouped fused-block kernels (grouping >= 4).

Run: python tools/repro_aot_crash.py
Prints PASS/CRASH for the looped and batched variants.
"""

import functools
import traceback

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = 12, 256, 64  # 12 heads, lane-aligned tokens, head_dim 64
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)

    def looped_kernel(a_ref, b_ref, o_ref):
        for i in range(B):
            o_ref[i] = jnp.dot(
                a_ref[i], b_ref[i].T, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)

    def batched_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    for name, kernel in (("looped", looped_kernel), ("batched", batched_kernel)):
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.bfloat16),
                in_specs=[spec, spec],
                out_specs=spec,
            )(a, b)
            print(f"{name}: PASS (sum {float(jnp.abs(out.astype(jnp.float32)).sum()):.1f})")
        except Exception as e:
            print(f"{name}: CRASH: {str(e)[:200]}")


if __name__ == "__main__":
    main()
