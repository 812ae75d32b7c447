"""Probe: Mosaic legality + semantics of the constructs the pad-free
windowed-attention kernel (round-4 design) depends on.

Q1: is a block of size `win`=14 on a LEADING (non-last-two) dim legal when
    it does not divide the array dim (32 -> grid ceil(32/14)=3, last block
    10 rows OOB)?
Q2: what do OOB reads of that trailing partial block contain (garbage or
    zeros)? (The kernel masks them either way; this documents behavior.)
Q3: are OOB writes of the partial output block dropped?
Q4: does an in-kernel VMEM jnp.pad + lax.fori_loop with pl.ds slicing
    compile on this platform's AOT helper?

Run: python tools/probe_nondiv_blocks.py  (on the TPU)
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_nondiv_read_write():
    B, H, W, C = 2, 32, 32, 256
    win = 14
    nI = -(-H // win)  # 3

    def kernel(x_ref, o_ref):
        i = pl.program_id(1)
        x = x_ref[0]  # (win, W, C)
        # mask rows beyond H: global row = i*win + r
        r = jax.lax.broadcasted_iota(jnp.int32, (win, W, C), 0)
        real = (i * win + r) < H
        x = jnp.where(real, x, 0.0)
        o_ref[0] = x + 1.0

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nI * win, W, C), jnp.float32),
        grid=(B, nI),
        in_specs=[pl.BlockSpec((1, win, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, win, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    x = np.random.default_rng(0).normal(size=(B, H, W, C)).astype(np.float32)
    try:
        y = np.asarray(jax.jit(out)(jnp.asarray(x)))
    except Exception as e:
        print("Q1 NONDIV READ: FAILED ->", type(e).__name__, str(e)[:200])
        return False
    ok = np.allclose(y[:, :H], x + 1.0)
    pad_vals = y[:, H:]
    print(f"Q1 nondiv-leading-dim blocks compile+run: OK (out shape {y.shape})")
    print(f"Q2 real-region correct: {ok}; pad-region rows contain: "
          f"min {pad_vals.min():.3f} max {pad_vals.max():.3f} "
          f"(1.0 everywhere = masked-in-kernel zeros +1)")
    return ok


def probe_nondiv_out_exact():
    """Output array sized exactly H (not nI*win): are OOB writes dropped?"""
    B, H, W, C = 2, 32, 32, 256
    win = 14
    nI = -(-H // win)

    def kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0] * 2.0

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        grid=(B, nI),
        in_specs=[pl.BlockSpec((1, win, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, win, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    x = np.random.default_rng(1).normal(size=(B, H, W, C)).astype(np.float32)
    try:
        y = np.asarray(jax.jit(out)(jnp.asarray(x)))
    except Exception as e:
        print("Q3 OOB WRITE: FAILED ->", type(e).__name__, str(e)[:200])
        return False
    # rows 0..27 come from full blocks; rows 28..31 from the partial block
    ok = np.allclose(y, x * 2.0)
    print(f"Q3 exact-size output with OOB write blocks: {'OK' if ok else 'WRONG'}"
          f" (max err {np.abs(y - x * 2.0).max():.2e})")
    return ok


def probe_inkernel_pad_loop():
    """In-kernel jnp.pad to a 42-col VMEM buffer + fori_loop over window
    columns with pl.ds — the W-pad-free construct."""
    B, H, W, C = 2, 14, 32, 256
    win = 14
    nJ = -(-W // win)  # 3

    def kernel(x_ref, o_ref):
        x = x_ref[0]  # (win, W, C)
        xp = jnp.pad(x, ((0, 0), (0, nJ * win - W), (0, 0)))

        def body(j, _):
            tile = jax.lax.dynamic_slice(
                xp, (0, j * win, 0), (win, win, C))
            s = jnp.sum(tile, axis=1, keepdims=True)  # (win, 1, C)
            o_ref[0, :, pl.ds(j, 1), :] = s.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, nJ, body, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, win, nJ, C), jnp.float32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, win, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, win, nJ, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    x = np.random.default_rng(2).normal(size=(B, H, W, C)).astype(np.float32)
    try:
        y = np.asarray(jax.jit(out)(jnp.asarray(x)))
    except Exception as e:
        print("Q4 IN-KERNEL PAD LOOP: FAILED ->", type(e).__name__, str(e)[:200])
        return False
    want = np.stack([
        np.pad(x, ((0, 0), (0, 0), (0, nJ * win - W), (0, 0)))[
            :, :, j * win:(j + 1) * win, :].sum(axis=2)
        for j in range(nJ)
    ], axis=2)
    ok = np.allclose(y, want, atol=1e-4)
    print(f"Q4 in-kernel VMEM pad + fori_loop/pl.ds: {'OK' if ok else 'WRONG'}"
          f" (max err {np.abs(y - want).max():.2e})")
    return ok


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    r1 = probe_nondiv_read_write()
    r2 = probe_nondiv_out_exact()
    r3 = probe_inkernel_pad_loop()
    print("VERDICT:", {"nondiv_read": r1, "oob_write": r2, "pad_loop": r3})


def probe_oversized_sublane_block():
    """Q5: block second-to-last dim 48 (8-divisible) LARGER than the array
    dim (32) — one block with 16 OOB cols. Q6: pl.ds with unaligned dynamic
    start (j*14) on that sublane dim of the VMEM ref."""
    B, H, W, C = 2, 14, 32, 256
    win = 14
    nJ = 3
    Wp = 48

    def kernel(x_ref, o_ref):
        def body(j, _):
            tile = x_ref[0, :, pl.ds(j * win, win), :]  # (win, win, C)
            col = jax.lax.broadcasted_iota(jnp.int32, (win, win, C), 1)
            real = (j * win + col) < W
            tile = jnp.where(real, tile, 0.0)
            s = jnp.sum(tile, axis=1, keepdims=True)
            o_ref[0, :, pl.ds(j, 1), :] = s.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, nJ, body, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, win, nJ, C), jnp.float32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, win, Wp, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, win, nJ, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    x = np.random.default_rng(3).normal(size=(B, H, W, C)).astype(np.float32)
    try:
        y = np.asarray(jax.jit(out)(jnp.asarray(x)))
    except Exception as e:
        print("Q5/Q6 OVERSIZED BLOCK + pl.ds: FAILED ->",
              type(e).__name__, str(e)[:300])
        return False
    xp = np.pad(x, ((0, 0), (0, 0), (0, nJ * win - W), (0, 0)))
    want = np.stack(
        [xp[:, :, j * win:(j + 1) * win, :].sum(axis=2) for j in range(nJ)],
        axis=2)
    ok = np.allclose(y, want, atol=1e-4)
    print(f"Q5/Q6 oversized 8-div sublane block + unaligned pl.ds: "
          f"{'OK' if ok else 'WRONG'} (max err {np.abs(y - want).max():.2e})")
    return ok
