"""Fused LayerNorm+matmul Pallas kernels (token-tiled, layout-free).

The encoder's measured per-block cost is dominated not by matmul FLOPs but
by full-activation HBM round-trips between ops (LN read/write, matmul
read, GELU read/write, residual read/write — ~0.2 ms per pass at 50 MB
activations, many passes per block). These kernels collapse the per-token
op chains into single HBM passes and run the heavy matmuls at XLA-grade
shapes (M = tile, all tokens batched — unlike the per-window fused blocks
in ops/fused_block.py whose M=196 matmuls starve the MXU):

- ln_dense:        y = LN(x) @ W (+ b)     one read of x, one write of y
- ln_mlp_residual: y = x + W2 gelu(W1 LN(x) + b1) + b2
                   one read of x, one write of y — the 4x hidden
                   activation never touches HBM (chunked in VMEM)
- proj_ln_mlp_residual: the whole post-attention block tail
                   (x1 = x + attn_out @ Wp + bp, then LN2+MLP+residual)
                   — reads x and attn_out once, writes the block output
                   once; x1 and the hidden never touch HBM

Both kernels tile the TOKEN axis only, so they are independent of window
partitioning and apply to windowed and global blocks alike
(models/fast_encoder.py kernel_version=3). Weights stay VMEM-resident
across grid steps (constant index maps). Inference-only (no custom VJP);
training uses the flax path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sam_road_tpu.ops.fused_block import _gelu_exact


def _pick_tile(M: int, want: int) -> int:
    """Largest tile <= want that divides M and keeps sublane alignment."""
    t = min(want, M)
    while t > 8 and M % t:
        t //= 2
    return t if M % t == 0 else M


def _ln_dense_kernel(has_bias: bool, x_ref, s_ref, b_ref, w_ref, bias_ref,
                     o_ref):
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    h = h * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    out = jnp.dot(h.astype(w_ref.dtype), w_ref[...],
                  preferred_element_type=jnp.float32)
    if has_bias:
        out = out + bias_ref[:].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def ln_dense(x, ln_scale, ln_bias, w, bias=None, *, tile: int = 256,
             interpret: bool = False):
    """LayerNorm (eps 1e-6) then dense: [M, C] -> [M, F] in x.dtype.

    `bias=None` skips the output bias — used for the qkv projection so
    window padding can happen on the bias-free product (pad tokens then
    become exactly `bias` after one fused pad+add, reproducing SAM's
    zero-pads-after-norm semantics without computing qkv on pad tokens).
    """
    M, C = x.shape
    F = w.shape[-1]
    t = _pick_tile(M, tile)
    dt = x.dtype
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((F,), dt)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_dense_kernel, has_bias),
        out_shape=jax.ShapeDtypeStruct((M, F), dt),
        grid=(M // t,),
        in_specs=[
            pl.BlockSpec((t, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((C,)), full((C,)),
            full((C, F)), full((F,)),
        ],
        out_specs=pl.BlockSpec((t, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, ln_scale.astype(dt), ln_bias.astype(dt), w.astype(dt),
      bias.astype(dt))


def _proj_ln_mlp_kernel(chunks: int, x_ref, a_ref, wp_ref, bp_ref, s_ref,
                        b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x1 = (x_ref[...].astype(jnp.float32)
          + jnp.dot(a_ref[...], wp_ref[...],
                    preferred_element_type=jnp.float32)
          + bp_ref[:].astype(jnp.float32))
    mu = jnp.mean(x1, axis=-1, keepdims=True)
    var = jnp.mean((x1 - mu) ** 2, axis=-1, keepdims=True)
    h = (x1 - mu) * jax.lax.rsqrt(var + 1e-6)
    h = (h * s_ref[:].astype(jnp.float32)
         + b_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    hidden = w1_ref.shape[-1]
    cs = hidden // chunks
    acc = x1 + b2_ref[:].astype(jnp.float32)
    for c in range(chunks):
        mid = jnp.dot(h, w1_ref[:, c * cs:(c + 1) * cs],
                      preferred_element_type=jnp.float32)
        mid = _gelu_exact(mid + b1_ref[c * cs:(c + 1) * cs].astype(jnp.float32))
        acc = acc + jnp.dot(mid.astype(x_ref.dtype),
                            w2_ref[c * cs:(c + 1) * cs, :],
                            preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def proj_ln_mlp_residual(x, attn_out, wp, bp, ln_scale, ln_bias, w1, b1, w2,
                         b2, *, tile: int = 512, chunks: int = 4,
                         interpret: bool = False):
    """out = x1 + Dense2(gelu(Dense1(LN(x1)))), x1 = x + attn_out @ wp + bp.

    The block's whole post-attention tail — attention output projection,
    residual add, LN2, MLP, second residual — in ONE HBM pass: read x and
    attn_out once, write the block output once. The separate-proj path
    costs two extra full-activation passes (XLA fuses proj+bias+residual
    into one read-out/read-x/write-x1 pass, then the MLP kernel re-reads
    x1). x1 itself never touches HBM here.
    """
    M, C = x.shape
    hidden = w1.shape[-1]
    while chunks > 1 and hidden % chunks:
        chunks -= 1
    t = _pick_tile(M, tile)
    dt = x.dtype
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    tok = lambda w: pl.BlockSpec((t, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_proj_ln_mlp_kernel, chunks),
        out_shape=jax.ShapeDtypeStruct((M, C), dt),
        grid=(M // t,),
        in_specs=[
            tok(C), tok(C),
            full((C, C)), full((C,)),
            full((C,)), full((C,)),
            full((C, hidden)), full((hidden,)),
            full((hidden, C)), full((C,)),
        ],
        out_specs=tok(C),
        interpret=interpret,
    )(x, attn_out.astype(dt), wp.astype(dt), bp.astype(dt),
      ln_scale.astype(dt), ln_bias.astype(dt), w1.astype(dt), b1.astype(dt),
      w2.astype(dt), b2.astype(dt))


def _ln_mlp_kernel(chunks: int, x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
                   b2_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    h = (h * s_ref[:].astype(jnp.float32)
         + b_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    hidden = w1_ref.shape[-1]
    cs = hidden // chunks
    acc = xf + b2_ref[:].astype(jnp.float32)
    for c in range(chunks):
        mid = jnp.dot(h, w1_ref[:, c * cs:(c + 1) * cs],
                      preferred_element_type=jnp.float32)
        mid = _gelu_exact(mid + b1_ref[c * cs:(c + 1) * cs].astype(jnp.float32))
        acc = acc + jnp.dot(mid.astype(x_ref.dtype),
                            w2_ref[c * cs:(c + 1) * cs, :],
                            preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def ln_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2, *, tile: int = 512,
                    chunks: int = 4, interpret: bool = False):
    """out = x + Dense2(gelu_exact(Dense1(LN(x)))): [M, C] -> [M, C].

    The hidden activation (4C wide, f32) is processed in `chunks` column
    blocks so it lives only in VMEM — the XLA path writes + re-reads the
    full 4x hidden tensor through HBM twice per block. Tile 512 measured
    best at ViT-B dims (paired microbench, tools/experiment_fused_ln.py:
    4.95 ms vs 8.37 at t256 vs 7.0 XLA for M=32768).
    """
    M, C = x.shape
    hidden = w1.shape[-1]
    while chunks > 1 and hidden % chunks:
        chunks -= 1
    t = _pick_tile(M, tile)
    dt = x.dtype
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_kernel, chunks),
        out_shape=jax.ShapeDtypeStruct((M, C), dt),
        grid=(M // t,),
        in_specs=[
            pl.BlockSpec((t, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((C,)), full((C,)),
            full((C, hidden)), full((hidden,)),
            full((hidden, C)), full((C,)),
        ],
        out_specs=pl.BlockSpec((t, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, ln_scale.astype(dt), ln_bias.astype(dt), w1.astype(dt),
      b1.astype(dt), w2.astype(dt), b2.astype(dt))
