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


def _ln_dense_padded_kernel(H: int, W: int, rs: int, x_ref, s_ref, b_ref,
                            w_ref, o_ref):
    """Row-strip LN+dense writing the window-PADDED grid layout directly.

    Block (1, rs, W, C) of the unpadded input -> block (1, rs, Wp, F) of the
    padded output. Strips beyond H (and the Wp-W pad columns) write ZEROS —
    the bias-free-qkv pad convention (the attention kernel adds the qkv
    bias, making pad tokens exactly qkv(0) = bias, SAM semantics). Input
    blocks past H read out-of-bounds garbage (probed legal on this
    toolchain, tools/probe_nondiv_blocks.py Q1) which the row mask zeroes.
    """
    g = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)  # (rs, W, C)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    h = h * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    C = h.shape[-1]
    out = jnp.dot(h.reshape(rs * W, C).astype(w_ref.dtype), w_ref[...],
                  preferred_element_type=jnp.float32)
    F = out.shape[-1]
    out = out.reshape(rs, W, F)
    row = jax.lax.broadcasted_iota(jnp.int32, (rs, W, F), 0)
    out = jnp.where(g * rs + row < H, out, 0.0)
    Wp = o_ref.shape[2]
    if Wp > W:
        out = jnp.concatenate(
            [out, jnp.zeros((rs, Wp - W, F), out.dtype)], axis=1)
    o_ref[0] = out.astype(o_ref.dtype)


def ln_dense_padded(x, ln_scale, ln_bias, w, pad_hw, *, interpret: bool = False):
    """LayerNorm then bias-free dense, emitted straight into the padded
    window grid: [B, H, W, C] -> [B, H+pad_h, W+pad_w, F] with zero pads.

    Replaces `ln_dense(...).reshape + jnp.pad` in the fused windowed block:
    the separate pad pass cost a full read+write of the (padded) qkv tensor
    (~410 MB/block at flagship geometry, docs/DESIGN.md 'Pad/unpad cost
    measured'); here the pad rows/cols are written once by the same kernel
    that produces qkv. Per-token math is identical to ln_dense, so outputs
    are bit-identical on the real token region."""
    B, H, W, C = x.shape
    pad_h, pad_w = pad_hw
    Hp, Wp = H + pad_h, W + pad_w
    F = w.shape[-1]
    rs = 16
    while rs > 1 and H % rs:
        rs //= 2
    n_strips = -(-Hp // rs)  # cover pad rows so they are written (zero)
    dt = x.dtype
    full = lambda shape: pl.BlockSpec(shape, lambda b, g: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_dense_padded_kernel, H, W, rs),
        # out sized exactly Hp: the last strip's rows past Hp are
        # out-of-bounds STORES, dropped by Mosaic (probe Q3)
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, F), dt),
        grid=(B, n_strips),
        in_specs=[
            pl.BlockSpec((1, rs, W, C), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            full((C,)), full((C,)), full((C, F)),
        ],
        out_specs=pl.BlockSpec((1, rs, Wp, F), lambda b, g: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, ln_scale.astype(dt), ln_bias.astype(dt), w.astype(dt))


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


def _proj_ln_mlp_grid_kernel(chunks: int, rs: int, W: int, x_ref, a_ref,
                             wp_ref, bp_ref, s_ref, b_ref, w1_ref, b1_ref,
                             w2_ref, b2_ref, o_ref):
    """proj_ln_mlp_residual reading attn_out from the PADDED grid layout:
    x block (1, rs, W, C) unpadded; a block (1, rs, Wp, C) padded — the
    pad columns are sliced off in VMEM, so the unpad copy pass the XLA
    slice+reshape cost (~70 MB/block) never touches HBM."""
    C = x_ref.shape[-1]
    x1 = (x_ref[0].astype(jnp.float32).reshape(rs * W, C)
          + jnp.dot(a_ref[0, :, :W, :].reshape(rs * W, C), wp_ref[...],
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
    o_ref[0] = acc.reshape(rs, W, C).astype(o_ref.dtype)


def proj_ln_mlp_residual_grid(x, attn_out_padded, wp, bp, ln_scale, ln_bias,
                              w1, b1, w2, b2, *, chunks: int = 4,
                              interpret: bool = False):
    """Same math as proj_ln_mlp_residual, but attn_out comes in the padded
    window-grid layout [B, Hp, Wp, C] (the window kernel's native output):
    only the real-token region is read, per row strip, and the padded
    tensor's unpad slice/reshape pass never materializes. x: [B, H, W, C];
    returns [B, H, W, C] (bit-identical to the flat-path result)."""
    B, H, W, C = x.shape
    hidden = w1.shape[-1]
    while chunks > 1 and hidden % chunks:
        chunks -= 1
    # rs*W tokens per program; 16 rows x 32 cols = 512 tokens matches the
    # flat tail's measured-best tile (tools/experiment_fused_ln.py)
    rs = 16
    while rs > 1 and H % rs:
        rs //= 2
    dt = x.dtype
    full = lambda shape: pl.BlockSpec(shape, lambda b, g: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_proj_ln_mlp_grid_kernel, chunks, rs, W),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
        grid=(B, H // rs),
        in_specs=[
            pl.BlockSpec((1, rs, W, C), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rs, attn_out_padded.shape[2], C),
                         lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            full((C, C)), full((C,)),
            full((C,)), full((C,)),
            full((C, hidden)), full((hidden,)),
            full((hidden, C)), full((C,)),
        ],
        out_specs=pl.BlockSpec((1, rs, W, C), lambda b, g: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, attn_out_padded.astype(dt), wp.astype(dt), bp.astype(dt),
      ln_scale.astype(dt), ln_bias.astype(dt), w1.astype(dt), b1.astype(dt),
      w2.astype(dt), b2.astype(dt))


# ------------------------------------------------------------------------
# Differentiable wrappers (training path, round 4): Pallas forward + XLA
# recompute backward — the same pattern as ops/attention.fused_attention.
# Residuals are just the primal inputs; the backward re-derives the chain
# through jax.vjp of an XLA reference implementation whose math matches
# the kernel (fp32 LN/accumulation, low-precision matmul operands). The
# reference's backward-side gelu uses the true erf (the kernel's forward
# uses the Abramowitz-Stegun approximation, |err| <= 1.5e-7 — immaterial
# for gradients).
# ------------------------------------------------------------------------


def _ln_dense_ref(x, s, b, w, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    h = h * s.astype(jnp.float32) + b.astype(jnp.float32)
    out = jnp.dot(h.astype(x.dtype), w.astype(x.dtype),
                  preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ln_dense_d(x, ln_scale, ln_bias, w, interpret=False):
    """Differentiable ln_dense, bias-free (the windowed qkv projection)."""
    return ln_dense(x, ln_scale, ln_bias, w, None, interpret=interpret)


def _ln_dense_d_fwd(x, s, b, w, interpret):
    return ln_dense(x, s, b, w, None, interpret=interpret), (x, s, b, w)


def _ln_dense_d_bwd(interpret, res, g):
    x, s, b, w = res
    _, vjp = jax.vjp(lambda x, s, b, w: _ln_dense_ref(x, s, b, w, None),
                     x, s, b, w)
    return vjp(g)


ln_dense_d.defvjp(_ln_dense_d_fwd, _ln_dense_d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def ln_dense_bias_d(x, ln_scale, ln_bias, w, bias, interpret=False):
    """Differentiable ln_dense with output bias (the global qkv projection)."""
    return ln_dense(x, ln_scale, ln_bias, w, bias, interpret=interpret)


def _ln_dense_bias_d_fwd(x, s, b, w, bias, interpret):
    return ln_dense(x, s, b, w, bias, interpret=interpret), (x, s, b, w, bias)


def _ln_dense_bias_d_bwd(interpret, res, g):
    _, vjp = jax.vjp(_ln_dense_ref, *res)
    return vjp(g)


ln_dense_bias_d.defvjp(_ln_dense_bias_d_fwd, _ln_dense_bias_d_bwd)


def _proj_tail_ref(x, a, wp, bp, s, b, w1, b1, w2, b2):
    dt = x.dtype
    x1 = (x.astype(jnp.float32)
          + jnp.dot(a, wp.astype(a.dtype), preferred_element_type=jnp.float32)
          + bp.astype(jnp.float32))
    mu = jnp.mean(x1, axis=-1, keepdims=True)
    var = jnp.mean((x1 - mu) ** 2, axis=-1, keepdims=True)
    h = (x1 - mu) * jax.lax.rsqrt(var + 1e-6)
    h = (h * s.astype(jnp.float32) + b.astype(jnp.float32)).astype(dt)
    mid = jnp.dot(h, w1.astype(dt), preferred_element_type=jnp.float32)
    mid = jax.nn.gelu(mid + b1.astype(jnp.float32), approximate=False)
    out = x1 + b2.astype(jnp.float32) + jnp.dot(
        mid.astype(dt), w2.astype(dt), preferred_element_type=jnp.float32)
    return out.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def proj_ln_mlp_residual_d(x, attn_out, wp, bp, ln_scale, ln_bias, w1, b1,
                           w2, b2, interpret=False):
    """Differentiable proj_ln_mlp_residual (the whole post-attention tail)."""
    return proj_ln_mlp_residual(x, attn_out, wp, bp, ln_scale, ln_bias,
                                w1, b1, w2, b2, interpret=interpret)


def _proj_tail_d_fwd(x, a, wp, bp, s, b, w1, b1, w2, b2, interpret):
    out = proj_ln_mlp_residual(x, a, wp, bp, s, b, w1, b1, w2, b2,
                               interpret=interpret)
    return out, (x, a, wp, bp, s, b, w1, b1, w2, b2)


def _proj_tail_d_bwd(interpret, res, g):
    _, vjp = jax.vjp(_proj_tail_ref, *res)
    return vjp(g)


proj_ln_mlp_residual_d.defvjp(_proj_tail_d_fwd, _proj_tail_d_bwd)


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
