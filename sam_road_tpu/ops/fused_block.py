"""Window-layout Pallas attention kernels for the fused encoder path.

The v3 ("token-tiled") encoder design (models/fast_encoder.py) keeps all
per-token chains in token-tiled kernels (ops/fused_ln.py) and uses these
kernels ONLY for what needs the window layout: windowed multi-head
attention with SAM's decomposed relative-position bias, scores resident in
VMEM. Production kernel: window_attention_rows (bias rows precomputed in
XLA, spread in-kernel via static selector matmuls). The earlier
whole-block-per-window kernel generations (v1/v2) were removed in round 3:
per-window matmuls starved the MXU and grouped variants crashed the
platform's AOT compile helper; window_attention_relpos_batched documents
the intended batched-dot formulation that the same toolchain wall blocks
(tools/repro_aot_crash.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|error| <= 1.5e-7): the TPU Pallas
    lowering has no erf/erfc primitive."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _window_attn_kernel(num_heads: int, win: int, group: int, qkv_ref,
                        rh_ref, rw_ref, o_ref):
    """Pure windowed attention with in-kernel decomposed rel-pos: `group`
    windows per program, qkv already projected ([G, N, 3C] block). No
    LN/proj — the v3 path (models/fast_encoder.py) keeps those in
    token-tiled kernels/XLA where matmul shapes are MXU-grade; this kernel
    only does what NEEDS the window layout. Scores never touch HBM.
    (A batched-dot_general formulation collapses the per-head loop but
    crashes this platform's AOT compile helper — tools/repro_aot_crash.py.)"""
    N = win * win
    C = qkv_ref.shape[-1] // 3
    head_dim = C // num_heads
    scale = head_dim ** -0.5

    rh_exp = rh_ref[:].astype(jnp.float32)  # (N, win, head_dim)
    rw_exp = rw_ref[:].astype(jnp.float32)
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (win, N), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (win, N), 1)
    sel_h = (k_idx // win == a_idx).astype(jnp.float32)
    sel_w = (k_idx % win == a_idx).astype(jnp.float32)

    for g in range(group):
        qkv = qkv_ref[g]  # (N, 3C)
        head_outs = []
        for head in range(num_heads):
            q = qkv[:, head * head_dim:(head + 1) * head_dim]
            k = qkv[:, C + head * head_dim: C + (head + 1) * head_dim]
            v = qkv[:, 2 * C + head * head_dim: 2 * C + (head + 1) * head_dim]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            qf = q.astype(jnp.float32)
            bh = jnp.sum(qf[:, None, :] * rh_exp, axis=-1)  # (N, win)
            bw = jnp.sum(qf[:, None, :] * rw_exp, axis=-1)
            s = s + jnp.dot(bh, sel_h, preferred_element_type=jnp.float32)
            s = s + jnp.dot(bw, sel_w, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            head_outs.append(
                jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            )
        o_ref[g] = jnp.concatenate(head_outs, axis=-1).astype(o_ref.dtype)


def _window_attn_rows_kernel(num_heads: int, win: int, group: int, qkv_ref,
                             bh_ref, bw_ref, o_ref):
    """Windowed attention with PRECOMPUTED rel-pos bias rows (bh = q.Rh,
    bw = q.Rw, one cheap batched einsum in XLA for all windows x heads):
    the kernel only spreads them onto the key axis via static selector
    matmuls — 6 ops per head instead of 9 (the in-kernel broadcast-reduce
    of the (N, win, hd) tables was a third of the op count). Mirrors the
    global blocks' attention_relpos_rows design."""
    N = win * win
    C = qkv_ref.shape[-1] // 3
    head_dim = C // num_heads
    scale = head_dim ** -0.5

    a_idx = jax.lax.broadcasted_iota(jnp.int32, (win, N), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (win, N), 1)
    sel_h = (k_idx // win == a_idx).astype(jnp.float32)
    sel_w = (k_idx % win == a_idx).astype(jnp.float32)
    sel = jnp.concatenate([sel_h, sel_w], axis=0)  # (2*win, N)

    for g in range(group):
        qkv = qkv_ref[g]  # (N, 3C)
        bh = bh_ref[g]    # (H, N, win)
        bw = bw_ref[g]
        head_outs = []
        for head in range(num_heads):
            q = qkv[:, head * head_dim:(head + 1) * head_dim]
            k = qkv[:, C + head * head_dim: C + (head + 1) * head_dim]
            v = qkv[:, 2 * C + head * head_dim: 2 * C + (head + 1) * head_dim]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            # both bias spreads in ONE matmul against stacked selectors
            bhw = jnp.concatenate(
                [bh[head].astype(jnp.float32), bw[head].astype(jnp.float32)],
                axis=-1,
            )  # (N, 2*win)
            s = s + jnp.dot(bhw, sel, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            head_outs.append(
                jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            )
        o_ref[g] = jnp.concatenate(head_outs, axis=-1).astype(o_ref.dtype)


def window_attention_rows(qkv_windows, bh, bw, win: int, num_heads: int,
                          interpret: bool = False, group: int = 1):
    """Windowed attention over pre-projected qkv windows with precomputed
    rel-pos bias rows.

    Args:
      qkv_windows: [nW, N, 3C] fused qkv in window layout.
      bh / bw: [nW, H, N, win] per-head bias rows (q . Rh / q . Rw).
    Returns [nW, N, C].
    """
    nW, N, C3 = qkv_windows.shape
    assert N == win * win
    C = C3 // 3
    g = group
    while g > 1 and nW % g:
        g //= 2
    dt = qkv_windows.dtype
    blk = lambda shape: pl.BlockSpec(
        (g,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_window_attn_rows_kernel, num_heads, win, g),
        out_shape=jax.ShapeDtypeStruct((nW, N, C), dt),
        grid=(nW // g,),
        in_specs=[blk((N, C3)), blk((num_heads, N, win)),
                  blk((num_heads, N, win))],
        out_specs=blk((N, C)),
        interpret=interpret,
    )(qkv_windows, bh.astype(dt), bw.astype(dt))


def _win_sel(win: int):
    """Selector spreading (N, 2*win) bias rows onto the (N, N) key axis:
    key n' = (i', j') receives bh[:, i'] + bw[:, j']."""
    N = win * win
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (win, N), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (win, N), 1)
    sel_h = (k_idx // win == a_idx).astype(jnp.float32)
    sel_w = (k_idx % win == a_idx).astype(jnp.float32)
    return jnp.concatenate([sel_h, sel_w], axis=0)  # (2*win, N)


def _win_attn_body(num_heads, win, sel, qkv, bh, bw, out_dtype):
    """One window's multi-head attention. qkv: (N, 3C) biased; bh/bw:
    (H, N, win) bias rows; returns (win, win, C).

    Two measured micro-optimizations (TPU probe 2026-08-18, ~0.3 ms of a
    4.5 ms flagship dispatch):
    - DEFERRED softmax normalization: out = (exp(s-m) @ v) / sum instead
      of normalizing the (N, N) matrix — N*head_dim divides instead of
      N*N (fp32-identical to ~1e-7; the bf16 rounding of p moves scale-
      free, so TPU outputs shift within bf16 epsilon).
    - MERGED score matmul when head_dim is a power of two (scale 2^-k is
      then EXACT in bf16, so pre-scaling q is bit-identical to post-
      scaling the fp32 scores): s = [q*scale | bh | bw] @ [k | sel^T]^T
      computes q.k^T*scale + bias spread in ONE MXU dispatch (K=92 vs
      64+28)."""
    N = win * win
    C = qkv.shape[-1] // 3
    head_dim = C // num_heads
    scale = head_dim ** -0.5
    merged = head_dim & (head_dim - 1) == 0
    selT = sel.T.astype(qkv.dtype)  # (N, 2*win)
    head_outs = []
    for head in range(num_heads):
        q = qkv[:, head * head_dim:(head + 1) * head_dim]
        k = qkv[:, C + head * head_dim: C + (head + 1) * head_dim]
        v = qkv[:, 2 * C + head * head_dim: 2 * C + (head + 1) * head_dim]
        if merged:
            a = jnp.concatenate(
                [q * jnp.asarray(scale, q.dtype), bh[head].astype(q.dtype),
                 bw[head].astype(q.dtype)], axis=1)
            kb = jnp.concatenate([k, selT], axis=1)
            s = jnp.dot(a, kb.T, preferred_element_type=jnp.float32)
        else:
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            bhw = jnp.concatenate(
                [bh[head].astype(jnp.float32),
                 bw[head].astype(jnp.float32)], axis=-1)
            s = s + jnp.dot(bhw, sel, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        head_outs.append(
            jnp.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
            / jnp.sum(p, axis=-1, keepdims=True)
        )
    out = jnp.concatenate(head_outs, axis=-1)  # (N, C)
    return out.reshape(win, win, C).astype(out_dtype)


def _window_attn_rows_grid_kernel(num_heads: int, win: int, qkv_ref,
                                  bias_ref, bh_ref, bw_ref, o_ref):
    """window_attention_rows, but the window PARTITION lives in the block
    index maps: qkv blocks are (1, win, win, 3C) tiles read straight from
    the padded token grid and outputs are written back as grid tiles — the
    XLA reshape/transpose passes that materialized the (nW, N, 3C) window
    layout (and un-materialized the output) never touch HBM. The qkv BIAS
    is added in-kernel, so the grid tensor upstream is the bias-free
    ln_dense output zero-padded to the window grid: pad tokens become
    exactly qkv(0) = bias, reproducing SAM's zero-pads-after-norm
    semantics (reference model.py:245-258 window partition)."""
    N = win * win
    C3 = qkv_ref.shape[-1]
    sel = _win_sel(win)
    qkv = qkv_ref[0, 0, :, 0, :, :].reshape(N, C3) \
        + bias_ref[:].astype(qkv_ref.dtype)
    o_ref[0, 0, :, 0, :, :] = _win_attn_body(
        num_heads, win, sel, qkv, bh_ref[0, 0, 0], bw_ref[0, 0, 0],
        o_ref.dtype)


# An UNROLLED row-of-windows granularity (one program per (batch,
# window-row) with all nJ windows' bodies unrolled) crashed the platform
# AOT compile helper (HTTP 500, 2026-08-18) — the same body-size wall as
# the removed v1/v2 grouped kernels (tools/repro_aot_crash.py). The
# ROLLED variant below keeps the body at one window (a lax.fori_loop
# walks the row's windows with dynamic VMEM indexing), so the MLIR stays
# per-window-sized while the program count drops nJ-fold.


def _window_attn_rows_grid_rolled_kernel(num_heads: int, win: int, nJ: int,
                                         qkv_ref, bias_ref, bh_ref, bw_ref,
                                         o_ref):
    """Row-of-windows with a ROLLED window loop: one program per (batch,
    window-row); a fori_loop walks the nJ windows of the row, loading
    each (win, win, 3C) tile from the row block with a dynamic index.
    Same math as _window_attn_rows_grid_kernel, nJ-fold fewer programs,
    kernel body size unchanged (the AOT helper's constraint)."""
    N = win * win
    C3 = qkv_ref.shape[-1]
    C = C3 // 3
    sel = _win_sel(win)
    bias = bias_ref[:].astype(qkv_ref.dtype)

    def body(j, carry):
        qkv = qkv_ref[0, 0, :, pl.ds(j, 1), :, :].reshape(N, C3) + bias
        bh = bh_ref[0, 0, pl.ds(j, 1), :, :, :].reshape(num_heads, N, win)
        bw = bw_ref[0, 0, pl.ds(j, 1), :, :, :].reshape(num_heads, N, win)
        out = _win_attn_body(num_heads, win, sel, qkv, bh, bw, o_ref.dtype)
        o_ref[0, 0, :, pl.ds(j, 1), :, :] = out.reshape(win, 1, win, C)
        return carry

    jax.lax.fori_loop(0, nJ, body, 0)


def _window_attn_rows_grid_gbatch_kernel(num_heads: int, win: int, G: int,
                                         qkv_ref, bias_ref, bh_ref, bw_ref,
                                         o_ref):
    """Grid kernel grouped over the BATCH dim with a ROLLED loop: one
    program handles the same (i, j) window of G consecutive batch images;
    a fori_loop walks them with leading-dim dynamic indexing, so the MLIR
    body stays one-window-sized (the AOT helper's constraint — unrolled
    grouping crashes it) while the program count drops G-fold. The
    window-attention dispatch is LATENCY-bound (288 programs x unrolled
    per-head chains, docs/DESIGN.md), so fewer/larger programs attack the
    measured floor directly."""
    N = win * win
    C3 = qkv_ref.shape[-1]
    sel = _win_sel(win)
    bias = bias_ref[:].astype(qkv_ref.dtype)

    def body(g, carry):
        qkv = qkv_ref[pl.ds(g, 1), 0, :, 0, :, :].reshape(N, C3) + bias
        bh = bh_ref[pl.ds(g, 1), 0, 0].reshape(num_heads, N, win)
        bw = bw_ref[pl.ds(g, 1), 0, 0].reshape(num_heads, N, win)
        out = _win_attn_body(num_heads, win, sel, qkv, bh, bw, o_ref.dtype)
        o_ref[pl.ds(g, 1), 0, :, 0, :, :] = out[None]
        return carry

    jax.lax.fori_loop(0, G, body, 0)


def window_attention_rows_grid(qkv_grid, qkv_bias, bh, bw, win: int,
                               num_heads: int, interpret: bool = False,
                               rolled_rows: bool = False,
                               group_batch: int = 1):
    """Windowed attention reading/writing the padded token GRID directly.

    Args:
      qkv_grid: [B, Hp, Wp, 3C] BIAS-FREE qkv on the zero-padded grid
        (Hp/Wp multiples of win). The bias is added in-kernel so pad
        tokens act as qkv(0) = bias keys (SAM semantics).
      qkv_bias: [3C].
      bh / bw: [B, Hp//win, Wp//win, H, N, win] per-head bias rows
        (q+qb) . Rh / Rw in token order n = i*win + j.
    Returns [B, Hp, Wp, C] attention output on the padded grid.
    """
    B, Hp, Wp, C3 = qkv_grid.shape
    assert Hp % win == 0 and Wp % win == 0
    nI, nJ = Hp // win, Wp // win
    N = win * win
    C = C3 // 3
    dt = qkv_grid.dtype
    # Mosaic requires the last two BLOCK dims to be (8,128)-divisible or
    # full: a (win, win, 3C) tile of the 4-D grid violates that at win=14.
    # The free (no-transpose) 6-D view (B, nI, ws, nJ, ws, 3C) makes both
    # window axes FULL array dims, so (1,1,ws,1,ws,3C) blocks are legal and
    # the DMA engine gathers window tiles straight from the grid layout.
    qkv6 = qkv_grid.reshape(B, nI, win, nJ, win, C3)
    G = group_batch
    while G > 1 and B % G:
        G //= 2
    if G > 1:
        win_blk = lambda c: pl.BlockSpec(
            (G, 1, win, 1, win, c), lambda b, i, j: (b, i, 0, j, 0, 0),
            memory_space=pltpu.VMEM)
        out6 = pl.pallas_call(
            functools.partial(_window_attn_rows_grid_gbatch_kernel,
                              num_heads, win, G),
            out_shape=jax.ShapeDtypeStruct((B, nI, win, nJ, win, C), dt),
            grid=(B // G, nI, nJ),
            in_specs=[
                win_blk(C3),
                pl.BlockSpec((C3,), lambda b, i, j: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 1, 1, num_heads, N, win),
                             lambda b, i, j: (b, i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 1, 1, num_heads, N, win),
                             lambda b, i, j: (b, i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=win_blk(C),
            interpret=interpret,
        )(qkv6, qkv_bias.astype(dt), bh.astype(dt), bw.astype(dt))
        return out6.reshape(B, Hp, Wp, C)
    if rolled_rows:
        win_blk = lambda c: pl.BlockSpec(
            (1, 1, win, nJ, win, c), lambda b, i: (b, i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM)
        rows_blk = pl.BlockSpec(
            (1, 1, nJ, num_heads, N, win), lambda b, i: (b, i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM)
        out6 = pl.pallas_call(
            functools.partial(_window_attn_rows_grid_rolled_kernel,
                              num_heads, win, nJ),
            out_shape=jax.ShapeDtypeStruct((B, nI, win, nJ, win, C), dt),
            grid=(B, nI),
            in_specs=[
                win_blk(C3),
                pl.BlockSpec((C3,), lambda b, i: (0,),
                             memory_space=pltpu.VMEM),
                rows_blk, rows_blk,
            ],
            out_specs=win_blk(C),
            interpret=interpret,
        )(qkv6, qkv_bias.astype(dt), bh.astype(dt), bw.astype(dt))
        return out6.reshape(B, Hp, Wp, C)
    win_blk = lambda c: pl.BlockSpec(
        (1, 1, win, 1, win, c), lambda b, i, j: (b, i, 0, j, 0, 0),
        memory_space=pltpu.VMEM)
    out6 = pl.pallas_call(
        functools.partial(_window_attn_rows_grid_kernel, num_heads, win),
        out_shape=jax.ShapeDtypeStruct((B, nI, win, nJ, win, C), dt),
        grid=(B, nI, nJ),
        in_specs=[
            win_blk(C3),
            pl.BlockSpec((C3,), lambda b, i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, num_heads, N, win),
                         lambda b, i, j: (b, i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, num_heads, N, win),
                         lambda b, i, j: (b, i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=win_blk(C),
        interpret=interpret,
    )(qkv6, qkv_bias.astype(dt), bh.astype(dt), bw.astype(dt))
    return out6.reshape(B, Hp, Wp, C)


def _window_attn_grid_ref(qkv_grid, qkv_bias, bh, bw, win, num_heads):
    """XLA reference of window_attention_rows_grid (backward-side
    recompute): window-partition in XLA, per-head scores with the bias
    rows spread over (i', j') key coordinates, fp32 softmax, p cast to
    v.dtype for the AV matmul. Math matches the kernel (the kernel's
    merged/pre-scaled q formulation is exact for power-of-two head dims)."""
    B, Hp, Wp, C3 = qkv_grid.shape
    C = C3 // 3
    hd = C // num_heads
    nI, nJ = Hp // win, Wp // win
    N = win * win
    scale = hd ** -0.5
    dt = qkv_grid.dtype
    qkv = qkv_grid.reshape(B, nI, win, nJ, win, C3).transpose(0, 1, 3, 2, 4, 5)
    qkv = qkv.reshape(B, nI, nJ, N, C3) + qkv_bias.astype(dt)

    def heads(t):  # (B, nI, nJ, N, C) -> (B, nI, nJ, num_heads, N, hd)
        return t.reshape(B, nI, nJ, N, num_heads, hd).transpose(0, 1, 2, 4, 3, 5)

    q = heads(qkv[..., :C])
    k = heads(qkv[..., C:2 * C])
    v = heads(qkv[..., 2 * C:])
    s = jnp.einsum("...nd,...md->...nm", q * jnp.asarray(scale, dt), k,
                   preferred_element_type=jnp.float32)
    s = s.reshape(B, nI, nJ, num_heads, N, win, win)
    s = s + bh.astype(jnp.float32)[..., None] \
          + bw.astype(jnp.float32)[..., None, :]
    s = s.reshape(B, nI, nJ, num_heads, N, N)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("...nm,...md->...nd", p.astype(dt), v,
                     preferred_element_type=jnp.float32).astype(dt)
    # (B, nI, nJ, H, N, hd) -> (B, Hp, Wp, C)
    out = out.transpose(0, 1, 2, 4, 3, 5).reshape(B, nI, nJ, win, win, C)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def window_attention_rows_grid_d(qkv_grid, qkv_bias, bh, bw, win, num_heads,
                                 interpret=False):
    """Differentiable window_attention_rows_grid (default granularity):
    Pallas forward, XLA-recompute backward via jax.vjp of
    _window_attn_grid_ref (training path, round 4)."""
    return window_attention_rows_grid(qkv_grid, qkv_bias, bh, bw, win,
                                      num_heads, interpret=interpret)


def _window_grid_d_fwd(qkv_grid, qkv_bias, bh, bw, win, num_heads, interpret):
    out = window_attention_rows_grid(qkv_grid, qkv_bias, bh, bw, win,
                                     num_heads, interpret=interpret)
    return out, (qkv_grid, qkv_bias, bh, bw)


def _window_grid_d_bwd(win, num_heads, interpret, res, g):
    _, vjp = jax.vjp(
        lambda qkv, bias, bh, bw: _window_attn_grid_ref(
            qkv, bias, bh, bw, win, num_heads), *res)
    return vjp(g)


window_attention_rows_grid_d.defvjp(_window_grid_d_fwd, _window_grid_d_bwd)


def _window_attn_batched_kernel(win: int, n_real: int, q_ref, k_ref, v_ref,
                                rh_ref, rw_ref, o_ref):
    """Batched windowed attention: (window, head) pairs flattened into ONE
    leading batch dim, `GH` of them per program, every stage a single
    batched dot_general (no per-head Python loop — the unrolled-head
    kernels are latency-bound on thousands of tiny MXU ops at 288+
    programs x 12 heads). Token axis padded to a lane-aligned Np (>=128
    multiple): the first n_real keys are SAM-semantic, the rest are masked
    out with -inf bias. Blocks: q/k/v (GH, Np, hd); rel tables
    row-expanded (Np, win, hd)."""
    GH, Np, hd = q_ref.shape
    scale = hd ** -0.5
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    b1 = (((2,), (2,)), ((0,), (0,)))  # contract last, batch leading
    s = jax.lax.dot_general(q, k, b1, preferred_element_type=jnp.float32)
    s = s * scale  # (GH, Np, Np) f32
    qf = q.astype(jnp.float32)
    rh = rh_ref[:].astype(jnp.float32)  # (Np, win, hd)
    rw = rw_ref[:].astype(jnp.float32)
    # bh[g, n, a] = sum_c q[g, n, c] * rh[n, a, c] — 4D broadcast-reduce
    bh = jnp.sum(qf[:, :, None, :] * rh[None], axis=-1)  # (GH, Np, win)
    bw = jnp.sum(qf[:, :, None, :] * rw[None], axis=-1)
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (win, Np), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (win, Np), 1)
    real = k_idx < n_real
    sel_h = ((k_idx // win == a_idx) & real).astype(jnp.float32)
    sel_w = ((k_idx % win == a_idx) & real).astype(jnp.float32)
    bspread = (((2,), (1,)), ((0,), (0,)))
    s = s + jax.lax.dot_general(
        bh, jnp.broadcast_to(sel_h[None], (GH, win, Np)), bspread,
        preferred_element_type=jnp.float32)
    s = s + jax.lax.dot_general(
        bw, jnp.broadcast_to(sel_w[None], (GH, win, Np)), bspread,
        preferred_element_type=jnp.float32)
    # non-semantic pad keys (n_real..Np) never participate
    s = s + jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, Np), 2) < n_real, 0.0,
        -1e30,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[...] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def window_attention_relpos_batched(q, k, v, rel_pos_h, rel_pos_w, win: int,
                                    group: int = 4,
                                    interpret: bool = False):
    """Windowed rel-pos attention over head-split q/k/v [nW, H, N, hd].

    Returns [nW, H, N, hd]. The (window, head) axes flatten into one batch
    dim so the kernel runs ONE batched matmul per stage (scores,
    bias-spread x2, AV) for `group` windows x all heads per program,
    instead of a per-head loop of tiny MXU ops. The token axis is padded
    to a 128-lane multiple (196 -> 256 at window 14) with -inf-masked
    keys, keeping every score matrix lane-aligned."""
    nW, H, N, hd = q.shape
    assert N == win * win
    g = group
    while g > 1 and nW % g:
        g //= 2
    Np = _round_up(max(N, 128), 128)
    coords = np.arange(win)[:, None] - np.arange(win)[None, :] + win - 1
    rh = jnp.asarray(rel_pos_h)[coords]
    rw = jnp.asarray(rel_pos_w)[coords]
    rh = jnp.repeat(rh, win, axis=0)
    rw = jnp.tile(rw, (win, 1, 1))
    rh = jnp.pad(rh, ((0, Np - N), (0, 0), (0, 0)))
    rw = jnp.pad(rw, ((0, Np - N), (0, 0), (0, 0)))
    dt = q.dtype
    GH = g * H
    pad = ((0, 0), (0, Np - N), (0, 0))
    qf = jnp.pad(q.reshape(nW * H, N, hd), pad)
    kf = jnp.pad(k.reshape(nW * H, N, hd), pad)
    vf = jnp.pad(v.reshape(nW * H, N, hd), pad)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    blk = lambda: pl.BlockSpec((GH, Np, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_window_attn_batched_kernel, win, N),
        out_shape=jax.ShapeDtypeStruct((nW * H, Np, hd), dt),
        grid=(nW * H // GH,),
        in_specs=[blk(), blk(), blk(),
                  full((Np, win, hd)), full((Np, win, hd))],
        out_specs=blk(),
        interpret=interpret,
    )(qf, kf, vf, rh.astype(dt), rw.astype(dt))
    return out[:, :N].reshape(nW, H, N, hd)


def window_attention_relpos(qkv_windows, rel_pos_h, rel_pos_w, win: int,
                            num_heads: int, interpret: bool = False,
                            group: int = 1):
    """Windowed multi-head attention over pre-projected qkv windows.

    Args:
      qkv_windows: [nW, win*win, 3C] — fused qkv (bias included), window
        layout. Pad windows/tokens follow SAM semantics upstream (pad
        tokens carry the qkv bias, i.e. qkv of a zero input).
      rel_pos_h / rel_pos_w: (2*win-1, head_dim) decomposed tables.
      group: windows per program (amortizes per-program overhead at the
        cost of MLIR size — large groups can upset fragile AOT toolchains).
    Returns [nW, win*win, C] attention output (pre-proj).
    """
    nW, N, C3 = qkv_windows.shape
    assert N == win * win
    C = C3 // 3
    hd = C // num_heads
    g = group
    while g > 1 and nW % g:
        g //= 2
    coords = np.arange(win)[:, None] - np.arange(win)[None, :] + win - 1
    rh = jnp.asarray(rel_pos_h)[coords]  # (win, win, hd): [i, a, c]
    rw = jnp.asarray(rel_pos_w)[coords]
    rh = jnp.repeat(rh, win, axis=0)     # row (i, j) -> Rh[i]
    rw = jnp.tile(rw, (win, 1, 1))       # row (i, j) -> Rw[j]

    dt = qkv_windows.dtype
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_window_attn_kernel, num_heads, win, g),
        out_shape=jax.ShapeDtypeStruct((nW, N, C), dt),
        grid=(nW // g,),
        in_specs=[
            pl.BlockSpec((g, N, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((N, win, hd)), full((N, win, hd)),
        ],
        out_specs=pl.BlockSpec((g, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv_windows, rh.astype(dt), rw.astype(dt))
