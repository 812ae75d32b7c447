"""Fused windowed transformer block (Pallas, inference fast path).

The encoder's windowed blocks run matmuls at ~70% MFU but lose over half
their wall time to HBM round-trips between ops (LN casts, qkv/out transposes,
score materialization, GELU passes). One 14x14 window's entire block —
LN1 -> fused qkv -> per-head rel-pos attention -> proj -> residual -> LN2 ->
MLP -> residual — fits comfortably in VMEM (weights ~7 MB bf16 + activations
~3 MB), so this kernel executes the whole block per window with HBM traffic
of just x-in + x-out + (resident) weights.

Padding semantics match the reference exactly: the reference zero-pads the
NORM1 OUTPUT into windows (keys of padded slots are zeros). Here windows are
cut from the raw x, so the kernel applies a per-row real-token mask right
after LN1. Padded-row outputs are garbage and are dropped at unpartition,
exactly like the reference discards them.

Measured on v5e (ViT-B, 512px, B=32): fused encoder 191 ms vs 207 ms for the
XLA path — the kernel eliminates between-op HBM traffic but its per-window
matmuls (M=196) run below the MXU efficiency of XLA's all-window batching
(M=56448), so the net gain is ~8%. Kept as an experimental inference path
(models/fast_encoder.py) with full parity tests; not wired into the engine by
default. Grouping several windows per program would restore matmul shape at
the cost of VMEM pressure — candidate for a later round.
"""

from __future__ import annotations

import functools
import math

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


def _block_kernel(num_heads: int, win: int, group: int,
                  x_ref, mask_ref,
                  n1s_ref, n1b_ref, qkvw_ref, qkvb_ref, rh_ref, rw_ref,
                  pw_ref, pb_ref, n2s_ref, n2b_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref,
                  o_ref):
    N = win * win
    C = x_ref.shape[-1]
    head_dim = C // num_heads
    scale = head_dim ** -0.5
    eps = 1e-6
    GN = group * N

    x = x_ref[...].reshape(GN, C)  # group windows stacked along tokens
    mask_flat = mask_ref[...].reshape(GN, 1)
    xf = x.astype(jnp.float32)

    # LayerNorm1 (per-token, f32) then real-token mask (reference zero-pads
    # the norm1 output into windows)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * n1s_ref[:].astype(jnp.float32) + n1b_ref[:].astype(jnp.float32)
    # `where`, not multiply: pad rows of x hold garbage when blocks chain in
    # window layout, and 0 * garbage would propagate a hypothetical NaN.
    h = jnp.where(mask_flat.astype(jnp.float32) > 0, h, 0.0).astype(x.dtype)

    qkv = jnp.dot(h, qkvw_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + qkvb_ref[:].astype(jnp.float32)).astype(x.dtype)  # (N, 3C)

    # Row-expanded rel-pos tables: RH_exp[(i,j), a, c] = Rh[i, a, c] and
    # RW_exp[(i,j), b, c] = Rw[j, b, c] (precomputed outside). The bias then
    # needs no 4D score views (Mosaic rejects lane-dim reshapes of the score
    # matrix): bias rows come from VPU reductions and spread to the (N, N)
    # key axis via static 0/1 selector matmuls.
    rh_exp = rh_ref[:].astype(jnp.float32)  # (N, win, head_dim)
    rw_exp = rw_ref[:].astype(jnp.float32)
    # selectors: E[a, k] = 1 iff k // win == a ; F[b, k] = 1 iff k % win == b
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (win, N), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (win, N), 1)
    sel_h = (k_idx // win == a_idx).astype(jnp.float32)
    sel_w = (k_idx % win == a_idx).astype(jnp.float32)

    group_outs = []
    for g in range(group):
        head_outs = []
        for head in range(num_heads):
            q = qkv[g * N:(g + 1) * N, head * head_dim:(head + 1) * head_dim]
            k = qkv[g * N:(g + 1) * N,
                    C + head * head_dim: C + (head + 1) * head_dim]
            v = qkv[g * N:(g + 1) * N,
                    2 * C + head * head_dim: 2 * C + (head + 1) * head_dim]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            qf = q.astype(jnp.float32)
            bh = jnp.sum(qf[:, None, :] * rh_exp, axis=-1)  # (N, win)
            bw = jnp.sum(qf[:, None, :] * rw_exp, axis=-1)  # (N, win)
            s = s + jnp.dot(bh, sel_h, preferred_element_type=jnp.float32)
            s = s + jnp.dot(bw, sel_w, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            head_outs.append(o)
        group_outs.append(jnp.concatenate(head_outs, axis=-1))
    out = jnp.concatenate(group_outs, axis=0)  # (GN, C) f32

    proj = jnp.dot(out.astype(x.dtype), pw_ref[:],
                   preferred_element_type=jnp.float32)
    proj = proj + pb_ref[:].astype(jnp.float32)
    x1 = xf + proj  # residual 1 (f32)

    mu2 = jnp.mean(x1, axis=-1, keepdims=True)
    var2 = jnp.mean((x1 - mu2) ** 2, axis=-1, keepdims=True)
    h2 = (x1 - mu2) * jax.lax.rsqrt(var2 + eps)
    h2 = h2 * n2s_ref[:].astype(jnp.float32) + n2b_ref[:].astype(jnp.float32)

    mid = jnp.dot(h2.astype(x.dtype), w1_ref[:],
                  preferred_element_type=jnp.float32)
    mid = mid + b1_ref[:].astype(jnp.float32)
    mid = _gelu_exact(mid)
    mlp = jnp.dot(mid.astype(x.dtype), w2_ref[:],
                  preferred_element_type=jnp.float32)
    mlp = mlp + b2_ref[:].astype(jnp.float32)

    o_ref[...] = (x1 + mlp).astype(x.dtype).reshape(group, N, C)


def _attn_half_kernel(num_heads: int, win: int, group: int, npad: int,
                      x_ref, mask_ref, n1s_ref, n1b_ref, qkvw_ref, qkvb_ref,
                      rh_ref, rw_ref, pw_ref, pb_ref, o_ref):
    """Attention half of a windowed block, `group` windows per program with
    windows PADDED to npad tokens (a multiple of 8, so the (G, npad, C) ->
    (G*npad, C) merge is a legal Mosaic reshape — at the raw 196 it is not).
    LN1 -> mask -> fused qkv -> per-window rel-pos attention -> proj ->
    residual. Extra pad tokens (196..npad) are masked out of the key axis;
    their output rows are garbage and dropped at unpartition."""
    N = win * win
    C = x_ref.shape[-1]
    head_dim = C // num_heads
    scale = head_dim ** -0.5
    GN = group * npad

    x = x_ref[...].reshape(GN, C)
    mask_flat = mask_ref[...].reshape(GN, 1)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    h = h * n1s_ref[:].astype(jnp.float32) + n1b_ref[:].astype(jnp.float32)
    h = jnp.where(mask_flat.astype(jnp.float32) > 0, h, 0.0).astype(x.dtype)

    qkv = jnp.dot(h, qkvw_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + qkvb_ref[:].astype(jnp.float32)).astype(x.dtype)  # (GN, 3C)

    rh_exp = rh_ref[:].astype(jnp.float32)  # (npad, win, head_dim)
    rw_exp = rw_ref[:].astype(jnp.float32)
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (win, npad), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (win, npad), 1)
    sel_h = ((k_idx // win == a_idx) & (k_idx < N)).astype(jnp.float32)
    sel_w = ((k_idx % win == a_idx) & (k_idx < N)).astype(jnp.float32)
    # non-semantic pad tokens must not participate as keys (the first N
    # include SAM's semantic zero-padding, which must)
    key_bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1) < N, 0.0, -1e30
    )

    group_outs = []
    for g in range(group):
        head_outs = []
        for head in range(num_heads):
            q = qkv[g * npad:(g + 1) * npad,
                    head * head_dim:(head + 1) * head_dim]
            k = qkv[g * npad:(g + 1) * npad,
                    C + head * head_dim: C + (head + 1) * head_dim]
            v = qkv[g * npad:(g + 1) * npad,
                    2 * C + head * head_dim: 2 * C + (head + 1) * head_dim]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            qf = q.astype(jnp.float32)
            bh = jnp.sum(qf[:, None, :] * rh_exp, axis=-1)  # (npad, win)
            bw = jnp.sum(qf[:, None, :] * rw_exp, axis=-1)
            s = s + jnp.dot(bh, sel_h, preferred_element_type=jnp.float32)
            s = s + jnp.dot(bw, sel_w, preferred_element_type=jnp.float32)
            s = s + key_bias
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            head_outs.append(
                jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            )
        group_outs.append(jnp.concatenate(head_outs, axis=-1))
    out = jnp.concatenate(group_outs, axis=0)  # (GN, C) f32

    proj = jnp.dot(out.astype(x.dtype), pw_ref[:],
                   preferred_element_type=jnp.float32)
    proj = proj + pb_ref[:].astype(jnp.float32)
    o_ref[...] = (xf + proj).astype(o_ref.dtype).reshape(group, npad, C)


def _mlp_half_kernel(group: int, npad: int, chunks: int,
                     x_ref, n2s_ref, n2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     o_ref):
    """MLP half: LN2 -> lin1 -> exact gelu -> lin2 -> residual, with the
    hidden dim processed in `chunks` column blocks so the f32 hidden
    activation never exceeds the VMEM budget."""
    C = x_ref.shape[-1]
    GN = group * npad
    hidden = w1_ref.shape[-1]
    cs = hidden // chunks

    x = x_ref[...].reshape(GN, C)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h2 = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    h2 = (h2 * n2s_ref[:].astype(jnp.float32)
          + n2b_ref[:].astype(jnp.float32)).astype(x.dtype)

    acc = xf + b2_ref[:].astype(jnp.float32)
    for c in range(chunks):
        w1c = w1_ref[:, c * cs:(c + 1) * cs]
        mid = jnp.dot(h2, w1c, preferred_element_type=jnp.float32)
        mid = mid + b1_ref[c * cs:(c + 1) * cs].astype(jnp.float32)
        mid = _gelu_exact(mid)
        w2c = w2_ref[c * cs:(c + 1) * cs, :]
        acc = acc + jnp.dot(mid.astype(x.dtype), w2c,
                            preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype).reshape(group, npad, C)


def _round_up8(n: int) -> int:
    return ((n + 7) // 8) * 8


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
            s = s + jnp.dot(bh[head].astype(jnp.float32), sel_h,
                            preferred_element_type=jnp.float32)
            s = s + jnp.dot(bw[head].astype(jnp.float32), sel_w,
                            preferred_element_type=jnp.float32)
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


def fused_window_block_v2(x_windows, mask, block_params, win: int,
                          num_heads: int, interpret: bool = False,
                          group_attn: int = 4, group_mlp: int = 2,
                          mlp_chunks: int = 2):
    """Two-kernel fused windowed block over PADDED windows.

    Args:
      x_windows: [nW, npad, C] window tokens padded to npad = round_up8(196)
        (pad rows zero or garbage — they are masked before every attention
        and dropped at unpartition).
      mask: [nW, npad, 1], 1.0 only for REAL image tokens (the first
        win*win rows contain SAM's semantic zero-pads, which keep mask 0 too
        — identical to fused_window_block's contract).
    Returns [nW, npad, C].
    """
    nW, npad, C = x_windows.shape
    assert npad == _round_up8(win * win)
    ga = group_attn if nW % group_attn == 0 else 1
    gm = group_mlp if nW % group_mlp == 0 else 1
    attn = block_params["attn"]
    coords = np.arange(win)[:, None] - np.arange(win)[None, :] + win - 1
    rh = jnp.asarray(attn["rel_pos_h"])[coords]  # (win, win, hd)
    rw = jnp.asarray(attn["rel_pos_w"])[coords]
    rh = jnp.repeat(rh, win, axis=0)  # (N, win, hd)
    rw = jnp.tile(rw, (win, 1, 1))
    pad_rows = npad - win * win
    rh = jnp.pad(rh, ((0, pad_rows), (0, 0), (0, 0)))
    rw = jnp.pad(rw, ((0, pad_rows), (0, 0), (0, 0)))

    dt = x_windows.dtype
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    hd = C // num_heads

    x1 = pl.pallas_call(
        functools.partial(_attn_half_kernel, num_heads, win, ga, npad),
        out_shape=jax.ShapeDtypeStruct((nW, npad, C), dt),
        grid=(nW // ga,),
        in_specs=[
            pl.BlockSpec((ga, npad, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ga, npad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((C,)), full((C,)),
            full((C, 3 * C)), full((3 * C,)),
            full((npad, win, hd)), full((npad, win, hd)),
            full((C, C)), full((C,)),
        ],
        out_specs=pl.BlockSpec((ga, npad, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x_windows, mask.astype(dt),
        block_params["norm1"]["scale"].astype(dt),
        block_params["norm1"]["bias"].astype(dt),
        attn["qkv"]["kernel"].astype(dt), attn["qkv"]["bias"].astype(dt),
        rh.astype(dt), rw.astype(dt),
        attn["proj"]["kernel"].astype(dt), attn["proj"]["bias"].astype(dt),
    )

    hidden = block_params["mlp_lin1"]["kernel"].shape[-1]
    return pl.pallas_call(
        functools.partial(_mlp_half_kernel, gm, npad, mlp_chunks),
        out_shape=jax.ShapeDtypeStruct((nW, npad, C), dt),
        grid=(nW // gm,),
        in_specs=[
            pl.BlockSpec((gm, npad, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((C,)), full((C,)),
            full((C, hidden)), full((hidden,)),
            full((hidden, C)), full((C,)),
        ],
        out_specs=pl.BlockSpec((gm, npad, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x1,
        block_params["norm2"]["scale"].astype(dt),
        block_params["norm2"]["bias"].astype(dt),
        block_params["mlp_lin1"]["kernel"].astype(dt),
        block_params["mlp_lin1"]["bias"].astype(dt),
        block_params["mlp_lin2"]["kernel"].astype(dt),
        block_params["mlp_lin2"]["bias"].astype(dt),
    )


def fused_window_block(x_windows, mask, block_params, win: int,
                       num_heads: int, interpret: bool = False,
                       group: int = 1):
    """Run one transformer block over pre-partitioned windows.

    Args:
      x_windows: [nW, win*win, C] raw (un-normed) window tokens.
      mask: [nW, win*win, 1] 1.0 for real tokens, 0.0 for padding.
      block_params: the standard Block param dict (norm1/attn/norm2/mlp_*).
      win: window side (14).
      group: windows per program — larger groups give the LN/qkv/proj/MLP
        matmuls better MXU shapes (M = group*196) at the cost of VMEM.
        NOTE: group > 1 currently compiles only in interpret mode — this
        Mosaic version rejects the (G, N, C) -> (G*N, C) merge at N=196;
        parity is tested, revisit when the lowering supports it.
    Returns: [nW, win*win, C] block output (pad rows undefined).
    """
    nW, N, C = x_windows.shape
    if nW % group != 0:
        group = 1
    attn = block_params["attn"]
    # static rel-pos gather (win x win table from the (2*win-1, hd) params),
    # row-expanded to (N, win, hd) so the kernel needs no lane reshapes
    coords = np.arange(win)[:, None] - np.arange(win)[None, :] + win - 1
    rh = jnp.asarray(attn["rel_pos_h"])[coords]  # (win, win, hd): [i, a, c]
    rw = jnp.asarray(attn["rel_pos_w"])[coords]  # (win, win, hd): [j, b, c]
    rh = jnp.repeat(rh, win, axis=0)             # row (i, j) -> Rh[i]
    rw = jnp.tile(rw, (win, 1, 1))               # row (i, j) -> Rw[j]

    kernel = functools.partial(_block_kernel, num_heads, win, group)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    dt = x_windows.dtype
    args = (
        x_windows,
        mask.astype(dt),
        block_params["norm1"]["scale"].astype(dt),
        block_params["norm1"]["bias"].astype(dt),
        attn["qkv"]["kernel"].astype(dt),
        attn["qkv"]["bias"].astype(dt),
        rh.astype(dt),
        rw.astype(dt),
        attn["proj"]["kernel"].astype(dt),
        attn["proj"]["bias"].astype(dt),
        block_params["norm2"]["scale"].astype(dt),
        block_params["norm2"]["bias"].astype(dt),
        block_params["mlp_lin1"]["kernel"].astype(dt),
        block_params["mlp_lin1"]["bias"].astype(dt),
        block_params["mlp_lin2"]["kernel"].astype(dt),
        block_params["mlp_lin2"]["bias"].astype(dt),
    )
    G = group
    in_specs = [
        pl.BlockSpec((G, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, N, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        full((C,)), full((C,)),
        full((C, 3 * C)), full((3 * C,)),
        full((win * win, win, C // num_heads)),
        full((win * win, win, C // num_heads)),
        full((C, C)), full((C,)),
        full((C,)), full((C,)),
        full((C, 4 * C)), full((4 * C,)),
        full((4 * C, C)), full((C,)),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nW, N, C), dt),
        grid=(nW // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
