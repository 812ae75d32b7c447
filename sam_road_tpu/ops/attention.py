"""Pallas fused attention for the encoder blocks.

The hot path is softmax(q~ @ k~^T) @ v where q~/k~ already carry the
decomposed rel-pos bias as extra contraction dims (see models/vit.py). The
XLA path materializes the (N, N) fp32 score matrix in HBM; these kernels
keep scores in VMEM. Dispatch by a VMEM budget:

- whole-N kernel (one program per (batch, head)) when 2*N^2 fp32 scores +
  blocks fit the ~12 MB budget — windows (N=196) and 512px global grids
  (N=1024) land here with exact softmax;
- blocked flash (grid over q blocks, kv-tiled with running max/denominator
  scratch) for large N — the 1024px config's 4096-token global blocks (64 MB
  of scores would not fit VMEM) and anything larger;
- plain XLA fallback for large-N shapes the tiler can't split (N not a
  multiple of 128).

Differentiable via custom_vjp: the backward pass recomputes scores with
plain XLA ops (training batches are small; inference never differentiates).
Falls back to interpret mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # of ~16 MB/core, leave headroom


def _flash_kernel(q_ref, k_ref, v_ref, o_ref):
    # blocks: q/k (1, N, D), v (1, N, dv), o (1, N, dv)
    q = q_ref[0]
    k = k_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (N, N) f32, VMEM
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _blocked_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, nk):
    """True flash: kv-tiled with running max/denominator. Grid is
    (B*H, n_q_blocks, n_kv_blocks) — the kv axis is the fastest (sequential
    on TPU), so the (m, l, acc) scratch carries across kv steps and the
    output block is written once on the last step."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, D)
    k = k_ref[0]  # (bk, D)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[...] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[...] = acc

    @pl.when(kb == nk - 1)
    def _done():
        o_ref[0] = (acc / l_new).astype(o_ref.dtype)


def _whole_bytes(N, D, dv, itemsize):
    """VMEM estimate of the whole-N kernel: q/k/v/o blocks + f32 scores x2
    (scores and exp live simultaneously)."""
    return (2 * N * D + 2 * N * dv) * itemsize + 2 * N * N * 4


def _pick_block(N, target):
    for b in (target, 512, 256, 128):
        if b <= N and N % b == 0:
            return b
    return 0


def _flash_forward(q, k, v, interpret: bool):
    B, H, N, D = q.shape
    dv = v.shape[-1]
    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, N, D)
    vf = v.reshape(B * H, N, dv)

    if _whole_bytes(N, D, dv, q.dtype.itemsize) <= _VMEM_BUDGET_BYTES:
        # small N (windows, <=~1024-token grids): one program per (b, h),
        # exact softmax, scores never leave VMEM
        out = pl.pallas_call(
            _flash_kernel,
            out_shape=jax.ShapeDtypeStruct((B * H, N, dv), v.dtype),
            grid=(B * H,),
            in_specs=[
                pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, N, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(qf, kf, vf)
        return out.reshape(B, H, N, dv)

    bq = _pick_block(N, 512)
    bk = _pick_block(N, 1024)
    if not bq or not bk:
        # shape the kernel can't tile (large N not 128-divisible): XLA path
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)

    nk = N // bk
    import functools as _ft

    out = pl.pallas_call(
        _ft.partial(_blocked_kernel, nk=nk),
        out_shape=jax.ShapeDtypeStruct((B * H, N, dv), v.dtype),
        grid=(B * H, N // bq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda i, qi, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dv), lambda i, qi, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dv), lambda i, qi, ki: (i, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, dv)


def _relpos_rows_kernel(n_h: int, n_w: int, q_ref, k_ref, v_ref, bh_ref,
                        bw_ref, o_ref):
    """Whole-N attention with decomposed rel-pos applied in-kernel: the
    per-row bias projections bh/bw (q . Rh / q . Rw, computed cheaply in
    XLA as small batched matmuls) spread onto the key axis via static 0/1
    selector matmuls, so the folded q~/k~ augmentation tensors never
    materialize in HBM. One program per (batch, head); scores stay VMEM."""
    q = q_ref[0]  # (N, D) — pre-scaled
    k = k_ref[0]
    N = q.shape[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    # both bias spreads in ONE matmul: stacked selectors (n_h + n_w, N)
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (n_h, N), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (n_h, N), 1)
    sel_h = (k_idx // n_w == a_idx).astype(jnp.float32)
    a_idx2 = jax.lax.broadcasted_iota(jnp.int32, (n_w, N), 0)
    k_idx2 = jax.lax.broadcasted_iota(jnp.int32, (n_w, N), 1)
    sel_w = (k_idx2 % n_w == a_idx2).astype(jnp.float32)
    sel = jnp.concatenate([sel_h, sel_w], axis=0)  # (n_h + n_w, N)
    bhw = jnp.concatenate(
        [bh_ref[0].astype(jnp.float32), bw_ref[0].astype(jnp.float32)],
        axis=-1,
    )  # (N, n_h + n_w)
    s = s + jnp.dot(bhw, sel, preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def attention_relpos_rows(q, k, v, bh, bw, hw, interpret: bool = False):
    """softmax(q k^T + spread(bh) + spread(bw)) v over a full (H, W) grid.

    Args:
      q: [B, nH, N, D] PRE-SCALED queries; k, v: [B, nH, N, D/dv].
      bh: [B, nH, N, H] row-bias (q . Rh); bw: [B, nH, N, W].
      hw: the (H, W) token grid (N == H*W).
    Alternative to fold_rel_pos_qk + fused_attention for global blocks:
    same math, but the O(N*(D+H+W)) augmented tensors are replaced by the
    O(N*(H+W)) bias rows, and the spread happens in VMEM.
    """
    H, W = hw
    B, nH, N, D = q.shape
    dv = v.shape[-1]
    qf = q.reshape(B * nH, N, D)
    kf = k.reshape(B * nH, N, D)
    vf = v.reshape(B * nH, N, dv)
    bhf = bh.reshape(B * nH, N, H)
    bwf = bw.reshape(B * nH, N, W)
    out = pl.pallas_call(
        functools.partial(_relpos_rows_kernel, H, W),
        out_shape=jax.ShapeDtypeStruct((B * nH, N, dv), v.dtype),
        grid=(B * nH,),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, dv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf, bhf, bwf)
    return out.reshape(B, nH, N, dv)


def _relpos_rows_ref(q, k, v, bh, bw, H, W):
    """XLA reference of attention_relpos_rows (backward-side recompute):
    same math — s = q k^T + spread(bh) + spread(bw), fp32 softmax, p cast
    to v.dtype for the AV matmul."""
    B, nH, N, _ = q.shape
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    s = s.reshape(B, nH, N, H, W)
    s = s + bh.astype(jnp.float32)[..., None] \
          + bw.astype(jnp.float32)[..., None, :]
    s = s.reshape(B, nH, N, N)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def attention_relpos_rows_d(q, k, v, bh, bw, hw, interpret=False):
    """Differentiable attention_relpos_rows: Pallas forward, XLA-recompute
    backward via jax.vjp of _relpos_rows_ref (training path, round 4)."""
    return attention_relpos_rows(q, k, v, bh, bw, hw, interpret)


def _relpos_rows_d_fwd(q, k, v, bh, bw, hw, interpret):
    out = attention_relpos_rows(q, k, v, bh, bw, hw, interpret)
    return out, (q, k, v, bh, bw)


def _relpos_rows_d_bwd(hw, interpret, res, g):
    H, W = hw
    _, vjp = jax.vjp(
        lambda q, k, v, bh, bw: _relpos_rows_ref(q, k, v, bh, bw, H, W), *res
    )
    return vjp(g)


attention_relpos_rows_d.defvjp(_relpos_rows_d_fwd, _relpos_rows_d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, interpret: bool = False):
    """softmax(q @ k^T) @ v with scores resident in VMEM.

    Args:
      q, k: [B, H, N, D] (bias already folded into extra dims of D).
      v: [B, H, N, dv].
    """
    return _flash_forward(q, k, v, interpret)


def _fwd(q, k, v, interpret):
    return _flash_forward(q, k, v, interpret), (q, k, v)


def _bwd(interpret, res, g):
    # XLA recompute backward (training-only path).
    q, k, v = res
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bhnc->bhmc", p, g32)
    dp = jnp.einsum("bhnc,bhmc->bhnm", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_fwd, _bwd)


def use_pallas() -> bool:
    """Pallas-compiled path only on TPU; interpret elsewhere."""
    return jax.default_backend() == "tpu"
