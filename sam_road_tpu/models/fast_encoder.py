"""Fused-kernel encoder forward (the engine's production path).

A functional re-statement of ImageEncoderViT.__call__ that consumes the
SAME parameter tree as the flax module but re-fuses each block TPU-first
("token-tiled" design, round 3): per-token chains (LN+qkv, LN+MLP+residual)
run in token-tiled Pallas kernels at MXU-grade matmul shapes with hidden
activations resident in VMEM (ops/fused_ln.py); only the attention itself
runs in window layout, with rel-pos bias rows precomputed by one XLA
batched einsum and spread in-kernel (ops/fused_block.py). Earlier
whole-block-per-window kernel generations (v1/v2) were removed: their
per-window matmuls starved the MXU and their grouped forms crashed the
platform AOT compile helper (docs/DESIGN.md round-3 findings,
tools/repro_aot_crash.py).

Used by the inference engine when config.FUSED_ENCODER is on; training and
checkpoints are untouched. Parity is tested against the flax encoder.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from sam_road_tpu.models.vit import ENCODER_SPECS, _get_rel_pos_table, fold_rel_pos_qk
from sam_road_tpu.ops.attention import (
    _VMEM_BUDGET_BYTES,
    _whole_bytes,
    attention_relpos_rows,
    attention_relpos_rows_d,
    fused_attention,
)
from sam_road_tpu.ops.fused_block import (
    window_attention_rows_grid,
    window_attention_rows_grid_d,
)
from sam_road_tpu.ops.fused_ln import (
    ln_dense,
    ln_dense_bias_d,
    ln_dense_d,
    ln_dense_padded,
    proj_ln_mlp_residual,
    proj_ln_mlp_residual_d,
    proj_ln_mlp_residual_grid,
)


def _layer_norm(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)) * scale + bias


def _layer_norm2d(x, weight, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) / jnp.sqrt(var + eps)
    return y * weight + bias


# Trace-time switch: compute the post-attention tail (proj + residual +
# LN2 + MLP + residual) with plain XLA ops instead of the token-tiled
# Pallas kernel. For same-process paired A/Bs
# (tools/experiment_fused_encoder.py); production default False.
XLA_TAIL = False

# Trace-time switch: pad-free windowed-block data path — LN+qkv writes the
# window-padded grid DIRECTLY (ln_dense_padded) and the tail reads the
# attention output from the padded grid (proj_ln_mlp_residual_grid), so
# the jnp.pad pass and the unpad slice/reshape pass never materialize.
# MEASURED NEGATIVE (2026-08-18, paired interleaved A/B, 5 rounds x2
# configs): pad-free 129.3-129.9 ms vs padded 128.0-128.3 ms per B=32
# forward — the XLA pad/unpad copies cost less than the strip kernels'
# extra per-program overhead (rs=8 and rs=16 both tried), so the ~8 ms
# projected HBM saving does not exist in practice. Default stays the
# round-3 path; the kernels + flag remain for re-measurement on other
# hardware (and they document the probed Mosaic facts: non-divisible
# leading-dim blocks and dropped OOB stores are legal —
# tools/probe_nondiv_blocks.py).
PAD_FREE = False

# Trace-time switches for the window-attention kernel granularity
# (tools/experiment_fused_encoder.py A/B): WIN_GROUP_BATCH=G runs the same
# window of G consecutive batch images per program via a ROLLED loop
# (program count /G — the dispatch is latency-bound); WIN_ROLLED_ROWS
# loops a window-row's nJ windows per program.
WIN_GROUP_BATCH = 1
WIN_ROLLED_ROWS = False


def _tail_xla(x, out, attn, bp, dtype):
    """XLA-op tail, numerics matching proj_ln_mlp_residual (fp32 x1/LN)."""
    x1 = (x.astype(jnp.float32)
          + (out @ attn["proj"]["kernel"].astype(dtype)).astype(jnp.float32)
          + attn["proj"]["bias"].astype(jnp.float32))
    h = _layer_norm(x1, bp["norm2"]["scale"], bp["norm2"]["bias"]).astype(dtype)
    mid = jax.nn.gelu(
        (h @ bp["mlp_lin1"]["kernel"].astype(dtype)).astype(jnp.float32)
        + bp["mlp_lin1"]["bias"].astype(jnp.float32), approximate=False,
    ).astype(dtype)
    return (x1 + (mid @ bp["mlp_lin2"]["kernel"].astype(dtype)).astype(
        jnp.float32) + bp["mlp_lin2"]["bias"].astype(jnp.float32)
    ).astype(dtype)


def _windowed_block_v3(x, bp, num_heads, ws, dtype, on_tpu, diff=False):
    """Windowed block, token-tiled fusion (kernel_version=3).

    The per-token chains run in token-tiled Pallas kernels at MXU-grade
    matmul shapes (ops/fused_ln.py); ONLY the attention itself runs in
    window layout (ops/fused_block.py window_attention_rows): rel-pos bias
    ROWS (q.Rh / q.Rw) come from one XLA batched einsum over all windows x
    heads and are spread onto the key axis in-kernel via static selector
    matmuls — the folded-q~k~ formulation used by the flax path costs
    ~5 ms/block in aug-tensor HBM traffic at flagship geometry.

    Exact reference semantics: SAM zero-pads the NORM1 OUTPUT into windows
    (keys of pad slots = qkv bias). Here qkv is computed bias-FREE on real
    tokens only (no pad-token FLOPs), zero-padded to the window grid, and
    the bias is added across the padded grid — pad tokens become exactly
    `bias` = qkv(0). Pad-row attention outputs are cropped before proj, so
    proj/MLP also never compute on pad tokens (the reference spends 1.7x
    qkv/proj FLOPs on them at 512px: grid 32 pads to 42).
    """
    B, H, W, C = x.shape
    interp = not on_tpu
    attn = bp["attn"]

    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    # pad slots stay exactly 0 (bias-free); the attention kernel adds the
    # qkv bias in-kernel, so pad tokens become qkv(0) = bias (SAM
    # semantics) WITHOUT a second full-activation bias pass, and the
    # window partition/unpartition transposes live in the kernel's block
    # index maps instead of HBM (window_attention_rows_grid).
    if PAD_FREE and not diff:
        # LN+qkv writes the padded grid directly — no separate pad pass
        qkv_p = ln_dense_padded(
            x, bp["norm1"]["scale"], bp["norm1"]["bias"],
            attn["qkv"]["kernel"], (pad_h, pad_w), interpret=interp,
        )
    else:
        if diff:
            qkv_nb = ln_dense_d(
                x.reshape(B * H * W, C), bp["norm1"]["scale"],
                bp["norm1"]["bias"], attn["qkv"]["kernel"], interp,
            ).reshape(B, H, W, 3 * C)
        else:
            qkv_nb = ln_dense(
                x.reshape(B * H * W, C), bp["norm1"]["scale"],
                bp["norm1"]["bias"], attn["qkv"]["kernel"], None,
                interpret=interp,
            ).reshape(B, H, W, 3 * C)
        qkv_p = jnp.pad(qkv_nb, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    nI, nJ = Hp // ws, Wp // ws

    # rel-pos bias rows for ALL windows x heads in one XLA batched einsum
    # (the in-kernel broadcast-reduce was a third of the kernel's op count);
    # the qkv bias's contribution (qb . R) is a constant per (head, row)
    # added analytically — never materializing a biased q tensor.
    hd = C // num_heads
    coords = np.arange(ws)[:, None] - np.arange(ws)[None, :] + ws - 1
    Rh = jnp.asarray(attn["rel_pos_h"])[coords].astype(dtype)  # (ws, ws, hd)
    Rw = jnp.asarray(attn["rel_pos_w"])[coords].astype(dtype)
    q_p = qkv_p[..., :C].reshape(B, nI, ws, nJ, ws, num_heads, hd)
    bias_q = attn["qkv"]["bias"][:C].reshape(num_heads, hd).astype(dtype)
    bh = jnp.einsum("bIiJjhc,iac->bIJhija", q_p, Rh)
    bw = jnp.einsum("bIiJjhc,jac->bIJhija", q_p, Rw)
    bh = bh + jnp.einsum("hc,iac->hia", bias_q, Rh)[
        None, None, None, :, :, None, :]
    bw = bw + jnp.einsum("hc,jac->hja", bias_q, Rw)[
        None, None, None, :, None, :, :]
    N = ws * ws
    bh = bh.reshape(B, nI, nJ, num_heads, N, ws)
    bw = bw.reshape(B, nI, nJ, num_heads, N, ws)
    if diff:
        out_p = window_attention_rows_grid_d(
            qkv_p, attn["qkv"]["bias"].astype(dtype), bh, bw, ws, num_heads,
            interp,
        )
        out = out_p[:, :H, :W, :]
        return proj_ln_mlp_residual_d(
            x.reshape(B * H * W, C), out.reshape(B * H * W, C),
            attn["proj"]["kernel"], attn["proj"]["bias"],
            bp["norm2"]["scale"], bp["norm2"]["bias"],
            bp["mlp_lin1"]["kernel"], bp["mlp_lin1"]["bias"],
            bp["mlp_lin2"]["kernel"], bp["mlp_lin2"]["bias"], interp,
        ).reshape(B, H, W, C)
    out_p = window_attention_rows_grid(
        qkv_p, attn["qkv"]["bias"].astype(dtype), bh, bw, ws, num_heads,
        interpret=interp, rolled_rows=WIN_ROLLED_ROWS,
        group_batch=WIN_GROUP_BATCH,
    )
    if XLA_TAIL:
        out = out_p[:, :H, :W, :]
        return _tail_xla(x, out, attn, bp, dtype)
    if PAD_FREE:
        # tail reads attn output straight from the padded grid — no unpad
        # slice/reshape pass
        return proj_ln_mlp_residual_grid(
            x, out_p,
            attn["proj"]["kernel"], attn["proj"]["bias"],
            bp["norm2"]["scale"], bp["norm2"]["bias"],
            bp["mlp_lin1"]["kernel"], bp["mlp_lin1"]["bias"],
            bp["mlp_lin2"]["kernel"], bp["mlp_lin2"]["bias"],
            interpret=interp,
        )
    out = out_p[:, :H, :W, :]
    # whole post-attention tail (proj + residual + LN2 + MLP + residual)
    # in one token-tiled HBM pass; x1 never touches HBM
    return proj_ln_mlp_residual(
        x.reshape(B * H * W, C), out.reshape(B * H * W, C),
        attn["proj"]["kernel"], attn["proj"]["bias"],
        bp["norm2"]["scale"], bp["norm2"]["bias"],
        bp["mlp_lin1"]["kernel"], bp["mlp_lin1"]["bias"],
        bp["mlp_lin2"]["kernel"], bp["mlp_lin2"]["bias"], interpret=interp,
    ).reshape(B, H, W, C)


def _global_block_v3(x, bp, num_heads, dtype, on_tpu, diff=False):
    """Global block with token-tiled LN1+qkv and LN2+MLP kernels; attention
    runs the whole-N kernel with rel-pos bias ROWS (q.Rh / q.Rw, small
    batched einsums in XLA) spread onto the key axis in-kernel — the
    folded q~/k~ augmentation (O(N*(D+H+W)) tensors, ~250 MB/block at
    flagship geometry) never touches HBM."""
    B, H, W, C = x.shape
    interp = not on_tpu
    attn = bp["attn"]
    head_dim = C // num_heads
    scale = head_dim ** -0.5

    if diff:
        qkv = ln_dense_bias_d(
            x.reshape(B * H * W, C), bp["norm1"]["scale"],
            bp["norm1"]["bias"], attn["qkv"]["kernel"], attn["qkv"]["bias"],
            interp,
        )
    else:
        qkv = ln_dense(
            x.reshape(B * H * W, C), bp["norm1"]["scale"], bp["norm1"]["bias"],
            attn["qkv"]["kernel"], attn["qkv"]["bias"], interpret=interp,
        )
    qkv = qkv.reshape(B, H * W, 3, num_heads, head_dim)
    q, k, v = jnp.moveaxis(qkv, 2, 0).transpose(0, 1, 3, 2, 4)
    Rh = _get_rel_pos_table(H, attn["rel_pos_h"]).astype(dtype)
    Rw = _get_rel_pos_table(W, attn["rel_pos_w"]).astype(dtype)
    N = H * W
    if _whole_bytes(N, head_dim, head_dim, q.dtype.itemsize) <= \
            _VMEM_BUDGET_BYTES:
        # whole-N rows kernel: scores resident in VMEM (512px grids)
        r_q = q.reshape(B, num_heads, H, W, head_dim)
        bh = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh).reshape(
            B, num_heads, N, H)
        bw = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw).reshape(
            B, num_heads, N, W)
        if diff:
            out = attention_relpos_rows_d(q * scale, k, v, bh, bw, (H, W),
                                          interp)
        else:
            out = attention_relpos_rows(q * scale, k, v, bh, bw, (H, W),
                                        interp)
    else:
        # large grids (1024px+: 4096-token scores would blow VMEM): folded
        # rel-pos + the kv-tiled blocked flash kernel (ops/attention.py,
        # already differentiable via its own custom_vjp)
        q_aug, k_aug = fold_rel_pos_qk(q, k, Rh, Rw, (H, W), scale)
        out = fused_attention(q_aug, k_aug, v, interp)
    out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
    if diff:
        return proj_ln_mlp_residual_d(
            x.reshape(B * H * W, C), out.reshape(B * H * W, C),
            attn["proj"]["kernel"], attn["proj"]["bias"],
            bp["norm2"]["scale"], bp["norm2"]["bias"],
            bp["mlp_lin1"]["kernel"], bp["mlp_lin1"]["bias"],
            bp["mlp_lin2"]["kernel"], bp["mlp_lin2"]["bias"], interp,
        ).reshape(B, H, W, C)
    if XLA_TAIL:
        return _tail_xla(x, out, attn, bp, dtype)
    return proj_ln_mlp_residual(
        x.reshape(B * H * W, C), out.reshape(B * H * W, C),
        attn["proj"]["kernel"], attn["proj"]["bias"],
        bp["norm2"]["scale"], bp["norm2"]["bias"],
        bp["mlp_lin1"]["kernel"], bp["mlp_lin1"]["bias"],
        bp["mlp_lin2"]["kernel"], bp["mlp_lin2"]["bias"], interpret=interp,
    ).reshape(B, H, W, C)


def encoder_forward_fused(params, x, sam_version: str = "vit_b",
                          img_size: int = 512, window_size: int = 14,
                          dtype=jnp.bfloat16, interpret: bool = False,
                          differentiable: bool = False, remat: bool = True):
    """Full encoder forward on the standard param tree with token-tiled
    fused kernels. x: [B, H, W, 3] normalized input; returns
    [B, h, w, 256].

    differentiable=True routes every Pallas op through its custom_vjp
    wrapper (Pallas forward, XLA-recompute backward — ops/fused_ln.py,
    ops/fused_block.py, ops/attention.py) so the fused encoder can serve
    the TRAINING step (config.FUSED_ENCODER_TRAIN, training/harness.py);
    the experiment-only A/B switches (PAD_FREE/XLA_TAIL/WIN_* granularity)
    are ignored on that path. remat wraps each block in jax.checkpoint so
    only block-boundary activations persist to the backward pass (matching
    the flax path's REMAT_ENCODER discipline)."""
    spec = ENCODER_SPECS[sam_version]
    depth = spec["depth"]
    num_heads = spec["num_heads"]
    global_idx = set(spec["global_attn_indexes"])
    on_tpu = jax.default_backend() == "tpu" and not interpret

    # patch embed (16x16 stride-16 conv, NHWC/HWIO)
    kern = params["patch_embed_proj"]["kernel"].astype(dtype)
    x = jax.lax.conv_general_dilated(
        x.astype(dtype), kern, window_strides=(16, 16), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed_proj"]["bias"].astype(dtype)
    x = x + params["pos_embed"].astype(dtype)

    for i in range(depth):
        bp = params[f"blocks_{i}"]
        if i in global_idx:
            def block(x, bp):
                return _global_block_v3(x, bp, num_heads, dtype, on_tpu,
                                        diff=differentiable)
        else:
            def block(x, bp):
                return _windowed_block_v3(x, bp, num_heads, window_size,
                                          dtype, on_tpu, diff=differentiable)
        if differentiable and remat:
            block = jax.checkpoint(block)
        x = block(x, bp)
    return _neck(params, x, dtype)


def _neck(params, x, dtype):
    x = jax.lax.conv_general_dilated(
        x, params["neck_0"]["kernel"].astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = _layer_norm2d(x, params["neck_1"]["weight"], params["neck_1"]["bias"]).astype(dtype)
    x = jax.lax.conv_general_dilated(
        x, params["neck_2"]["kernel"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = _layer_norm2d(x, params["neck_3"]["weight"], params["neck_3"]["bias"]).astype(dtype)
    return x
