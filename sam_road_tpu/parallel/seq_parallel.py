"""Sequence-parallel (token-sharded) encoder forward over a device mesh.

The SURVEY §2.2 stretch goal the reference has no analog for: the reference
controls sequence length architecturally (512px patches, 14x14 windowed
attention, reference model.py:245-258) and scales regions by tiling. Here we
additionally scale the PATCH: the token grid of one (batch of) big patch is
sharded row-wise across the mesh, so 1024px+ patches (4096+ tokens) and
vit_l/vit_h fit and speed up across chips.

Sharding design (scaling-book style — pick a layout, let collectives ride
ICI):

- The image enters row-banded: device d holds pixel rows
  [d*Hpx/n, (d+1)*Hpx/n). The 16x16 stride-16 patch embed is local to a
  band (VALID conv, stride == kernel), as are LayerNorms and MLPs — tokens
  never talk to each other outside attention.
- Windowed attention blocks: the 14x14 window grid does not align with row
  bands, so the post-LN activations are all-gathered (bf16, ~6 MB at 4096
  tokens — cheap on ICI), each device computes its 1/n slice of the
  windows, and window outputs are all-gathered back. Two all-gathers per
  windowed block.

Memory/comms envelope (what is and is not sharded — N tokens, C channels,
n devices, h heads):

  persistent activations   O(N/n * C)       sharded (row bands)
  global-attn scores       O(N^2/n * h)     sharded — the quadratic term,
                                            and the actual OOM risk at
                                            large N, lives on n chips
  windowed-block gather    O(N * C)         TRANSIENT full-grid replica on
                                            every device, twice per
                                            windowed block (in + out)
  comms per windowed block 2 * N * C * 2B   all-gather x2 over ICI
  comms per global block   2/3 * N * C * 2B gathered-KV (k+v only)

So scale-out in N is real for the quadratic scores and the resident
activations, while windowed blocks trade a transient O(N*C) buffer + two
all-gathers for exact SAM window semantics with zero redundant compute —
at 16k tokens (2048px patch, ViT-B) the transient is ~25 MB bf16 against
multi-GB sharded scores, i.e. windowed gathers are >100x below the memory
high-water mark. A halo-exchange window path would shard the transient
too but computes boundary windows redundantly whenever N/(16n) < 14 rows;
not worth it below ~100k tokens. tests/test_seq_parallel.py pins a
16k-token 8-device geometry end to end.
- Global attention blocks: q stays row-sharded; k (with the folded rel-pos
  position codes) and v are all-gathered, so each device computes the exact
  softmax for its rows against ALL keys — a gathered-KV layout. At SAM
  geometries (<= 16k tokens) gathered-KV beats ring attention: one
  all-gather per block instead of n ppermute steps, and the (N/n, N) score
  block is MXU-shaped. (Ring/blockwise attention only pays when k/v do not
  fit HBM, ~1M+ tokens.)
- The neck (1x1 + 3x3 convs) runs redundantly on the gathered grid — at
  256 channels it is a rounding error, and returning a replicated feature
  map is exactly what the downstream per-patch decoder/TopoNet want.

Numerics match the flax encoder exactly in fp32 (same op order per token;
tests pin both the aligned and the window-padded geometry on an 8-device
CPU mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sam_road_tpu.models.vit import (
    ENCODER_SPECS,
    _get_rel_pos_table,
    fold_rel_pos_qk,
)


_SP_PROGRAM_CACHE: dict = {}


def _layer_norm(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)) * scale + bias


def _layer_norm2d(x, weight, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - mu) / jnp.sqrt(var + eps)) * weight + bias


def _attn_grid(q, k, v, bp_attn, hw, num_heads, dtype, row0=0):
    """Exact SAM attention for row-aligned query shards over a (h, w) grid.

    q: [G, Nq, C] queries = grid rows [row0, row0 + Nq/W); k, v: [G, N, C]
    the full grid. Returns [G, Nq, C] (pre-proj head merge).
    """
    H, W = hw
    G, Nq, C = q.shape
    N = k.shape[1]
    hd = C // num_heads
    scale = hd**-0.5
    nq_rows = Nq // W

    qh = q.reshape(G, nq_rows * W, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(G, N, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(G, N, num_heads, hd).transpose(0, 2, 1, 3)

    Rh = _get_rel_pos_table(H, bp_attn["rel_pos_h"]).astype(dtype)
    Rw = _get_rel_pos_table(W, bp_attn["rel_pos_w"]).astype(dtype)
    # shared fold with vit.py/fast_encoder: absolute query rows via row0
    q_aug, k_aug = fold_rel_pos_qk(qh, kh, Rh, Rw, (H, W), scale, row0=row0)
    scores = jnp.einsum(
        "gnqd,gnkd->gnqk", q_aug, k_aug, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum("gnqk,gnkd->gnqd", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(G, Nq, C)


def _window_attn(xw, bp, num_heads, ws, dtype):
    """Windowed attention on [Gw, ws*ws, C] windows (post-LN input)."""
    qkv = xw @ bp["attn"]["qkv"]["kernel"].astype(dtype)
    qkv = qkv + bp["attn"]["qkv"]["bias"].astype(dtype)
    C = xw.shape[-1]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = _attn_grid(q, k, v, bp["attn"], (ws, ws), num_heads, dtype)
    out = out @ bp["attn"]["proj"]["kernel"].astype(dtype)
    return out + bp["attn"]["proj"]["bias"].astype(dtype)


def _mlp(x, bp, dtype):
    h = _layer_norm(x, bp["norm2"]["scale"], bp["norm2"]["bias"]).astype(dtype)
    mid = h @ bp["mlp_lin1"]["kernel"].astype(dtype) + bp["mlp_lin1"]["bias"].astype(dtype)
    mid = jax.nn.gelu(mid, approximate=False)
    return x + (mid @ bp["mlp_lin2"]["kernel"].astype(dtype)
                + bp["mlp_lin2"]["bias"].astype(dtype))


def make_sp_encoder_body(
    sam_version: str = "vit_b",
    img_size: int = 1024,
    window_size: int = 14,
    dtype=jnp.float32,
    n: int = 1,
    axis: str = "dp",
):
    """Build the shard_map BODY of the token-sharded encoder: a callable
    `body(encoder_params, x_band)` where x_band is this device's pixel-row
    band [B, Hpx/n, W, 3] (normalized image) and the return value is the
    full replicated [B, h, w, 256] feature map. Exposed separately so the
    inference engine can embed the SP encoder inside its own shard_map
    programs (SP_SHARDS engine mode) instead of going through
    encoder_forward_sp's standalone jit."""
    spec = ENCODER_SPECS[sam_version]
    depth = spec["depth"]
    num_heads = spec["num_heads"]
    global_idx = set(spec["global_attn_indexes"])

    grid = img_size // 16
    assert grid % n == 0, (
        f"token grid rows {grid} must divide over {n} devices"
    )
    rows_l = grid // n
    ws = window_size
    pad_h = (ws - grid % ws) % ws
    Hp = grid + pad_h
    n_wrows = Hp // ws
    n_win = n_wrows * n_wrows
    win_pad = (n - n_win % n) % n
    wpd = (n_win + win_pad) // n  # windows per device

    def body(params, x_band):
        # x_band: [B, Hpx/n, W, 3] pixel rows of this device
        d = jax.lax.axis_index(axis)
        kern = params["patch_embed_proj"]["kernel"].astype(dtype)
        h = jax.lax.conv_general_dilated(
            x_band.astype(dtype), kern, (16, 16), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["patch_embed_proj"]["bias"].astype(dtype)
        pos = jax.lax.dynamic_slice_in_dim(
            params["pos_embed"].astype(dtype), d * rows_l, rows_l, axis=1
        )
        h = h + pos  # [B, rows_l, grid, C]
        B, _, W, C = h.shape

        for i in range(depth):
            bp = params[f"blocks_{i}"]
            ln = _layer_norm(
                h, bp["norm1"]["scale"], bp["norm1"]["bias"]
            ).astype(dtype)
            if i in global_idx:
                # gathered-KV global attention: local q rows vs all keys
                qkv = ln.reshape(B, rows_l * W, C) @ bp["attn"]["qkv"][
                    "kernel"
                ].astype(dtype)
                qkv = qkv + bp["attn"]["qkv"]["bias"].astype(dtype)
                q, k, v = jnp.split(qkv, 3, axis=-1)
                k_all = jax.lax.all_gather(k, axis, axis=1, tiled=True)
                v_all = jax.lax.all_gather(v, axis, axis=1, tiled=True)
                out = _attn_grid(
                    q, k_all, v_all, bp["attn"], (grid, grid), num_heads,
                    dtype, row0=d * rows_l,
                )
                out = out @ bp["attn"]["proj"]["kernel"].astype(dtype)
                out = out + bp["attn"]["proj"]["bias"].astype(dtype)
                h = h + out.reshape(B, rows_l, W, C)
            else:
                # windowed attention: gather post-LN grid, compute this
                # device's window slice, gather outputs back
                ln_all = jax.lax.all_gather(ln, axis, axis=1, tiled=True)
                if pad_h:
                    ln_all = jnp.pad(
                        ln_all, ((0, 0), (0, pad_h), (0, pad_h), (0, 0))
                    )
                xw = ln_all.reshape(B, n_wrows, ws, n_wrows, ws, C)
                xw = xw.transpose(1, 3, 0, 2, 4, 5).reshape(n_win, B, ws * ws, C)
                if win_pad:
                    xw = jnp.pad(xw, ((0, win_pad), (0, 0), (0, 0), (0, 0)))
                mine = jax.lax.dynamic_slice_in_dim(xw, d * wpd, wpd, axis=0)
                mine = mine.reshape(wpd * B, ws * ws, C)
                out = _window_attn(mine, bp, num_heads, ws, dtype)
                out = out.reshape(wpd, B, ws * ws, C)
                out_all = jax.lax.all_gather(out, axis, axis=0, tiled=True)
                out_all = out_all[:n_win]
                full = out_all.reshape(n_wrows, n_wrows, B, ws, ws, C)
                full = full.transpose(2, 0, 3, 1, 4, 5).reshape(B, Hp, Hp, C)
                full = full[:, :grid, :grid]
                band = jax.lax.dynamic_slice_in_dim(
                    full, d * rows_l, rows_l, axis=1
                )
                h = h + band
            h = _mlp(h, bp, dtype)

        # neck on the gathered grid (redundant per device, 256-ch — cheap)
        h_all = jax.lax.all_gather(h, axis, axis=1, tiled=True)
        out = jax.lax.conv_general_dilated(
            h_all, params["neck_0"]["kernel"].astype(dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = _layer_norm2d(
            out, params["neck_1"]["weight"], params["neck_1"]["bias"]
        ).astype(dtype)
        out = jax.lax.conv_general_dilated(
            out, params["neck_2"]["kernel"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = _layer_norm2d(
            out, params["neck_3"]["weight"], params["neck_3"]["bias"]
        ).astype(dtype)
        return out

    return body


def encoder_forward_sp(
    params,
    x,
    mesh,
    axis: str = "dp",
    sam_version: str = "vit_b",
    img_size: int = 1024,
    window_size: int = 14,
    dtype=jnp.float32,
):
    """Token-sharded encoder forward. x: [B, H, W, 3] normalized image,
    replicated or row-sharded; returns a replicated [B, h, w, 256] feature
    map identical to ImageEncoderViT's output.

    Requires grid_rows % n_devices == 0 (e.g. 1024px -> 64 rows on 1/2/4/8
    devices). Drives collectives over mesh axis `axis`.
    """
    from jax.sharding import PartitionSpec as P

    n = int(np.prod(mesh.devices.shape))
    body = make_sp_encoder_body(
        sam_version=sam_version, img_size=img_size, window_size=window_size,
        dtype=dtype, n=n, axis=axis,
    )

    # jit caches by callable identity, so memoize the wrapped program per
    # (mesh, geometry) — otherwise every call would re-trace and re-compile
    # the full encoder
    key = (mesh, axis, sam_version, img_size, window_size, jnp.dtype(dtype).name)
    fn = _SP_PROGRAM_CACHE.get(key)
    if fn is None:
        shard_fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(None, axis)),
            out_specs=P(),
            check_vma=False,
        )
        fn = jax.jit(shard_fn)
        _SP_PROGRAM_CACHE[key] = fn
    return fn(params, x)
