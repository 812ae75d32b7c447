"""Bilinear point sampling from dense feature maps.

TPU-native replacement for the reference's F.grid_sample bilinear read
(reference: model.py:29-58, BilinearSampler): a gather + lerp on NHWC feature
maps, matching torch grid_sample(mode='bilinear', align_corners=False,
padding_mode='zeros') semantics exactly. Implemented with one-hot matmuls per
axis would burn MXU cycles for nothing; dynamic gathers on the flattened map
lower to efficient XLA dynamic-slices and fuse with the surrounding ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_points(feature_maps, sample_points, patch_size):
    """Sample feature vectors at continuous (x, y) pixel locations.

    Args:
      feature_maps: [B, H, W, D] dense features (any float dtype).
      sample_points: [B, N, 2] (x, y) in input-image pixel coordinates,
        range [0, patch_size] (reference normalizes by config.PATCH_SIZE,
        model.py:47).
      patch_size: the input-image side length in pixels.

    Returns:
      [B, N, D] sampled features (zeros outside the map, matching
      grid_sample's zero padding).
    """
    B, H, W, D = feature_maps.shape
    pts = sample_points.astype(jnp.float32)
    # align_corners=False: norm in [-1, 1] maps to pixel centers via
    # pix = ((norm + 1) * size - 1) / 2; with norm = 2 * pt / patch - 1 this
    # collapses to pix = pt / patch * size - 0.5.
    px = pts[..., 0] / patch_size * W - 0.5
    py = pts[..., 1] / patch_size * H - 0.5

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        # Zero padding: out-of-range taps contribute 0.
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        flat = feature_maps.reshape(B, H * W, D)
        idx = yc * W + xc  # [B, N]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None].astype(feature_maps.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    wx = wx[..., None].astype(feature_maps.dtype)
    wy = wy[..., None].astype(feature_maps.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
