"""Mask decoders.

The naive map decoder (reference: model.py:284-295) upsamples the 256-channel
stride-16 feature map back to full resolution through four stride-2 transposed
convolutions (256->128->64->32->2 channels; LayerNorm2d after the first, GELU
between). On TPU a k=2/s=2 transposed conv is exactly a dense projection to
4x the channels followed by a pixel-shuffle reshape — one MXU matmul per
stage with zero overlap logic, instead of a scatter-style conv_transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sam_road_tpu.models.vit import LayerNorm2d


class ConvTranspose2x2(nn.Module):
    """Transposed conv, kernel 2 stride 2, as dense + pixel shuffle.

    Parameter layout is (kh, kw, in, out) so torch's (in, out, kh, kw)
    converts by transpose(2, 3, 0, 1). Output[2i+di, 2j+dj] =
    x[i, j] @ W[di, dj] + b — identical to torch ConvTranspose2d for the
    non-overlapping k=s=2 case.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, C, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # (di, dj, C, F) -> (C, di*dj*F) so the upsample is one matmul.
        w = kernel.astype(self.dtype).transpose(2, 0, 1, 3).reshape(C, 4 * self.features)
        y = x.astype(self.dtype).reshape(B * H * W, C) @ w
        y = y.reshape(B, H, W, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, self.features)
        return y + bias.astype(self.dtype)


class MapDecoder(nn.Module):
    """Naive decoder: 4x ConvTranspose2x2 with LayerNorm2d + GELU
    (reference: model.py:284-295). Output channels: (keypoint, road)."""

    out_channels: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, h, w, 256] -> [B, 16h, 16w, 2] logits
        x = ConvTranspose2x2(128, dtype=self.dtype, name="up_0")(x)
        x = LayerNorm2d(128, name="ln_1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = ConvTranspose2x2(64, dtype=self.dtype, name="up_2")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = ConvTranspose2x2(32, dtype=self.dtype, name="up_3")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = ConvTranspose2x2(self.out_channels, dtype=self.dtype, name="up_4")(x)
        return x
