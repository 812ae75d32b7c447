"""SAM mask-decoder head (USE_SAM_DECODER path).

Implements the modules the reference pulls from the SAM submodule for its
optional decoder branch (reference: model.py:260-282, 426-443): a null-prompt
PromptEncoder (dense no-mask embedding + random-Fourier positional encoding),
a TwoWayTransformer(depth=2, dim=256, mlp 2048, heads 8, downsample 2), and
the MaskDecoder with num_multimask_outputs=2 (keypoint, road), hypernetwork
mask heads, and 4x upscaling; output bilinearly resized to the input image.

Parameter names mirror the torch checkpoint keys for conversion.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sam_road_tpu.models.vit import LayerNorm2d
from sam_road_tpu.models.decoder import ConvTranspose2x2


class SamAttention(nn.Module):
    """SAM's attention with optional internal downsampling
    (q/k/v/out projections, separate heads)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        internal_dim = self.embedding_dim // self.downsample_rate
        head_dim = internal_dim // self.num_heads
        q = nn.Dense(internal_dim, name="q_proj", dtype=self.dtype)(q)
        k = nn.Dense(internal_dim, name="k_proj", dtype=self.dtype)(k)
        v = nn.Dense(internal_dim, name="v_proj", dtype=self.dtype)(v)

        def heads(t):
            B, N, C = t.shape
            return t.reshape(B, N, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32
        ) / math.sqrt(head_dim)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        B, _, N, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, N, internal_dim)
        return nn.Dense(self.embedding_dim, name="out_proj", dtype=self.dtype)(out)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = SamAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = SamAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(q, q, queries)
            queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = SamAttention(
            self.embedding_dim, self.num_heads, downsample_rate=2,
            dtype=self.dtype, name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(queries)

        h = nn.Dense(self.mlp_dim, name="mlp_lin1", dtype=self.dtype)(queries)
        h = jax.nn.relu(h)
        h = nn.Dense(self.embedding_dim, name="mlp_lin2", dtype=self.dtype)(h)
        queries = queries + h
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3", dtype=self.dtype)(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = SamAttention(
            self.embedding_dim, self.num_heads, downsample_rate=2,
            dtype=self.dtype, name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = keys + attn_out
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4", dtype=self.dtype)(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        # image_embedding/image_pe: [B, h, w, C]; point_embedding: [B, N, C]
        B, h, w, C = image_embedding.shape
        image_embedding = image_embedding.reshape(B, h * w, C)
        image_pe = image_pe.reshape(B, h * w, C)

        queries = point_embedding
        keys = image_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype,
                name=f"layers_{i}",
            )(queries, keys, point_embedding, image_pe)

        q = queries + point_embedding
        k = keys + image_pe
        attn_out = SamAttention(
            self.embedding_dim, self.num_heads, downsample_rate=2,
            dtype=self.dtype, name="final_attn_token_to_image",
        )(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(
            epsilon=1e-5, name="norm_final_attn", dtype=self.dtype
        )(queries)
        return queries, keys


class SamMLP(nn.Module):
    """SAM's MLP block (layers.{i} Linear stack, ReLU between)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}", dtype=self.dtype)(x)
            if i < self.num_layers - 1:
                x = jax.nn.relu(x)
        return x


class SamMaskDecoderHead(nn.Module):
    """Null-prompt PromptEncoder + MaskDecoder composition
    (reference: model.py:260-282, 426-443).

    __call__ takes NHWC image embeddings, returns [B, image_size, image_size,
    2] mask logits (keypoint, road) — the multimask outputs 1: of the SAM
    decoder, bilinearly upsampled.
    """

    image_size: int
    embed_dim: int = 256
    num_multimask_outputs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings):
        B, h, w, C = image_embeddings.shape
        num_mask_tokens = self.num_multimask_outputs + 1

        # --- null PromptEncoder ---
        gaussian = self.param(
            "pe_gaussian_matrix",
            nn.initializers.normal(1.0),
            (2, self.embed_dim // 2),
        )
        no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        # dense positional encoding over the (h, w) grid
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        grid = np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1)  # (h,w,2)
        coords = 2 * jnp.asarray(grid) - 1
        proj = coords @ gaussian.astype(jnp.float32) * (2 * np.pi)
        image_pe = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        image_pe = jnp.broadcast_to(
            image_pe[None], (B, h, w, self.embed_dim)
        ).astype(self.dtype)

        dense = no_mask_embed.astype(self.dtype)[None, None, None, :]
        src = image_embeddings.astype(self.dtype) + dense

        # --- MaskDecoder.predict_masks ---
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0),
            (num_mask_tokens, self.embed_dim),
        )
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.broadcast_to(
            output_tokens[None], (B,) + output_tokens.shape
        ).astype(self.dtype)

        hs, keys = TwoWayTransformer(dtype=self.dtype, name="transformer")(
            src, image_pe, tokens
        )
        mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens, :]

        upscaled = keys.reshape(B, h, w, self.embed_dim)
        upscaled = ConvTranspose2x2(self.embed_dim // 4, dtype=self.dtype,
                                    name="upscale_0")(upscaled)
        upscaled = LayerNorm2d(self.embed_dim // 4, name="upscale_1")(upscaled)
        upscaled = jax.nn.gelu(upscaled, approximate=False)
        upscaled = ConvTranspose2x2(self.embed_dim // 8, dtype=self.dtype,
                                    name="upscale_3")(upscaled)
        upscaled = jax.nn.gelu(upscaled, approximate=False)

        hyper_in = jnp.stack(
            [
                SamMLP(self.embed_dim, self.embed_dim // 8, 3,
                       dtype=self.dtype, name=f"hyper_mlps_{i}")(
                    mask_tokens_out[:, i, :]
                )
                for i in range(num_mask_tokens)
            ],
            axis=1,
        )  # [B, num_mask_tokens, 32]
        B_, H4, W4, C8 = upscaled.shape
        masks = jnp.einsum(
            "bnc,bhwc->bnhw", hyper_in, upscaled,
            preferred_element_type=jnp.float32,
        )
        # iou head exists for checkpoint parity (unused by SAMRoad losses)
        _ = SamMLP(256, num_mask_tokens, 3, dtype=self.dtype,
                   name="iou_prediction_head")(hs[:, 0, :])

        # multimask outputs 1: -> (keypoint, road); upsample to image size
        masks = masks[:, 1:, :, :].transpose(0, 2, 3, 1)  # [B, 4h, 4w, 2]
        masks = jax.image.resize(
            masks.astype(jnp.float32),
            (B, self.image_size, self.image_size, masks.shape[-1]),
            method="bilinear",
        )
        return masks


def convert_sam_decoder_key(key: str, value: np.ndarray):
    """torch prompt_encoder./mask_decoder. keys -> flax sam_decoder paths."""
    import re

    base = ("sam_decoder",)
    if key == "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix":
        return base + ("pe_gaussian_matrix",), value
    if key == "prompt_encoder.no_mask_embed.weight":
        return base + ("no_mask_embed",), value.reshape(-1)
    if key == "mask_decoder.iou_token.weight":
        return base + ("iou_token",), value
    if key == "mask_decoder.mask_tokens.weight":
        return base + ("mask_tokens",), value

    m = re.match(r"mask_decoder\.transformer\.(.*)", key)
    if m:
        rest = m.group(1)
        rest = rest.replace("layers.", "layers_")
        rest = rest.replace("mlp.lin1", "mlp_lin1").replace("mlp.lin2", "mlp_lin2")
        parts = rest.split(".")
        wb = parts[-1]
        path = base + ("transformer",) + tuple(parts[:-1])
        if wb == "weight":
            if parts[-2].startswith(("norm", "norm_final_attn")):
                return path + ("scale",), value
            return path + ("kernel",), value.T
        return path + ("bias",), value

    m = re.match(r"mask_decoder\.output_upscaling\.(\d)\.(weight|bias)", key)
    if m:
        slot, wb = m.group(1), m.group(2)
        name = {"0": "upscale_0", "1": "upscale_1", "3": "upscale_3"}.get(slot)
        if name is None:
            return None
        if name == "upscale_1":  # LayerNorm2d
            return base + (name, wb), value
        if wb == "weight":
            return base + (name, "kernel"), value.transpose(2, 3, 0, 1)
        return base + (name, "bias"), value

    m = re.match(
        r"mask_decoder\.output_hypernetworks_mlps\.(\d+)\.layers\.(\d+)\.(weight|bias)",
        key,
    )
    if m:
        i, j, wb = m.group(1), m.group(2), m.group(3)
        path = base + (f"hyper_mlps_{i}", f"layers_{j}")
        return path + (("kernel",) if wb == "weight" else ("bias",)), (
            value.T if wb == "weight" else value
        )

    m = re.match(r"mask_decoder\.iou_prediction_head\.layers\.(\d+)\.(weight|bias)", key)
    if m:
        j, wb = m.group(1), m.group(2)
        path = base + ("iou_prediction_head", f"layers_{j}")
        return path + (("kernel",) if wb == "weight" else ("bias",)), (
            value.T if wb == "weight" else value
        )
    return None
