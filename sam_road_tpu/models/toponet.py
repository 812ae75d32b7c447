"""TopoNet: the edge (connectivity) classifier over sampled point features.

Re-implements the reference TopoNet (reference: model.py:61-148): project
256-d point features to 128, build per-pair features
[src_feat, tgt_feat, (tgt - src) offset], run a 3-layer post-norm transformer
encoder *within each local sample group* with key-padding masks, and emit a
logit per pair. The all-invalid groups get their mask flipped to avoid NaN
(reference: model.py:128-130). The ablation switches (no_transformer,
no_tgt_features, no_offset) are preserved (reference: model.py:84-85,109-116).

The transformer layer matches torch.nn.TransformerEncoderLayer semantics
(post-norm, ReLU FFN, eps 1e-5) so released checkpoints convert exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchMultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible self-attention with
    key_padding_mask (True = masked-out key)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        # x: [B, N, C]; key_padding_mask: [B, N] bool, True = ignore key
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, name="in_proj", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q / jnp.sqrt(head_dim).astype(q.dtype), k,
            preferred_element_type=jnp.float32,
        )
        if key_padding_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            attn = jnp.where(key_padding_mask[:, None, None, :], neg, attn)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(self.dim, name="out_proj", dtype=self.dtype)(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer (torch.nn.TransformerEncoderLayer,
    activation=relu, batch_first=True, norm_first=False)."""

    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        sa = TorchMultiheadAttention(
            self.dim, self.num_heads, dtype=self.dtype, name="self_attn"
        )(x, key_padding_mask)
        sa = nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(x + sa)
        h = nn.Dense(self.ffn_dim, name="linear1", dtype=self.dtype)(x)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, name="linear2", dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(x + h)


class TopoNet(nn.Module):
    """Edge scorer (reference: model.py:61-148)."""

    feature_dim: int = 256
    hidden_dim: int = 128
    num_heads: int = 4
    num_attn_layers: int = 3
    dropout: float = 0.1
    version: str = "normal"  # 'normal' | 'no_transformer' | 'no_tgt_features' | 'no_offset'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, point_features, pairs, pairs_valid,
                 deterministic: bool = True):
        """
        Args:
          points: [B, N_points, 2] (x, y) in patch pixels.
          point_features: [B, N_points, D] sampled features.
          pairs: [B, N_samples, N_pairs, 2] indices into points.
          pairs_valid: [B, N_samples, N_pairs] bool.

        Returns:
          (logits, scores): both [B, N_samples, N_pairs, 1].
        """
        pf = nn.Dense(self.hidden_dim, name="feature_proj", dtype=self.dtype)(
            point_features.astype(self.dtype)
        )
        pf = jax.nn.relu(pf)

        B, S, P, _ = pairs.shape
        flat_pairs = pairs.reshape(B, S * P, 2)
        src_idx, tgt_idx = flat_pairs[..., 0], flat_pairs[..., 1]
        src_features = jnp.take_along_axis(pf, src_idx[..., None], axis=1)
        tgt_features = jnp.take_along_axis(pf, tgt_idx[..., None], axis=1)
        pts = points.astype(self.dtype)
        src_points = jnp.take_along_axis(pts, src_idx[..., None], axis=1)
        tgt_points = jnp.take_along_axis(pts, tgt_idx[..., None], axis=1)
        offset = tgt_points - src_points

        # NOTE: in the reference, the 'no_tgt_features' branch is dead code —
        # model.py:111-116 uses `if/if-else`, so the second else overwrites
        # the first branch and 'no_tgt_features' behaves as 'normal'. We
        # preserve that behavior bug-for-bug for checkpoint parity.
        if self.version == "no_offset":
            pair_features = jnp.concatenate(
                [src_features, tgt_features, jnp.zeros_like(offset)], axis=2
            )
        else:
            pair_features = jnp.concatenate([src_features, tgt_features, offset], axis=2)

        pair_features = nn.Dense(self.hidden_dim, name="pair_proj", dtype=self.dtype)(
            pair_features
        )
        pair_features = jax.nn.relu(pair_features)

        # Attention within each local sample group.
        pair_features = pair_features.reshape(B * S, P, self.hidden_dim)
        valid = pairs_valid.reshape(B * S, P)
        # Flip mask for all-invalid groups to prevent NaN (reference:
        # model.py:128-130).
        all_invalid = (valid.sum(axis=-1) == 0)[:, None]
        valid = jnp.logical_or(valid, all_invalid)
        padding_mask = ~valid

        if self.version != "no_transformer":
            for i in range(self.num_attn_layers):
                pair_features = TransformerEncoderLayer(
                    self.hidden_dim,
                    self.num_heads,
                    self.hidden_dim,
                    self.dropout,
                    dtype=self.dtype,
                    name=f"layers_{i}",
                )(pair_features, padding_mask, deterministic=deterministic)

        pair_features = pair_features.reshape(B, S, P, self.hidden_dim)
        logits = nn.Dense(1, name="output_proj", dtype=self.dtype)(pair_features)
        scores = jax.nn.sigmoid(logits.astype(jnp.float32))
        return logits, scores
