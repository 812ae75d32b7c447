"""SAMRoad: the flagship model — SAM ViT encoder + mask decoder + TopoNet.

Functional re-architecture of the reference LightningModule (reference:
model.py:190-686). The torch version mixes module graph, losses, metrics and
optimizer config into one class; here the model is a pure flax Module with
three jittable entry points that mirror the reference API:

  __call__(rgb, graph_points, pairs, valid)        (reference: model.py:414)
  infer_masks_and_features(rgb)                    (reference: model.py:459)
  infer_toponet(features, points, pairs, valid)    (reference: model.py:498)

Losses/metrics live in ops/, the optimizer in training/ — so the same model
composes into the train step, the tiled inference engine, and tests without
dragging harness state around.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from sam_road_tpu.models.vit import ENCODER_SPECS, ImageEncoderViT
from sam_road_tpu.models.decoder import MapDecoder
from sam_road_tpu.models.toponet import TopoNet
from sam_road_tpu.ops.sampling import bilinear_sample_points

# ImageNet pixel stats (reference: model.py:229-230)
PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static, hashable model configuration (jit-friendly; flax leaves
    frozen dataclass fields alone, unlike raw dicts)."""

    sam_version: str = "vit_b"
    patch_size: int = 512
    use_sam_decoder: bool = False
    toponet_version: str = "normal"
    lora_rank: int = 0  # 0 = no LoRA
    remat: bool = False
    compute_dtype: str = "bfloat16"
    flash_attention: bool = True  # False routes attention through plain XLA

    @classmethod
    def from_config(cls, cfg) -> "ModelSpec":
        return cls(
            sam_version=str(cfg.SAM_VERSION),
            patch_size=int(cfg.PATCH_SIZE),
            use_sam_decoder=bool(cfg.USE_SAM_DECODER),
            toponet_version=str(cfg.TOPONET_VERSION or "normal"),
            lora_rank=int(cfg.LORA_RANK) if cfg.ENCODER_LORA else 0,
            remat=bool(cfg.REMAT_ENCODER),
            compute_dtype=str(cfg.COMPUTE_DTYPE or "float32"),
            flash_attention=bool(cfg.FLASH_ATTENTION),
        )

    @property
    def dtype(self) -> jnp.dtype:
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.compute_dtype]


class SAMRoad(nn.Module):
    """Keypoint/road mask prediction + local topology scoring.

    NO_SAM ablation note: the reference's no-SA-1B variant depends on
    detectron2 and raises NotImplementedError in its release (reference:
    model.py:232-242, vitdet.py). Here NO_SAM simply skips the SAM checkpoint
    load — the same ViTDet-style encoder trains from random init (a working
    superset of the reference's disabled path).
    """

    spec: ModelSpec

    def setup(self):
        spec = self.spec
        assert spec.sam_version in ENCODER_SPECS, spec.sam_version
        enc = ENCODER_SPECS[spec.sam_version]
        dtype = spec.dtype
        self.image_encoder = ImageEncoderViT(
            img_size=spec.patch_size,
            embed_dim=enc["embed_dim"],
            depth=enc["depth"],
            num_heads=enc["num_heads"],
            global_attn_indexes=enc["global_attn_indexes"],
            lora_rank=spec.lora_rank,
            remat=spec.remat,
            use_flash=spec.flash_attention,
            dtype=dtype,
            name="image_encoder",
        )
        if spec.use_sam_decoder:
            from sam_road_tpu.models.sam_decoder import SamMaskDecoderHead

            self.sam_decoder_head = SamMaskDecoderHead(
                image_size=spec.patch_size, dtype=dtype, name="sam_decoder"
            )
        else:
            self.map_decoder = MapDecoder(dtype=dtype, name="map_decoder")
        self.topo_net = TopoNet(
            feature_dim=256,
            version=spec.toponet_version,
            dtype=dtype,
            name="topo_net",
        )

    def _normalize(self, rgb):
        mean = jnp.asarray(PIXEL_MEAN, dtype=jnp.float32)
        std = jnp.asarray(PIXEL_STD, dtype=jnp.float32)
        return ((rgb.astype(jnp.float32) - mean) / std).astype(self.spec.dtype)

    def _decode_masks(self, image_embeddings):
        if self.spec.use_sam_decoder:
            return self.sam_decoder_head(image_embeddings)
        return self.map_decoder(image_embeddings)

    def __call__(self, rgb, graph_points, pairs, valid, deterministic: bool = True):
        """Training forward (reference: model.py:414-457).

        Args:
          rgb: [B, H, W, 3] uint8-range floats.
          graph_points: [B, N_points, 2] (x, y) patch pixels.
          pairs: [B, N_samples, N_pairs, 2] indices into graph_points.
          valid: [B, N_samples, N_pairs] bool.

        Returns:
          mask_logits [B, H, W, 2], mask_scores [B, H, W, 2],
          topo_logits [B, S, P, 1], topo_scores [B, S, P, 1].
        """
        x = self._normalize(rgb)
        image_embeddings = self.image_encoder(x)
        mask_logits = self._decode_masks(image_embeddings)
        mask_scores = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
        point_features = bilinear_sample_points(
            image_embeddings, graph_points, self.spec.patch_size
        )
        topo_logits, topo_scores = self.topo_net(
            graph_points, point_features, pairs, valid, deterministic=deterministic
        )
        return (
            mask_logits.astype(jnp.float32),
            mask_scores,
            topo_logits.astype(jnp.float32),
            topo_scores,
        )

    def infer_masks_and_features(self, rgb):
        """Phase-1 inference: masks + cached feature maps
        (reference: model.py:459-495)."""
        x = self._normalize(rgb)
        image_embeddings = self.image_encoder(x)
        mask_logits = self._decode_masks(image_embeddings)
        mask_scores = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
        return mask_scores, image_embeddings

    def infer_toponet(self, image_embeddings, graph_points, pairs, valid):
        """Phase-2 inference: score candidate edges from cached features
        (reference: model.py:498-508)."""
        point_features = bilinear_sample_points(
            image_embeddings, graph_points, self.spec.patch_size
        )
        _, topo_scores = self.topo_net(
            graph_points, point_features, pairs, valid, deterministic=True
        )
        return topo_scores


def build_model(config) -> SAMRoad:
    """SAMRoad from a framework Config."""
    return SAMRoad(ModelSpec.from_config(config))


def init_params(config, rng=None):
    """Initialize a parameter pytree with tiny dummy inputs driven by config."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    model = build_model(config)
    patch = int(config.PATCH_SIZE)
    p = int(config.MAX_NEIGHBOR_QUERIES)
    rgb = jnp.zeros((1, patch, patch, 3), jnp.float32)
    pts = jnp.zeros((1, 8, 2), jnp.float32)
    pairs = jnp.zeros((1, 2, p, 2), jnp.int32)
    valid = jnp.zeros((1, 2, p), bool)
    return model.init({"params": rng}, rgb, pts, pairs, valid)["params"]
