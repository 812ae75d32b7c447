"""Model family: SAM ViT encoders, mask decoders, TopoNet, SAMRoad."""

from sam_road_tpu.models.vit import ImageEncoderViT, ENCODER_SPECS, LayerNorm2d
from sam_road_tpu.models.decoder import MapDecoder
from sam_road_tpu.models.toponet import TopoNet
from sam_road_tpu.models.sam_road import SAMRoad, init_params, PIXEL_MEAN, PIXEL_STD

__all__ = [
    "ImageEncoderViT",
    "ENCODER_SPECS",
    "LayerNorm2d",
    "MapDecoder",
    "TopoNet",
    "SAMRoad",
    "init_params",
    "PIXEL_MEAN",
    "PIXEL_STD",
]
