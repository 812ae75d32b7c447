"""Tiled region-inference engine."""

from sam_road_tpu.inference.engine import TiledInferenceEngine, infer_one_img

__all__ = ["TiledInferenceEngine", "infer_one_img"]
