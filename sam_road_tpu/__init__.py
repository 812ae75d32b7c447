"""sam_road_tpu: a TPU-native road-network-graph extraction framework.

A from-scratch JAX/XLA/Pallas re-architecture with the capabilities of the
SAM-Road reference (htcr/sam_road, CVPRW 2024): a SAM-ViT keypoint/road mask
model + TopoNet edge scorer, a tiled region-inference engine, the label
generation geometry pipeline, a training harness, and the APLS/TOPO road-graph
metric suite.
"""

from sam_road_tpu.config import Config, load_config, create_output_dir_and_save_config

__version__ = "0.1.0"

__all__ = [
    "Config",
    "load_config",
    "create_output_dir_and_save_config",
    "__version__",
]
