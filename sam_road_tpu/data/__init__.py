"""Data pipeline: dataset partitions, patch planning, label generation,
training dataset."""

from sam_road_tpu.data.partitions import (
    cityscale_data_partition,
    spacenet_data_partition,
    get_patch_info_one_img,
)

__all__ = [
    "cityscale_data_partition",
    "spacenet_data_partition",
    "get_patch_info_one_img",
]
