"""Dataset partitions and the overlapping patch-grid planner
(reference: dataset.py:21-67)."""

from __future__ import annotations

import json

import numpy as np


def cityscale_data_partition():
    """Index-mod split over 180 tiles (reference: dataset.py:21-39)."""
    indrange_train, indrange_test, indrange_validation = [], [], []
    for x in range(180):
        if x % 10 < 8:
            indrange_train.append(x)
        if x % 10 == 9:
            indrange_test.append(x)
        if x % 20 == 18:
            indrange_validation.append(x)
        if x % 20 == 8:
            indrange_test.append(x)
    return indrange_train, indrange_validation, indrange_test


def spacenet_data_partition(split_json_path: str = "./spacenet/data_split.json"):
    """Named split lists (reference: dataset.py:42-53)."""
    with open(split_json_path) as jf:
        data_list = json.load(jf)
    return data_list["train"], data_list["validation"], data_list["test"]


def get_patch_info_one_img(
    image_index, image_size, sample_margin, patch_size, patches_per_edge
):
    """Evenly-spaced overlapping patch grid for one tile
    (reference: dataset.py:56-67). Returns a list of
    (image_index, (x0, y0), (x1, y1))."""
    patch_info = []
    sample_min = sample_margin
    sample_max = image_size - (patch_size + sample_margin)
    eval_samples = np.linspace(start=sample_min, stop=sample_max, num=patches_per_edge)
    eval_samples = [round(x) for x in eval_samples]
    for x in eval_samples:
        for y in eval_samples:
            patch_info.append((image_index, (x, y), (x + patch_size, y + patch_size)))
    return patch_info
