"""Offline label-mask generation (reference: cityscale/generate_labels.py:75-102,
spacenet/generate_labels.py:76-108).

For each tile's GT sat2graph pickle: rasterize degree!=2 nodes as radius-3
discs (keypoint mask) and edges as width-3 lines (road mask), saved as PNGs
under <root>/processed/.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np

KEYPOINT_RADIUS = 3
ROAD_WIDTH = 3


def _build_xy_graph(gt_graph: dict, transform):
    """sat2graph dict -> dedup'd undirected edge set over transformed
    (x, y) int nodes."""
    edges = set()
    nodes = {}
    deg = {}
    for n, neis in gt_graph.items():
        a = transform(n)
        for nei in neis:
            b = transform(nei)
            if a == b:
                continue
            key = (min(a, b), max(a, b))
            if key in edges:
                continue
            edges.add(key)
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
            nodes[a] = True
            nodes[b] = True
    return deg, edges


def rasterize_tile_masks(gt_graph: dict, image_size: int, transform):
    """Returns (keypoint_mask, road_mask) uint8 arrays."""
    import cv2

    deg, edges = _build_xy_graph(gt_graph, transform)
    keypoint_mask = np.zeros((image_size, image_size), dtype=np.uint8)
    road_mask = np.zeros((image_size, image_size), dtype=np.uint8)
    for node, d in deg.items():
        if d != 2:
            cv2.circle(keypoint_mask, node, KEYPOINT_RADIUS, 255, -1)
    for (a, b) in edges:
        cv2.line(road_mask, a, b, 255, ROAD_WIDTH)
    return keypoint_mask, road_mask


def generate_cityscale_labels(root: str = "./cityscale"):
    """(r, c) keys -> (x, y) = (c, r); 2048px tiles
    (reference: cityscale/generate_labels.py:85-102)."""
    import cv2

    out = os.path.join(root, "processed")
    os.makedirs(out, exist_ok=True)
    for tile_index in range(180):
        path = os.path.join(root, "20cities", f"region_{tile_index}_refine_gt_graph.p")
        if not os.path.exists(path):
            continue
        gt_graph = pickle.load(open(path, "rb"))
        kp, road = rasterize_tile_masks(
            gt_graph, 2048, lambda n: (int(n[1]), int(n[0]))
        )
        cv2.imwrite(os.path.join(out, f"keypoint_mask_{tile_index}.png"), kp)
        cv2.imwrite(os.path.join(out, f"road_mask_{tile_index}.png"), road)


def generate_spacenet_labels(root: str = "./spacenet"):
    """(r, c)-ish keys -> (x, y) = (c, 400 - r); 400px tiles
    (reference: spacenet/generate_labels.py:76-108)."""
    import cv2

    out = os.path.join(root, "processed")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(root, "data_split.json")) as jf:
        data_list = json.load(jf)
    tiles = data_list["test"] + data_list["validation"] + data_list["train"]
    for tile_index in tiles:
        path = os.path.join(root, "RGB_1.0_meter", f"{tile_index}__gt_graph.p")
        if not os.path.exists(path):
            continue
        gt_graph = pickle.load(open(path, "rb"))
        kp, road = rasterize_tile_masks(
            gt_graph, 400, lambda n: (int(n[1]), 400 - int(n[0]))
        )
        cv2.imwrite(os.path.join(out, f"keypoint_mask_{tile_index}.png"), kp)
        cv2.imwrite(os.path.join(out, f"road_mask_{tile_index}.png"), road)
