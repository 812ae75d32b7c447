"""Graph visualization/rasterization utilities (reference: triage.py:8-71)."""

from __future__ import annotations

import numpy as np


def visualize_image_and_graph(img, nodes, edges, viz_img_size=512):
    """Overlay a road graph on an image (reference: triage.py:8-35).

    nodes are normalized (r, c) in [0, 1]; returns a BGR image.
    """
    import cv2

    nodes = np.asarray(nodes)[:, ::-1]  # (r, c) -> (x, y)
    img = cv2.resize(img, (viz_img_size, viz_img_size))
    img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    for edge in edges:
        start_node = nodes[edge[0]] * viz_img_size
        end_node = nodes[edge[1]] * viz_img_size
        cv2.line(
            img,
            (int(start_node[0]), int(start_node[1])),
            (int(end_node[0]), int(end_node[1])),
            (15, 160, 253),
            4,
        )
    for node in nodes:
        x, y = node * viz_img_size
        cv2.circle(img, (int(x), int(y)), 4, (0, 255, 255), -1)
    return img


def rasterize_graph(nodes, edges, viz_img_size, dilation_radius):
    """Rasterize a graph to a white-on-black image (reference:
    triage.py:38-71). nodes are normalized (r, c) in [0, 1]."""
    import cv2

    nodes = np.asarray(nodes)[:, ::-1]
    img = np.zeros((viz_img_size, viz_img_size, 3), dtype=np.uint8)
    for node in nodes:
        x, y = node * viz_img_size
        cv2.rectangle(
            img,
            (int(x) - dilation_radius, int(y) - dilation_radius),
            (int(x) + dilation_radius, int(y) + dilation_radius),
            (255, 255, 255),
            -1,
        )
    for edge in edges:
        start_node = nodes[edge[0]] * viz_img_size
        end_node = nodes[edge[1]] * viz_img_size
        cv2.line(
            img,
            (int(start_node[0]), int(start_node[1])),
            (int(end_node[0]), int(end_node[1])),
            (255, 255, 255),
            dilation_radius * 2,
        )
    return img


def visualize_pred_gt_pair(result):
    """Side-by-side pred/GT render for triage (reference: triage.py:74-81)."""
    import cv2

    img = cv2.imread(result["img_path"])
    pred_img = visualize_image_and_graph(
        img, result["pred_nodes"], result["pred_edges"]
    )
    gt_img = visualize_image_and_graph(img, result["gt_nodes"], result["gt_edges"])
    return np.concatenate((pred_img, gt_img), axis=1)
