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


def render_val_mask_panel(rgb, gt_keypoint, gt_road, pred_keypoint, pred_road):
    """One validation sample as [rgb | GT masks | predicted masks]
    (reference logs rgb/gt/pred image tables per val epoch,
    model.py:571-581). Masks render keypoint in red over road in green.

    Args:
      rgb: [H, W, 3] float 0-255. masks: [H, W] float 0-1.
    Returns an RGB uint8 panel [H, 3W + 16, 3].
    """
    h, w = gt_road.shape

    def mask_img(kp, road):
        img = np.zeros((h, w, 3), np.float32)
        img[..., 1] = np.clip(road, 0, 1) * 255.0
        img[..., 0] = np.clip(kp, 0, 1) * 255.0
        return img

    sep = np.full((h, 8, 3), 255.0, np.float32)
    panel = np.concatenate(
        [np.clip(rgb, 0, 255), sep, mask_img(gt_keypoint, gt_road), sep,
         mask_img(pred_keypoint, pred_road)],
        axis=1,
    )
    return panel.astype(np.uint8)


def save_val_visualizations(out_dir, epoch, batch, mask_scores, count=4):
    """Write up to `count` pred-vs-GT panels for a validation batch."""
    import os

    import cv2

    os.makedirs(out_dir, exist_ok=True)
    scores = np.asarray(mask_scores, np.float32)
    n = min(int(count), scores.shape[0])
    paths = []
    for i in range(n):
        def _mask01(x):
            if np.asarray(x).dtype == np.uint8:  # collate's compact encoding
                return np.asarray(x, np.float32) / 255.0
            return np.asarray(x, np.float32)

        panel = render_val_mask_panel(
            np.asarray(batch["rgb"][i], np.float32),
            _mask01(batch["keypoint_mask"][i]),
            _mask01(batch["road_mask"][i]),
            scores[i, ..., 0],
            scores[i, ..., 1],
        )
        path = os.path.join(out_dir, f"val_epoch{epoch}_sample{i}.png")
        cv2.imwrite(path, cv2.cvtColor(panel, cv2.COLOR_RGB2BGR))
        paths.append(path)
    return paths


def visualize_pred_gt_pair(result):
    """Side-by-side pred/GT render for triage (reference: triage.py:74-81)."""
    import cv2

    img = cv2.imread(result["img_path"])
    pred_img = visualize_image_and_graph(
        img, result["pred_nodes"], result["pred_edges"]
    )
    gt_img = visualize_image_and_graph(img, result["gt_nodes"], result["gt_edges"])
    return np.concatenate((pred_img, gt_img), axis=1)
