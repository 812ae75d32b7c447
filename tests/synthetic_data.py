"""Synthetic spacenet-format dataset fixtures for tests and CLI drives."""

import json
import os
import pickle

import numpy as np


def make_grid_graph_rc(image_size: int, spacing: int, rng=None):
    """Street-grid adjacency dict in the spacenet GT frame, where the image
    (x, y) of a key (a, b) is (b, image_size - a)."""
    adj = {}

    def key_for_xy(x, y):
        # invert (x, y) = (b, size - a) -> (a, b) = (size - y, x)
        return (image_size - y, x)

    def add(xy1, xy2):
        k1, k2 = key_for_xy(*xy1), key_for_xy(*xy2)
        adj.setdefault(k1, []).append(k2)
        adj.setdefault(k2, []).append(k1)

    lo, hi = spacing, image_size - spacing
    for x in range(lo, hi + 1, spacing):
        for y in range(lo, hi + 1, spacing):
            if x + spacing <= hi:
                add((x, y), (x + spacing, y))
            if y + spacing <= hi:
                add((x, y), (x, y + spacing))
    return adj


def make_spacenet_fixture(root: str, image_size: int = 400, n_train: int = 2,
                          n_val: int = 1, n_test: int = 1, spacing: int = 50):
    """Create a tiny spacenet-format dataset: tiles + GT graphs + split json +
    label masks. Returns the split dict."""
    import cv2

    rgb_dir = os.path.join(root, "spacenet", "RGB_1.0_meter")
    os.makedirs(rgb_dir, exist_ok=True)
    names = [f"SYN_{i}" for i in range(n_train + n_val + n_test)]
    split = {
        "train": names[:n_train],
        "validation": names[n_train : n_train + n_val],
        "test": names[n_train + n_val :],
    }
    with open(os.path.join(root, "spacenet", "data_split.json"), "w") as f:
        json.dump(split, f)

    rng = np.random.default_rng(0)
    for name in names:
        adj = make_grid_graph_rc(image_size, spacing)
        with open(os.path.join(rgb_dir, f"{name}__gt_graph.p"), "wb") as f:
            pickle.dump(adj, f)
        # Imagery correlated with the graph: noisy terrain with dark
        # road strokes at the GT edges, so mask prediction is learnable.
        img = rng.integers(80, 200, (image_size, image_size, 3), dtype=np.uint8)
        def to_xy(key):
            return (int(key[1]), image_size - int(key[0]))
        for a, neis in adj.items():
            for b in neis:
                cv2.line(img, to_xy(a), to_xy(b), (40, 40, 45), 5)
        noise = rng.integers(-15, 15, img.shape, dtype=np.int16)
        img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(rgb_dir, f"{name}__rgb.png"), img[:, :, ::-1])

    from sam_road_tpu.data.label_gen import generate_spacenet_labels

    # patch IMAGE_SIZE for the generator (it rasterizes at 400 by default)
    if image_size == 400:
        generate_spacenet_labels(os.path.join(root, "spacenet"))
    else:
        from sam_road_tpu.data.label_gen import rasterize_tile_masks

        out = os.path.join(root, "spacenet", "processed")
        os.makedirs(out, exist_ok=True)
        for name in names:
            adj = pickle.load(open(os.path.join(rgb_dir, f"{name}__gt_graph.p"), "rb"))
            kp, road = rasterize_tile_masks(
                adj, image_size, lambda n: (int(n[1]), image_size - int(n[0]))
            )
            cv2.imwrite(os.path.join(out, f"keypoint_mask_{name}.png"), kp)
            cv2.imwrite(os.path.join(out, f"road_mask_{name}.png"), road)
    return split
