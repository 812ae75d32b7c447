"""Aux subsystem tests: logging, profiling, SVG rendering, viz,
spacenet prediction cropper, extraction (A* + points)."""

import json
import os

import numpy as np

from sam_road_tpu.utils.logging import MetricsLogger
from sam_road_tpu.utils.profiling import PhaseTimers, maybe_trace
from sam_road_tpu.utils.viz import rasterize_graph, visualize_image_and_graph
from sam_road_tpu.metrics.svg import render_marbles_and_holes, render_region
from sam_road_tpu.metrics.spacenet_convert import crop_prediction
from sam_road_tpu.graph.extraction import (
    astar_path_length,
    extract_graph_points,
    extract_graph_astar,
)
from sam_road_tpu.config import load_config


def test_sigmoid_focal_loss_matches_torch_oracle():
    """ops.sigmoid_focal_loss vs torch BCE-with-logits composed per the
    torchvision.ops.sigmoid_focal_loss formula (reference: model.py:351).
    torchvision itself is not installed; torch's BCEWithLogitsLoss is the
    upstream primitive it composes."""
    import torch

    from sam_road_tpu.ops.losses import bce_with_logits, sigmoid_focal_loss

    rng = np.random.default_rng(7)
    x = rng.normal(0, 3, (4, 33)).astype(np.float32)
    t = (rng.random((4, 33)) > 0.5).astype(np.float32)

    tx, tt = torch.from_numpy(x), torch.from_numpy(t)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        tx, tt, reduction="none")
    p = torch.sigmoid(tx)
    p_t = p * tt + (1 - p) * (1 - tt)
    want = ce * (1 - p_t) ** 2.0
    alpha = 0.25
    want = (alpha * tt + (1 - alpha) * (1 - tt)) * want

    got = np.asarray(sigmoid_focal_loss(x, t, reduction="none"))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)
    got_mean = float(sigmoid_focal_loss(x, t))
    np.testing.assert_allclose(got_mean, float(want.mean()), rtol=1e-5)
    # BCE primitive itself
    np.testing.assert_allclose(
        np.asarray(bce_with_logits(x, t, reduction="none")),
        ce.numpy(), rtol=1e-5, atol=1e-6)


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path))
    logger.log({"loss": 1.5}, step=1)
    logger.log({"loss": 1.0}, step=2)
    lines = open(tmp_path / "metrics.jsonl").read().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[1])["loss"] == 1.0


def test_phase_timers():
    t = PhaseTimers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    with maybe_trace(None):
        pass  # no-op path


def test_svg_render(tmp_path):
    region = (0.0, 0.0, 1.0, 1.0)
    pts = [(0.5, 0.5), (0.2, 0.8)]
    edges = [(0.1, 0.1, 0.9, 0.9)]
    f1 = tmp_path / "region.svg"
    render_region(pts, edges, region, str(f1))
    assert "<svg" in f1.read_text() and "circle" in f1.read_text()
    f2 = tmp_path / "mh.svg"
    render_marbles_and_holes([(0.5, 0.5, 0, 1)], [(0.5, 0.51, 0, 1)], region, str(f2))
    assert "circle" in f2.read_text()


def test_viz_renders():
    img = np.zeros((64, 64, 3), np.uint8)
    nodes = np.array([[0.25, 0.25], [0.75, 0.75]])
    edges = np.array([[0, 1]])
    out = visualize_image_and_graph(img, nodes, edges, 64)
    assert out.shape == (64, 64, 3) and out.max() > 0
    rast = rasterize_graph(nodes, edges, 64, dilation_radius=2)
    assert rast.max() == 255


def test_spacenet_crop():
    g = {(10, 10): [(200, 200)], (200, 200): [(10, 10), (210, 210)],
         (210, 210): [(200, 200)]}
    out = crop_prediction(g, margin=24, image_size=400)
    assert (10, 10) not in out
    assert (200, 200) in out
    assert (10, 10) not in out.get((200, 200), [])


def test_astar_path():
    cost = np.ones((10, 10), np.uint8)
    assert astar_path_length(cost, (0, 0), (9, 9), 100) == 10  # diagonal
    cost[:, 5] = 0  # wall
    assert astar_path_length(cost, (0, 0), (9, 0), 100) == 0
    cost[9, 5] = 1  # gap in the wall
    assert astar_path_length(cost, (0, 0), (9, 0), 100) > 10


def test_extract_graph_astar_smoke():
    cfg = load_config(overrides=dict(
        ITSC_THRESHOLD=0.5, ROAD_THRESHOLD=0.3, ITSC_NMS_RADIUS=4,
        ROAD_NMS_RADIUS=8, NEIGHBOR_RADIUS=24,
    ))
    kp = np.zeros((64, 64), np.uint8)
    road = np.zeros((64, 64), np.uint8)
    road[30:34, 4:60] = 255  # horizontal road
    kp[30:34, 6:10] = 255
    kp[30:34, 54:58] = 255
    pts = extract_graph_points(kp, road, cfg)
    assert pts.shape[0] >= 2
    adj = extract_graph_astar(kp, road, cfg)
    assert len(adj) >= 2  # endpoints connected through the road corridor
    total_edges = sum(len(v) for v in adj.values())
    assert total_edges >= 2


def test_prepare_cli(tmp_path):
    """samroad-prepare rasterizes GT graphs into the processed/ mask tree
    that SatMapDataset expects (reference: the generate_labels.py scripts)."""
    import pickle

    import cv2
    import numpy as np

    from sam_road_tpu.cli.prepare import main as prepare_main

    root = tmp_path / "spacenet"
    (root / "RGB_1.0_meter").mkdir(parents=True)
    adj = {(100, 100): [(100, 300)], (100, 300): [(100, 100)]}
    with open(root / "RGB_1.0_meter" / "T1__gt_graph.p", "wb") as f:
        pickle.dump(adj, f)
    import json
    with open(root / "data_split.json", "w") as f:
        json.dump({"train": ["T1"], "validation": [], "test": []}, f)

    prepare_main(["--dataset", "spacenet", "--data_root", str(tmp_path)])
    road = cv2.imread(str(root / "processed" / "road_mask_T1.png"),
                      cv2.IMREAD_GRAYSCALE)
    kp = cv2.imread(str(root / "processed" / "keypoint_mask_T1.png"),
                    cv2.IMREAD_GRAYSCALE)
    assert road is not None and road.shape == (400, 400) and road.max() == 255
    # two endpoints (degree 1) -> keypoint discs present
    assert kp.max() == 255 and 0 < (kp > 0).sum() < (road > 0).sum() * 5
