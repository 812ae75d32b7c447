"""Data pipeline tests: label generation, GraphLabelGenerator semantics,
SatMapDataset sampling, collation, loader."""

import numpy as np
import pytest

from sam_road_tpu.config import load_config
from sam_road_tpu.data.dataset import BatchLoader, SatMapDataset, collate_batch
from sam_road_tpu.data.graph_labels import GraphLabelGenerator

from synthetic_data import make_spacenet_fixture


@pytest.fixture(scope="module")
def spacenet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthetic")
    make_spacenet_fixture(str(root), image_size=160, spacing=40)
    return str(root)


def _cfg(**over):
    base = dict(
        DATASET="spacenet",
        IMAGE_SIZE=160,
        PATCH_SIZE=80,
        TOPO_SAMPLE_NUM=8,
        MAX_NEIGHBOR_QUERIES=4,
        NEIGHBOR_RADIUS=48,
        ROAD_NMS_RADIUS=16,
        BATCH_SIZE=2,
    )
    base.update(over)
    return load_config(overrides=base)


def test_label_masks_rasterized(spacenet_root):
    import cv2
    import os

    kp = cv2.imread(
        os.path.join(spacenet_root, "spacenet/processed/keypoint_mask_SYN_0.png"),
        cv2.IMREAD_GRAYSCALE,
    )
    road = cv2.imread(
        os.path.join(spacenet_root, "spacenet/processed/road_mask_SYN_0.png"),
        cv2.IMREAD_GRAYSCALE,
    )
    assert kp.shape == (160, 160)
    assert kp.max() == 255 and road.max() == 255
    # road pixels superset-ish of keypoint centers; both sparse
    assert 0 < (road > 0).mean() < 0.5
    assert (kp > 0).sum() < (road > 0).sum()


def test_graph_label_generator_connectivity():
    # straight horizontal road: neighbors along the line connect, an isolated
    # parallel road does not.
    adj = {}

    def add(a, b):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)

    # two parallel horizontal roads at y=20 and y=60 ((r, c) keys, rc->xy)
    for x in range(0, 190, 10):
        add((20, x), (20, x + 10))
        add((60, x), (60, x + 10))
    cfg = _cfg(ROAD_NMS_RADIUS=8, NEIGHBOR_RADIUS=50, MAX_NEIGHBOR_QUERIES=8,
               TOPO_SAMPLE_NUM=32, PATCH_SIZE=100)
    gen = GraphLabelGenerator(cfg, adj, lambda v: v[:, ::-1])
    rng = np.random.default_rng(0)
    points, samples = gen.sample_patch(((0, 0), (100, 100)), 0, rng)

    n_connected = n_valid = 0
    for pairs, shall_connect, valid in samples:
        for (s, t), c, v in zip(pairs, shall_connect, valid):
            if not v:
                continue
            n_valid += 1
            # y-coordinates before noise: ~20 or ~60
            same_road = abs(points[s][1] - points[t][1]) < 15
            if c:
                n_connected += 1
                assert same_road, (points[s], points[t])
    assert n_valid > 0
    assert 0 < n_connected < n_valid  # some connect, cross-road pairs don't


def test_dataset_sample_shapes(spacenet_root):
    cfg = _cfg()
    ds = SatMapDataset(cfg, is_train=True, data_root=spacenet_root)
    rng = np.random.default_rng(0)
    s = ds.sample(0, rng)
    assert s["rgb"].shape == (80, 80, 3)
    assert s["keypoint_mask"].shape == (80, 80)
    assert 0 <= s["keypoint_mask"].max() <= 1.0
    assert s["pairs"].shape == (8, 4, 2)
    assert s["connected"].shape == (8, 4)
    assert s["valid"].shape == (8, 4)
    assert s["graph_points"].ndim == 2
    # the patch must actually contain graph points (not the empty fallback)
    assert s["graph_points"].shape[0] > 1
    assert s["valid"].any()
    # points live inside the (pre-noise) patch frame
    assert s["graph_points"].min() > -16 and s["graph_points"].max() < 96


def test_collate_bucketing(spacenet_root):
    cfg = _cfg()
    ds = SatMapDataset(cfg, is_train=True, data_root=spacenet_root)
    rng = np.random.default_rng(1)
    batch = collate_batch([ds.sample(0, rng) for _ in range(3)], point_bucket=32)
    assert batch["graph_points"].shape[0] == 3
    assert batch["graph_points"].shape[1] % 32 == 0
    assert batch["rgb"].shape == (3, 80, 80, 3)


def test_batch_loader(spacenet_root):
    cfg = _cfg()
    ds = SatMapDataset(cfg, is_train=True, data_root=spacenet_root)
    loader = BatchLoader(ds, batch_size=2, num_batches=3, point_bucket=32)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["rgb"].shape[0] == 2


def test_eval_patches_cover_image(spacenet_root):
    cfg = _cfg()
    ds = SatMapDataset(cfg, is_train=False, data_root=spacenet_root)
    assert len(ds.eval_patches) == len(ds.rgbs) * 4  # ceil(160/80)^2
    s = ds.sample(0)
    assert s["rgb"].shape == (80, 80, 3)


def test_multihost_input_sharding(spacenet_root):
    """process_index/process_count shard the pipeline across hosts: eval
    hosts take disjoint, union-complete strided slices of the deterministic
    order; train hosts draw from disjoint random streams."""
    cfg = _cfg()
    ds = SatMapDataset(cfg, is_train=False, data_root=spacenet_root)
    n = len(ds)
    counts = []
    for p in range(2):
        loader = BatchLoader(ds, batch_size=1, point_bucket=32,
                             process_index=p, process_count=2)
        # each host covers exactly its own slice (no wrap, no double-count)
        assert len(loader) == len(range(p, n, 2))
        counts.append(len(loader))
        # host p's first patch is global patch index p (stride 2)
        first = next(iter(loader))
        np.testing.assert_array_equal(first["rgb"][0], ds.sample(p)["rgb"])
    assert sum(counts) == n  # disjoint, union-complete at batch_size=1

    ds_tr = SatMapDataset(cfg, is_train=True, data_root=spacenet_root)
    b0 = next(iter(BatchLoader(ds_tr, batch_size=2, num_batches=1,
                               point_bucket=32, process_index=0,
                               process_count=2)))
    b1 = next(iter(BatchLoader(ds_tr, batch_size=2, num_batches=1,
                               point_bucket=32, process_index=1,
                               process_count=2)))
    # disjoint random streams -> different patches (overwhelmingly likely)
    assert not np.array_equal(b0["rgb"], b1["rgb"])


def test_eval_loader_counts_each_patch_exactly_once(spacenet_root):
    """A non-batch-divisible eval slice must NOT wrap around: the final
    ragged batch is padded with repeated samples at sample_weight 0, so
    every patch is represented exactly once at weight 1 (the reference
    evaluates an exact grid, reference: dataset.py:384-390)."""
    cfg = _cfg()
    ds = SatMapDataset(cfg, is_train=False, data_root=spacenet_root)
    n = len(ds)  # 4 patches on this fixture
    batch_size = 3  # deliberately non-divisible: batches of 3 over 4 patches
    assert n % batch_size != 0
    loader = BatchLoader(ds, batch_size=batch_size, point_bucket=32)
    batches = list(loader)
    assert len(batches) == (n + batch_size - 1) // batch_size
    total_weight = 0.0
    seen = []
    for b in batches:
        assert b["sample_weight"].shape == (batch_size,)
        total_weight += float(b["sample_weight"].sum())
        for i in range(batch_size):
            if b["sample_weight"][i] > 0:
                seen.append(b["rgb"][i])
    # exactly n patches counted, each the right one in order
    assert total_weight == n
    for i, rgb in enumerate(seen):
        np.testing.assert_array_equal(rgb, ds.sample(i)["rgb"].astype(np.uint8))
    # padding slots repeat a real sample (shape-stable) but weigh 0
    last = batches[-1]
    assert float(last["sample_weight"][-1]) == 0.0


def test_eval_step_ignores_weightless_padding(spacenet_root):
    """eval_step metric counts must be invariant to appending weight-0
    padding samples (the double-count fix's device half)."""
    import jax

    from sam_road_tpu.config import load_config
    from sam_road_tpu.models.sam_road import init_params
    from sam_road_tpu.training.harness import make_eval_step

    cfg = load_config(overrides=dict(
        SAM_VERSION="vit_t", PATCH_SIZE=32, COMPUTE_DTYPE="float32",
        TOPO_SAMPLE_NUM=4, MAX_NEIGHBOR_QUERIES=4,
    ))
    params = init_params(cfg)
    eval_step = make_eval_step(cfg)
    rng = np.random.default_rng(3)
    s, p = 4, 4

    def mk(batch):
        return {
            "rgb": rng.uniform(0, 255, (batch, 32, 32, 3)).astype(np.float32),
            "keypoint_mask": (rng.random((batch, 32, 32)) > 0.9).astype(np.float32),
            "road_mask": (rng.random((batch, 32, 32)) > 0.7).astype(np.float32),
            "graph_points": rng.uniform(0, 32, (batch, 8, 2)).astype(np.float32),
            "pairs": rng.integers(0, 8, (batch, s, p, 2)).astype(np.int32),
            "connected": rng.random((batch, s, p)) > 0.5,
            "valid": rng.random((batch, s, p)) > 0.2,
        }

    base = mk(3)
    out_plain = eval_step(params, dict(base))

    padded = {k: np.concatenate([v, v[-1:]], axis=0) for k, v in base.items()}
    padded["sample_weight"] = np.array([1, 1, 1, 0], np.float32)
    out_padded = eval_step(params, padded)

    for key in ("kp_iou", "road_iou", "topo_f1", "kp_pr", "road_pr"):
        np.testing.assert_allclose(
            np.asarray(out_plain[key]), np.asarray(out_padded[key]),
            rtol=1e-6, err_msg=key,
        )
    np.testing.assert_allclose(
        float(out_plain["loss"]), float(out_padded["loss"]), rtol=1e-5
    )
    assert float(out_padded["weight"]) == 3.0


def test_batch_loader_propagates_worker_errors(spacenet_root):
    """A producer-thread exception must surface in the consumer, not hang
    the iterator (observed: a bad crop range crashed the worker and the
    main thread blocked on q.get forever)."""
    cfg = _cfg()
    ds = SatMapDataset(cfg, is_train=True, data_root=spacenet_root)
    broken = BatchLoader(ds, batch_size=2, num_batches=2, point_bucket=32)
    ds.sample_max = ds.sample_min - 1  # forces rng.integers(high<=0)
    with pytest.raises(ValueError):
        list(broken)
