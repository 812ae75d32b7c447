"""Multi-chip region inference: the sharded engine on an 8-virtual-device
mesh must reproduce the single-device engine's outputs."""

import numpy as np
import pytest

import jax

from sam_road_tpu.config import load_config
from sam_road_tpu.inference.engine import TiledInferenceEngine
from sam_road_tpu.models.sam_road import init_params
from sam_road_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(
        overrides=dict(
            SAM_VERSION="vit_t",
            PATCH_SIZE=64,
            INFER_BATCH_SIZE=8,
            INFER_PATCHES_PER_EDGE=4,
            SAMPLE_MARGIN=8,
            COMPUTE_DTYPE="float32",
            ITSC_THRESHOLD=0.9,
            ROAD_THRESHOLD=0.45,
            TOPO_THRESHOLD=0.4,
            ITSC_NMS_RADIUS=4,
            ROAD_NMS_RADIUS=8,
            NEIGHBOR_RADIUS=24,
            MAX_NEIGHBOR_QUERIES=4,
        )
    )
    params = init_params(cfg)
    img = np.random.default_rng(0).integers(0, 255, (256, 256, 3), dtype=np.uint8)
    return cfg, params, img


def test_sharded_engine_matches_single_device(setup):
    cfg, params, img = setup
    assert len(jax.devices()) == 8
    single = TiledInferenceEngine(cfg, params, point_bucket=16)
    nodes1, edges1, kp1, road1 = single.infer_one_img(img)

    mesh = make_mesh(8)
    sharded = TiledInferenceEngine(cfg, params, point_bucket=16, mesh=mesh)
    nodes8, edges8, kp8, road8 = sharded.infer_one_img(img)

    # masks equal up to uint8 quantization of reordered float sums
    assert np.abs(kp1.astype(int) - kp8.astype(int)).max() <= 1
    assert np.abs(road1.astype(int) - road8.astype(int)).max() <= 1
    # graph outputs identical when masks quantize identically; allow tiny
    # diffs otherwise but require structural agreement
    assert abs(nodes1.shape[0] - nodes8.shape[0]) <= 2


def test_sharded_engine_batch_divisibility(setup):
    cfg, params, img = setup
    cfg2 = load_config(overrides={**cfg, "INFER_BATCH_SIZE": 6})
    with pytest.raises(AssertionError):
        TiledInferenceEngine(cfg2, params, mesh=make_mesh(8))
