"""Config-variant coverage: ablation/config paths that the main tests don't
exercise — remat, focal loss, SAM-decoder training, LoRA training step,
sparse inference grids."""

import numpy as np
import pytest

import jax

from sam_road_tpu.config import load_config
from sam_road_tpu.models.sam_road import init_params
from sam_road_tpu.training.harness import Trainer


def _cfg(**over):
    base = dict(
        SAM_VERSION="vit_t",
        PATCH_SIZE=32,
        COMPUTE_DTYPE="float32",
        TOPO_SAMPLE_NUM=4,
        MAX_NEIGHBOR_QUERIES=4,
        BATCH_SIZE=8,
    )
    base.update(over)
    return load_config(overrides=base)


def _fake_batch(cfg, batch=8, n_pts=8):
    rng = np.random.default_rng(0)
    s, p = cfg.TOPO_SAMPLE_NUM, cfg.MAX_NEIGHBOR_QUERIES
    size = cfg.PATCH_SIZE
    return {
        "rgb": rng.uniform(0, 255, (batch, size, size, 3)).astype(np.float32),
        "keypoint_mask": (rng.random((batch, size, size)) > 0.9).astype(np.float32),
        "road_mask": (rng.random((batch, size, size)) > 0.7).astype(np.float32),
        "graph_points": rng.uniform(0, size, (batch, n_pts, 2)).astype(np.float32),
        "pairs": rng.integers(0, n_pts, (batch, s, p, 2)).astype(np.int32),
        "connected": rng.random((batch, s, p)) > 0.5,
        "valid": rng.random((batch, s, p)) > 0.2,
    }


def _one_step(cfg, tmp_path):
    params = init_params(cfg)
    trainer = Trainer(config=cfg, params=params, output_dir=str(tmp_path),
                      steps_per_epoch=10)
    logs = trainer.train_epoch([_fake_batch(cfg)], epoch=0)
    assert np.isfinite(logs[0]["loss"])
    return trainer


@pytest.mark.slow  # trainer-variant tier: one representative train test stays default
def test_remat_encoder_trains(tmp_path):
    _one_step(_cfg(REMAT_ENCODER=True), tmp_path)


@pytest.mark.slow  # trainer-variant tier (~45 s: fresh train-step compile);
# focal-loss math itself is unit-tested in test_aux
def test_focal_loss_trains(tmp_path):
    _one_step(_cfg(FOCAL_LOSS=True), tmp_path)


@pytest.mark.slow
def test_sam_decoder_trains(tmp_path):
    _one_step(_cfg(USE_SAM_DECODER=True), tmp_path)


@pytest.mark.slow
def test_lora_trains_and_freezes_base(tmp_path):
    cfg = _cfg(ENCODER_LORA=True, LORA_RANK=2, FREEZE_ENCODER=True)
    params = init_params(cfg)
    base_before = np.asarray(
        params["image_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]
    ).copy()
    lora_before = np.asarray(
        params["image_encoder"]["blocks_0"]["attn"]["linear_a_q"]["kernel"]
    ).copy()
    trainer = Trainer(config=cfg, params=params, output_dir=str(tmp_path),
                      steps_per_epoch=10)
    trainer.train_epoch([_fake_batch(cfg), _fake_batch(cfg)], epoch=0)
    after = jax.device_get(trainer.state.params)
    np.testing.assert_array_equal(
        base_before, np.asarray(after["image_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"])
    )
    assert (
        np.abs(
            lora_before
            - np.asarray(after["image_encoder"]["blocks_0"]["attn"]["linear_a_q"]["kernel"])
        ).max()
        > 0
    )


@pytest.mark.slow  # ~18 s: INFER_PATCHES_PER_EDGE=4 sparse-grid engine
# run; the default tier covers the engine at the standard grid density
def test_sparse_patch_grid_inference():
    """INFER_PATCHES_PER_EDGE smaller than full coverage (the 4x4 ablation
    configs) must leave uncovered pixels at 0 rather than NaN."""
    from sam_road_tpu.inference.engine import TiledInferenceEngine

    cfg = load_config(overrides=dict(
        SAM_VERSION="vit_t", PATCH_SIZE=64, INFER_BATCH_SIZE=4,
        INFER_PATCHES_PER_EDGE=2, SAMPLE_MARGIN=0, COMPUTE_DTYPE="float32",
        ITSC_THRESHOLD=0.9, ROAD_THRESHOLD=0.45, ITSC_NMS_RADIUS=4,
        ROAD_NMS_RADIUS=8, NEIGHBOR_RADIUS=24, MAX_NEIGHBOR_QUERIES=4,
    ))
    params = init_params(cfg)
    engine = TiledInferenceEngine(cfg, params, point_bucket=16)
    img = np.random.default_rng(0).integers(0, 255, (256, 256, 3), dtype=np.uint8)
    nodes, edges, kp, road = engine.infer_one_img(img)
    assert kp.shape == (256, 256)
    # 2x2 grid of 64px patches covers only corners+edges of a 256px tile;
    # uncovered center must be exactly 0
    assert road[128, 128] == 0
    assert np.isfinite(road.astype(np.float64)).all()


@pytest.mark.slow  # ~25 s: full CLI drive over an 8-dev mesh; sharded-engine
# exactness stays default (test_multichip_inference.py) + the driver dryrun
def test_infer_cli_multichip(tmp_path):
    """samroad-infer with DP_SHARDS > 1 shards each tile's patch grid over
    the mesh (same config key as the Trainer); graphs/masks land on disk."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from synthetic_data import make_spacenet_fixture

    from sam_road_tpu.cli.infer import main as infer_main
    from sam_road_tpu.config import load_config
    from sam_road_tpu.models.sam_road import init_params
    from sam_road_tpu.training.harness import Trainer

    root = str(tmp_path)
    make_spacenet_fixture(root, image_size=160, spacing=40)
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            "DATASET: 'spacenet'\nIMAGE_SIZE: 160\nSAM_VERSION: 'vit_t'\n"
            "PATCH_SIZE: 80\nINFER_BATCH_SIZE: 4\nINFER_PATCHES_PER_EDGE: 4\n"
            "SAMPLE_MARGIN: 0\nCOMPUTE_DTYPE: 'float32'\n"
            "TOPO_SAMPLE_NUM: 16\nMAX_NEIGHBOR_QUERIES: 4\n"
            "ITSC_THRESHOLD: 0.9\nROAD_THRESHOLD: 0.6\nTOPO_THRESHOLD: 0.4\n"
            "ITSC_NMS_RADIUS: 4\nROAD_NMS_RADIUS: 8\nNEIGHBOR_RADIUS: 24\n"
            "DP_SHARDS: 2\n"
        )
    cfg = load_config(cfg_path)
    params = init_params(cfg)
    run_dir = os.path.join(root, "run")
    trainer = Trainer(config=cfg, params=params, output_dir=run_dir,
                      steps_per_epoch=1)
    trainer.save_checkpoint(0)

    cwd = os.getcwd()
    try:
        os.chdir(root)
        infer_main(["--config", cfg_path,
                    "--checkpoint", os.path.join(run_dir, "ckpt_epoch_0"),
                    "--data_root", root, "--output_dir", "mc",
                    "--max_tiles", "1"])
    finally:
        os.chdir(cwd)
    out = os.path.join(root, "save", "mc")
    graphs = os.listdir(os.path.join(out, "graph"))
    assert len(graphs) == 1 and graphs[0].endswith(".p")
    assert os.path.exists(os.path.join(out, "inference_time.txt"))
