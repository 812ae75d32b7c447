"""Config system tests (reference semantics: utils.py:6-30 + addict)."""

import os

import yaml

from sam_road_tpu.config import (
    Config,
    MISSING,
    load_config,
    create_output_dir_and_save_config,
)


def test_missing_keys_are_falsy():
    cfg = Config()
    assert not cfg.TOPONET_VERSION
    assert cfg.TOPONET_VERSION != "no_transformer"
    assert bool(cfg.NOT_A_KEY) is False


def test_defaults_and_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("PATCH_SIZE: 256\nDATASET: spacenet\n")
    cfg = load_config(str(p))
    assert cfg.PATCH_SIZE == 256
    assert cfg.DATASET == "spacenet"
    assert cfg.MAX_NEIGHBOR_QUERIES == 16  # default preserved
    cfg2 = load_config(str(p), overrides={"PATCH_SIZE": 128})
    assert cfg2.PATCH_SIZE == 128


def test_attribute_set_and_roundtrip():
    cfg = Config()
    cfg.FOO = {"BAR": 1}
    d = cfg.to_dict()
    assert d == {"FOO": {"BAR": 1}}


def test_output_dir_snapshot(tmp_path):
    cfg = load_config()
    out = create_output_dir_and_save_config(
        str(tmp_path / "run"), cfg, specified_dir=str(tmp_path / "rundir")
    )
    assert os.path.exists(os.path.join(out, "config.yaml"))
    with open(os.path.join(out, "config.yaml")) as f:
        loaded = yaml.safe_load(f)
    assert loaded["PATCH_SIZE"] == cfg.PATCH_SIZE


def test_reference_yaml_compatible(tmp_path):
    # A verbatim copy of the flagship reference config keys must load.
    text = """
DATASET: 'cityscale'
NO_SAM: False
SAM_VERSION: 'vit_b'
PATCH_SIZE: 512
TOPO_SAMPLE_NUM: 512
TOPONET_VERSION: 'normal'
INFER_BATCH_SIZE: 64
SAMPLE_MARGIN: 64
INFER_PATCHES_PER_EDGE: 16
ITSC_THRESHOLD: 0.248
ROAD_THRESHOLD: 0.364
TOPO_THRESHOLD: 0.500
ITSC_NMS_RADIUS: 8
ROAD_NMS_RADIUS: 16
NEIGHBOR_RADIUS: 64
MAX_NEIGHBOR_QUERIES: 16
"""
    p = tmp_path / "ref.yaml"
    p.write_text(text)
    cfg = load_config(str(p))
    assert cfg.SAM_VERSION == "vit_b"
    assert cfg.TOPO_THRESHOLD == 0.5
    assert MISSING == Config().ANYTHING


def test_shipped_config_grid_loads():
    """Every YAML in configs/ must load and produce a valid ModelSpec."""
    import glob
    import os

    from sam_road_tpu.models.sam_road import ModelSpec

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs", "*.yaml")))
    assert len(paths) >= 18
    for p in paths:
        cfg = load_config(p)
        spec = ModelSpec.from_config(cfg)
        assert spec.sam_version in ("vit_b", "vit_l", "vit_h", "vit_t"), p
        assert cfg.PATCH_SIZE in (256, 512, 1024), p
        assert 0 < cfg.ROAD_THRESHOLD <= 1 or cfg.ROAD_THRESHOLD == 128, p


def test_console_entry_points_importable():
    import importlib

    for mod in ("train", "test", "infer", "evaluate", "triage", "debug_labels"):
        m = importlib.import_module(f"sam_road_tpu.cli.{mod}")
        assert callable(m.main)
