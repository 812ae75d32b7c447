"""End-to-end tiled inference engine tests on synthetic data with a tiny
randomly-initialized model. Checks the engine mechanics (patch fusion
coverage, vertex extraction, edge aggregation), not model quality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam_road_tpu.config import load_config
from sam_road_tpu.inference.engine import TiledInferenceEngine
from sam_road_tpu.models.sam_road import init_params


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = load_config(
        overrides=dict(
            SAM_VERSION="vit_t",
            PATCH_SIZE=64,
            INFER_BATCH_SIZE=4,
            INFER_PATCHES_PER_EDGE=4,
            SAMPLE_MARGIN=8,
            COMPUTE_DTYPE="float32",
            ITSC_THRESHOLD=0.9,  # random-init masks sit near 0.5
            ROAD_THRESHOLD=0.45,
            TOPO_THRESHOLD=0.4,
            ITSC_NMS_RADIUS=4,
            ROAD_NMS_RADIUS=8,
            NEIGHBOR_RADIUS=24,
            MAX_NEIGHBOR_QUERIES=4,
        )
    )
    params = init_params(cfg)
    return cfg, params


def test_engine_end_to_end(tiny_setup):
    cfg, params = tiny_setup
    engine = TiledInferenceEngine(cfg, params, point_bucket=16)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(256, 256, 3), dtype=np.uint8)
    nodes, edges, kp_mask, road_mask = engine.infer_one_img(img)

    assert kp_mask.shape == (256, 256) and kp_mask.dtype == np.uint8
    assert road_mask.shape == (256, 256)
    # Covered interior must have full counter coverage -> no NaN holes;
    # road mask near 0.5*255 for a random-init model.
    interior = road_mask[64:192, 64:192]
    assert interior.min() > 0
    # nodes are (r, c) within image bounds
    assert nodes.ndim == 2 and nodes.shape[1] == 2
    if nodes.shape[0]:
        assert nodes.min() >= 0 and nodes.max() < 256
    # edges index into nodes
    if edges.shape[0]:
        assert edges.max() < nodes.shape[0]
        # scores are averaged probabilities -> directional duplicates allowed
        assert edges.min() >= 0
    assert engine.last_timings["total"] > 0


def test_engine_deterministic(tiny_setup):
    cfg, params = tiny_setup
    engine = TiledInferenceEngine(cfg, params, point_bucket=16)
    img = np.random.default_rng(1).integers(0, 255, (256, 256, 3), dtype=np.uint8)
    out1 = engine.infer_one_img(img)
    out2 = engine.infer_one_img(img)
    np.testing.assert_array_equal(out1[0], out2[0])
    np.testing.assert_array_equal(out1[1], out2[1])
    np.testing.assert_array_equal(out1[2], out2[2])


def test_engine_blank_image_no_points(tiny_setup):
    cfg, params = tiny_setup
    # Raise thresholds so nothing survives -> empty-graph path
    cfg2 = load_config(overrides={**cfg, "ITSC_THRESHOLD": 1.1, "ROAD_THRESHOLD": 1.1})
    engine = TiledInferenceEngine(cfg2, params, point_bucket=16)
    img = np.zeros((256, 256, 3), dtype=np.uint8)
    nodes, edges, kp, road = engine.infer_one_img(img)
    assert nodes.shape[0] == 0
    assert edges.shape[0] == 0


def test_mask_fusion_matches_host_oracle(tiny_setup):
    """The on-device scatter-add fusion must equal a host-side numpy
    re-implementation of the reference accumulation loop
    (reference: inferencer.py:99-110)."""
    from sam_road_tpu.data.partitions import get_patch_info_one_img
    from sam_road_tpu.models.sam_road import SAMRoad, build_model

    cfg, params = tiny_setup
    engine = TiledInferenceEngine(cfg, params, point_bucket=16)
    img = np.random.default_rng(2).integers(0, 255, (256, 256, 3), dtype=np.uint8)
    _, _, kp_mask, road_mask = engine.infer_one_img(img)

    model = build_model(cfg)
    info = get_patch_info_one_img(
        0, 256, cfg.SAMPLE_MARGIN, cfg.PATCH_SIZE, cfg.INFER_PATCHES_PER_EDGE
    )
    fused = np.zeros((256, 256, 2), np.float64)
    counter = np.zeros((256, 256), np.float64)
    for _, (x0, y0), (x1, y1) in info:
        patch = img[y0:y1, x0:x1].astype(np.float32)[None]
        scores, _ = model.apply(
            {"params": params}, jnp.asarray(patch),
            method=SAMRoad.infer_masks_and_features,
        )
        fused[y0:y1, x0:x1] += np.asarray(scores[0], np.float64)
        counter[y0:y1, x0:x1] += 1.0
    with np.errstate(invalid="ignore"):
        fused = np.nan_to_num(fused / counter[..., None])
    want_kp = (fused[..., 0] * 255).astype(np.uint8)
    want_road = (fused[..., 1] * 255).astype(np.uint8)
    # identical up to float accumulation order; allow 1 uint8 step
    assert np.abs(kp_mask.astype(int) - want_kp.astype(int)).max() <= 1
    assert np.abs(road_mask.astype(int) - want_road.astype(int)).max() <= 1


def test_infer_tiles_pipelined_matches_sequential(tiny_setup):
    cfg, params = tiny_setup
    engine = TiledInferenceEngine(cfg, params, point_bucket=16)
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, (256, 256, 3), dtype=np.uint8) for _ in range(3)]
    seq = [engine.infer_one_img(im) for im in imgs]
    piped = list(engine.infer_tiles(imgs))
    assert len(piped) == 3
    for (n1, e1, k1, r1), (n2, e2, k2, r2) in zip(seq, piped):
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(e1, e2)
        np.testing.assert_array_equal(k1, k2)


def test_banded_upload_bit_identical(tiny_setup):
    """INFER_UPLOAD_BANDS > 1 (sliced region uploads overlapping band
    compute) must produce BIT-identical masks and identical graphs — the
    int32 fixed-point fusion makes banding associativity-free."""
    cfg, params = tiny_setup
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (192, 192, 3), dtype=np.uint8)
    base = TiledInferenceEngine(cfg, params, point_bucket=16)
    n0, e0, kp0, rd0 = base.infer_one_img(img)

    cfg_b = load_config(overrides={**{k: cfg[k] for k in (
        "SAM_VERSION", "PATCH_SIZE", "INFER_BATCH_SIZE",
        "INFER_PATCHES_PER_EDGE", "SAMPLE_MARGIN", "COMPUTE_DTYPE",
        "ITSC_THRESHOLD", "ROAD_THRESHOLD", "TOPO_THRESHOLD",
        "ITSC_NMS_RADIUS", "ROAD_NMS_RADIUS", "NEIGHBOR_RADIUS",
        "MAX_NEIGHBOR_QUERIES")}, "INFER_UPLOAD_BANDS": 2,
        "INFER_STREAM_PHASE1": False})
    banded = TiledInferenceEngine(cfg_b, params, point_bucket=16)
    n1, e1, kp1, rd1 = banded.infer_one_img(img)

    np.testing.assert_array_equal(kp0, kp1)
    np.testing.assert_array_equal(rd0, rd1)
    np.testing.assert_array_equal(n0, n1)
    np.testing.assert_array_equal(e0, e1)


@pytest.mark.parametrize("n_bands,taper", [(2, False), (3, False),
                                           (4, False), (3, True),
                                           (4, True)])
def test_streamed_phase1_bit_identical(tiny_setup, n_bands, taper):
    """The streamed k-band phase 1 (disjoint column-slab uploads, early
    mask-chunk fetches) must be BIT-identical to the whole-region single
    dispatch at ANY band count: same int32 fixed-point sums, just split at
    column boundaries (bands assemble their pixels on device from the slab
    segments and carry the accumulator overlap forward)."""
    cfg, params = tiny_setup
    rng = np.random.default_rng(12)
    img = rng.integers(0, 255, (192, 192, 3), dtype=np.uint8)
    shared = {k: cfg[k] for k in (
        "SAM_VERSION", "PATCH_SIZE", "INFER_BATCH_SIZE",
        "INFER_PATCHES_PER_EDGE", "SAMPLE_MARGIN", "COMPUTE_DTYPE",
        "ITSC_THRESHOLD", "ROAD_THRESHOLD", "TOPO_THRESHOLD",
        "ITSC_NMS_RADIUS", "ROAD_NMS_RADIUS", "NEIGHBOR_RADIUS",
        "MAX_NEIGHBOR_QUERIES")}
    whole = TiledInferenceEngine(
        load_config(overrides={**shared, "INFER_STREAM_PHASE1": False}),
        params, point_bucket=16,
    )
    streamed = TiledInferenceEngine(
        load_config(overrides={**shared, "INFER_STREAM_PHASE1": True,
                               "INFER_STREAM_BANDS": n_bands,
                               "INFER_STREAM_TAPER": taper}),
        params, point_bucket=16,
    )
    # the tiny grid must actually take the streamed path at this band count
    info = __import__(
        "sam_road_tpu.data.partitions", fromlist=["get_patch_info_one_img"]
    ).get_patch_info_one_img(
        0, 192, cfg.SAMPLE_MARGIN, cfg.PATCH_SIZE, cfg.INFER_PATCHES_PER_EDGE
    )
    plan = streamed._stream_plan(info, 192, n_bands)
    assert plan is not None and len(plan) == n_bands
    # bands partition the patch list and chunk anchors are increasing
    assert plan[0]["i0"] == 0 and plan[-1]["i1"] == len(info)
    assert all(b["i1"] == c["i0"] for b, c in zip(plan, plan[1:]))
    assert all(b["a"] < c["a"] for b, c in zip(plan, plan[1:]))
    assert plan[-1]["e"] == 192

    n0, e0, kp0, rd0 = whole.infer_one_img(img)
    n1, e1, kp1, rd1 = streamed.infer_one_img(img)
    np.testing.assert_array_equal(kp0, kp1)
    np.testing.assert_array_equal(rd0, rd1)
    np.testing.assert_array_equal(n0, n1)
    np.testing.assert_array_equal(e0, e1)


def test_p2_fetch_waves_exact(tiny_setup):
    """INFER_P2_FETCH_WAVES splits the grouped score fetch into
    dispatch-ordered waves; each wave slices its stack to its OWN real max
    point count, so results must be exactly the outputs of the single
    grouped fetch (downstream slices scores[i, :n] per patch)."""
    cfg, params = tiny_setup
    rng = np.random.default_rng(21)
    img = rng.integers(0, 255, (192, 192, 3), dtype=np.uint8)
    base = TiledInferenceEngine(cfg, params, point_bucket=16)
    n0, e0, kp0, rd0 = base.infer_one_img(img)

    cfg_w = load_config(overrides={**{k: cfg[k] for k in (
        "SAM_VERSION", "PATCH_SIZE", "INFER_BATCH_SIZE",
        "INFER_PATCHES_PER_EDGE", "SAMPLE_MARGIN", "COMPUTE_DTYPE",
        "ITSC_THRESHOLD", "ROAD_THRESHOLD", "TOPO_THRESHOLD",
        "ITSC_NMS_RADIUS", "ROAD_NMS_RADIUS", "NEIGHBOR_RADIUS",
        "MAX_NEIGHBOR_QUERIES")}, "INFER_P2_FETCH_WAVES": 2})
    waved = TiledInferenceEngine(cfg_w, params, point_bucket=16)
    n1, e1, kp1, rd1 = waved.infer_one_img(img)

    np.testing.assert_array_equal(kp0, kp1)
    np.testing.assert_array_equal(rd0, rd1)
    np.testing.assert_array_equal(n0, n1)
    np.testing.assert_array_equal(e0, e1)


def test_p2_packed_args_exact(tiny_setup):
    """INFER_P2_PACK_ARGS ships all batches' pair args in one upload per
    kind and slices per batch on device; per-batch program shapes are
    unchanged, so the graph must be exactly the unpacked path's."""
    cfg, params = tiny_setup
    rng = np.random.default_rng(33)
    img = rng.integers(0, 255, (192, 192, 3), dtype=np.uint8)
    shared = {k: cfg[k] for k in (
        "SAM_VERSION", "PATCH_SIZE", "INFER_BATCH_SIZE",
        "INFER_PATCHES_PER_EDGE", "SAMPLE_MARGIN", "COMPUTE_DTYPE",
        "ITSC_THRESHOLD", "ROAD_THRESHOLD", "TOPO_THRESHOLD",
        "ITSC_NMS_RADIUS", "ROAD_NMS_RADIUS", "NEIGHBOR_RADIUS",
        "MAX_NEIGHBOR_QUERIES")}
    plain = TiledInferenceEngine(
        load_config(overrides={**shared, "INFER_P2_PACK_ARGS": False}),
        params, point_bucket=16,
    )
    packed = TiledInferenceEngine(
        load_config(overrides={**shared, "INFER_P2_PACK_ARGS": True}),
        params, point_bucket=16,
    )
    n0, e0, kp0, rd0 = plain.infer_one_img(img)
    n1, e1, kp1, rd1 = packed.infer_one_img(img)
    np.testing.assert_array_equal(kp0, kp1)
    np.testing.assert_array_equal(n0, n1)
    np.testing.assert_array_equal(e0, e1)


def test_p2_device_agg_exact(tiny_setup):
    """INFER_P2_DEVICE_AGG scatter-adds int16 fixed-point scores into a
    per-unique-edge int32 accumulator on device and fetches one [E, 3]
    array; the per-edge integer sums are exactly the host path's (same q
    values, associative integer addition), so the node set, masks, and
    kept edge set must match the host-aggregated path."""
    cfg, params = tiny_setup
    rng = np.random.default_rng(47)
    img = rng.integers(0, 255, (192, 192, 3), dtype=np.uint8)
    shared = {k: cfg[k] for k in (
        "SAM_VERSION", "PATCH_SIZE", "INFER_BATCH_SIZE",
        "INFER_PATCHES_PER_EDGE", "SAMPLE_MARGIN", "COMPUTE_DTYPE",
        "ITSC_THRESHOLD", "ROAD_THRESHOLD", "TOPO_THRESHOLD",
        "ITSC_NMS_RADIUS", "ROAD_NMS_RADIUS", "NEIGHBOR_RADIUS",
        "MAX_NEIGHBOR_QUERIES")}
    host = TiledInferenceEngine(
        load_config(overrides={**shared, "INFER_P2_DEVICE_AGG": False}),
        params, point_bucket=16,
    )
    dev = TiledInferenceEngine(
        load_config(overrides={**shared, "INFER_P2_DEVICE_AGG": True}),
        params, point_bucket=16,
    )
    n0, e0, kp0, rd0 = host.infer_one_img(img)
    n1, e1, kp1, rd1 = dev.infer_one_img(img)
    assert e0.shape[0] > 0, "fixture must exercise real edges"
    np.testing.assert_array_equal(kp0, kp1)
    np.testing.assert_array_equal(rd0, rd1)
    np.testing.assert_array_equal(n0, n1)
    np.testing.assert_array_equal(e0, e1)


def test_p2_device_agg_no_valid_pairs(tiny_setup):
    """Vertices exist but a tiny NEIGHBOR_RADIUS leaves every pair slot
    invalid: the agg path must skip dispatch (empty unique-edge table)
    and return no edges, matching the host path."""
    cfg, params = tiny_setup
    ov = {k: cfg[k] for k in (
        "SAM_VERSION", "PATCH_SIZE", "INFER_BATCH_SIZE",
        "INFER_PATCHES_PER_EDGE", "SAMPLE_MARGIN", "COMPUTE_DTYPE",
        "ITSC_THRESHOLD", "ROAD_THRESHOLD", "TOPO_THRESHOLD",
        "ITSC_NMS_RADIUS", "ROAD_NMS_RADIUS",
        "MAX_NEIGHBOR_QUERIES")}
    img = np.random.default_rng(48).integers(
        0, 255, (192, 192, 3), dtype=np.uint8)
    eng = TiledInferenceEngine(
        load_config(overrides={**ov, "NEIGHBOR_RADIUS": 1e-3,
                               "INFER_P2_DEVICE_AGG": True}),
        params, point_bucket=16,
    )
    nodes, edges, _, _ = eng.infer_one_img(img)
    assert nodes.shape[0] > 0
    assert edges.shape == (0, 2)


@pytest.mark.parametrize("limit", ["verts", "edges"])
def test_p2_device_agg_auto_fallback(tiny_setup, monkeypatch, capsys, limit):
    """Regions exceeding the uint16 vertex/edge-id transport must fall back
    to the host aggregation automatically (not assert). The real limits are
    65536 vertices / 65535 padded edge ids — far too big to synthesize on a
    test fixture — so shrink the module constants below the fixture's real
    counts and require (a) a logged fallback and (b) output identical to
    the host path."""
    import sam_road_tpu.inference.engine as eng_mod

    cfg, params = tiny_setup
    rng = np.random.default_rng(47)
    img = rng.integers(0, 255, (192, 192, 3), dtype=np.uint8)
    shared = {k: cfg[k] for k in (
        "SAM_VERSION", "PATCH_SIZE", "INFER_BATCH_SIZE",
        "INFER_PATCHES_PER_EDGE", "SAMPLE_MARGIN", "COMPUTE_DTYPE",
        "ITSC_THRESHOLD", "ROAD_THRESHOLD", "TOPO_THRESHOLD",
        "ITSC_NMS_RADIUS", "ROAD_NMS_RADIUS", "NEIGHBOR_RADIUS",
        "MAX_NEIGHBOR_QUERIES")}
    host = TiledInferenceEngine(
        load_config(overrides={**shared, "INFER_P2_DEVICE_AGG": False}),
        params, point_bucket=16,
    )
    n0, e0, kp0, rd0 = host.infer_one_img(img)
    assert e0.shape[0] > 0, "fixture must exercise real edges"
    if limit == "verts":
        monkeypatch.setattr(eng_mod, "_AGG_MAX_VERTS", 2)
    else:
        monkeypatch.setattr(eng_mod, "_AGG_MAX_EDGE_PAD", 2)
    dev = TiledInferenceEngine(
        load_config(overrides={**shared, "INFER_P2_DEVICE_AGG": True}),
        params, point_bucket=16,
    )
    n1, e1, kp1, rd1 = dev.infer_one_img(img)
    out = capsys.readouterr().out
    assert "falling back to host edge aggregation" in out
    np.testing.assert_array_equal(kp0, kp1)
    np.testing.assert_array_equal(rd0, rd1)
    np.testing.assert_array_equal(n0, n1)
    np.testing.assert_array_equal(e0, e1)


@pytest.mark.slow  # ~35 s: INFER_P2_SPECULATIVE defaults OFF (0/4 hits at
# the synthetic bench's tied-score NMS, docs/DESIGN.md); its numerics live
# in this tier like the other default-off knobs (fused-train policy).
def test_speculative_phase2_exact_hits_and_forced_miss():
    """INFER_P2_SPECULATIVE: while the last stream band computes, phase 2 is
    dispatched against vertices extracted PROVISIONALLY from the finalized
    band columns. Greedy NMS is global, so _finish accepts a speculative
    score buffer only when the batch's pair args match the final extraction
    byte-for-byte and re-dispatches otherwise — outputs are bit-identical
    either way. This test pins (a) the accept path on a sparse workload
    (hits >= 1, outputs exactly equal to the non-speculative engine) and
    (b) the re-dispatch path via a tampered speculative entry."""
    over = dict(
        SAM_VERSION="vit_t", PATCH_SIZE=64, INFER_BATCH_SIZE=8,
        INFER_PATCHES_PER_EDGE=8, SAMPLE_MARGIN=8, COMPUTE_DTYPE="float32",
        ITSC_THRESHOLD=0.9, ROAD_THRESHOLD=0.52, TOPO_THRESHOLD=0.4,
        ITSC_NMS_RADIUS=4, ROAD_NMS_RADIUS=8, NEIGHBOR_RADIUS=24,
        MAX_NEIGHBOR_QUERIES=4,
    )
    params = init_params(load_config(overrides=over))
    img = np.random.default_rng(3).integers(0, 255, (448, 448, 3),
                                            dtype=np.uint8)
    base = TiledInferenceEngine(load_config(overrides=over), params,
                                point_bucket=16)
    n0, e0, kp0, rd0 = base.infer_one_img(img)
    assert n0.shape[0] > 0, "fixture must extract vertices"

    spec = TiledInferenceEngine(
        load_config(overrides={**over, "INFER_P2_SPECULATIVE": True}),
        params, point_bucket=16,
    )
    n1, e1, kp1, rd1 = spec.infer_one_img(img)
    t = spec.last_timings
    assert t.get("spec_dispatched", 0) >= 1, t
    assert t.get("spec_hits", 0) >= 1, t
    np.testing.assert_array_equal(kp0, kp1)
    np.testing.assert_array_equal(rd0, rd1)
    np.testing.assert_array_equal(n0, n1)
    np.testing.assert_array_equal(e0, e1)

    # forced miss: corrupt one speculative entry's pair coords — the
    # verification must reject it and re-dispatch, with identical outputs
    p1 = spec._run_phase1(img)
    entries = p1["spec"]["entries"]
    assert entries, "speculation must engage"
    first = next(iter(entries))
    entries[first][1][0, 0, 0] ^= 1  # tamper bpoints
    n2, e2, kp2, rd2 = spec._finish(p1)
    assert spec.last_timings.get("spec_miss", 0) >= 1
    np.testing.assert_array_equal(kp0, kp2)
    np.testing.assert_array_equal(n0, n2)
    np.testing.assert_array_equal(e0, e2)
