"""Fused-kernel encoder parity vs the flax encoder (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam_road_tpu.models.fast_encoder import encoder_forward_fused
from sam_road_tpu.models.vit import ENCODER_SPECS, ImageEncoderViT


def test_fast_encoder_v3_kernels_match_flax_vit_t():
    """Token-tiled fusion (round-3 version): LN+qkv / LN+MLP kernels on the
    compact grid with the window-layout kernel only for attention."""
    spec = ENCODER_SPECS["vit_t"]
    enc = ImageEncoderViT(
        img_size=96, embed_dim=spec["embed_dim"], depth=spec["depth"],
        num_heads=spec["num_heads"],
        global_attn_indexes=spec["global_attn_indexes"],
        window_size=4, dtype=jnp.float32,
    )
    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, 96, 96, 3)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = jax.tree.map(
        lambda p: p + 0.02 * np.random.default_rng(10).normal(size=p.shape).astype(p.dtype),
        jax.tree.map(np.asarray, params),
    )
    want = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    got = np.asarray(
        encoder_forward_fused(
            params, jnp.asarray(x), sam_version="vit_t", img_size=96,
            window_size=4, dtype=jnp.float32, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fast_encoder_pad_free_path_matches():
    """PAD_FREE data path (ln_dense_padded writes the padded grid directly;
    proj_ln_mlp_residual_grid reads attention output from it) must match
    the default pad/unpad path bit-for-bit — per-token math is identical.
    (Measured slower on the round-4 TPU A/B, default off; docs/DESIGN.md.)"""
    from sam_road_tpu.models import fast_encoder as fe

    spec = ENCODER_SPECS["vit_t"]
    enc = ImageEncoderViT(
        img_size=96, embed_dim=spec["embed_dim"], depth=spec["depth"],
        num_heads=spec["num_heads"],
        global_attn_indexes=spec["global_attn_indexes"],
        window_size=4, dtype=jnp.float32,
    )
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 96, 96, 3)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = jax.tree.map(np.asarray, params)
    kw = dict(sam_version="vit_t", img_size=96, window_size=4,
              dtype=jnp.float32, interpret=True)
    want = np.asarray(encoder_forward_fused(params, jnp.asarray(x), **kw))
    old = fe.PAD_FREE
    fe.PAD_FREE = True
    try:
        got = np.asarray(encoder_forward_fused(params, jnp.asarray(x), **kw))
    finally:
        fe.PAD_FREE = old
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow  # ~12 s: non-divisible-window edge; pad-free + v3-kernel
# representatives stay default
def test_fast_encoder_v3_nondivisible_window_pad():
    """window 5 on a 6x6 grid pads 6->10: pad tokens must act as keys with
    qkv(0)=bias exactly (the bias-after-pad construction)."""
    spec = ENCODER_SPECS["vit_t"]
    enc = ImageEncoderViT(
        img_size=96, embed_dim=spec["embed_dim"], depth=spec["depth"],
        num_heads=spec["num_heads"],
        global_attn_indexes=spec["global_attn_indexes"],
        window_size=5, dtype=jnp.float32,
    )
    rng = np.random.default_rng(11)
    x = rng.normal(size=(1, 96, 96, 3)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = jax.tree.map(
        lambda p: p + 0.02 * np.random.default_rng(12).normal(size=p.shape).astype(p.dtype),
        jax.tree.map(np.asarray, params),
    )
    want = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    got = np.asarray(
        encoder_forward_fused(
            params, jnp.asarray(x), sam_version="vit_t", img_size=96,
            window_size=5, dtype=jnp.float32, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_engine_fused_encoder_path_matches_default():
    """TiledInferenceEngine with config.FUSED_ENCODER must reproduce the
    default path's region outputs (same math through the fused kernels;
    masks may differ by 1 uint8 step from float reassociation)."""
    from sam_road_tpu.config import load_config
    from sam_road_tpu.inference.engine import TiledInferenceEngine
    from sam_road_tpu.models.sam_road import init_params

    over = dict(
        SAM_VERSION="vit_t", PATCH_SIZE=64, INFER_BATCH_SIZE=8,
        INFER_PATCHES_PER_EDGE=4, SAMPLE_MARGIN=8, COMPUTE_DTYPE="float32",
        ITSC_THRESHOLD=0.9, ROAD_THRESHOLD=0.45, TOPO_THRESHOLD=0.4,
        ITSC_NMS_RADIUS=4, ROAD_NMS_RADIUS=8, NEIGHBOR_RADIUS=24,
        MAX_NEIGHBOR_QUERIES=4,
    )
    cfg = load_config(overrides=over)
    params = init_params(cfg)
    img = np.random.default_rng(3).integers(0, 255, (192, 192, 3),
                                            dtype=np.uint8)
    base = TiledInferenceEngine(cfg, params, point_bucket=16)
    nodes0, edges0, kp0, road0 = base.infer_one_img(img)

    cfg_f = load_config(overrides={**over, "FUSED_ENCODER": True})
    fused_engine = TiledInferenceEngine(cfg_f, params, point_bucket=16)
    nodes1, edges1, kp1, road1 = fused_engine.infer_one_img(img)

    assert np.abs(kp0.astype(int) - kp1.astype(int)).max() <= 1
    assert np.abs(road0.astype(int) - road1.astype(int)).max() <= 1
    assert abs(nodes0.shape[0] - nodes1.shape[0]) <= 2


@pytest.mark.slow  # ~13 s: large-grid dispatch edge; v3-kernel + engine-match
# representatives stay default
def test_fast_encoder_large_grid_global_fallback():
    """At grids whose global-attention scores exceed the whole-N VMEM
    budget (N > ~1225), _global_block_v3 must dispatch to the folded
    rel-pos + blocked/XLA attention path — the 1024px config's geometry.
    vit_t at 576px (N=1296) crosses the threshold cheaply on CPU."""
    spec = ENCODER_SPECS["vit_t"]
    enc = ImageEncoderViT(
        img_size=576, embed_dim=spec["embed_dim"], depth=spec["depth"],
        num_heads=spec["num_heads"],
        global_attn_indexes=spec["global_attn_indexes"],
        window_size=4, dtype=jnp.float32,
    )
    rng = np.random.default_rng(13)
    x = rng.normal(size=(1, 576, 576, 3)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = jax.tree.map(
        lambda p: p + 0.02 * np.random.default_rng(14).normal(size=p.shape).astype(p.dtype),
        jax.tree.map(np.asarray, params),
    )
    from sam_road_tpu.ops.attention import _VMEM_BUDGET_BYTES, _whole_bytes

    n = (576 // 16) ** 2
    hd = spec["embed_dim"] // spec["num_heads"]
    assert _whole_bytes(n, hd, hd, 4) > _VMEM_BUDGET_BYTES  # fallback engaged
    want = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    got = np.asarray(
        encoder_forward_fused(
            params, jnp.asarray(x), sam_version="vit_t", img_size=576,
            window_size=4, dtype=jnp.float32, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


@pytest.mark.slow  # ~10 s: XLA-tail knob parity; the default-config engine
# match stays default
def test_fast_encoder_xla_tail_flag_parity():
    """The XLA_TAIL A/B flag (tools/experiment_fused_encoder.py) must
    keep the same numerics as the Pallas tail kernel."""
    from sam_road_tpu.models import fast_encoder as fe

    spec = ENCODER_SPECS["vit_t"]
    enc = ImageEncoderViT(
        img_size=96, embed_dim=spec["embed_dim"], depth=spec["depth"],
        num_heads=spec["num_heads"],
        global_attn_indexes=spec["global_attn_indexes"],
        window_size=4, dtype=jnp.float32,
    )
    rng = np.random.default_rng(31)
    x = rng.normal(size=(1, 96, 96, 3)).astype(np.float32)
    params = jax.tree.map(
        np.asarray, enc.init(jax.random.PRNGKey(2), jnp.asarray(x))["params"]
    )
    base = np.asarray(encoder_forward_fused(
        params, jnp.asarray(x), sam_version="vit_t", img_size=96,
        window_size=4, dtype=jnp.float32, interpret=True,
    ))
    fe.XLA_TAIL = True
    try:
        alt = np.asarray(encoder_forward_fused(
            params, jnp.asarray(x), sam_version="vit_t", img_size=96,
            window_size=4, dtype=jnp.float32, interpret=True,
        ))
    finally:
        fe.XLA_TAIL = False
    np.testing.assert_allclose(alt, base, rtol=2e-5, atol=2e-5)
