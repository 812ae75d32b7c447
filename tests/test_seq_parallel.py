"""Sequence-parallel (token-sharded) encoder vs the flax encoder.

The SP path (parallel/seq_parallel.py) shards the token-grid rows across the
mesh: patch embed / LN / MLP run on local rows, windowed attention computes a
1/n window slice per device, global attention uses gathered-KV. Output must
match ImageEncoderViT exactly (same fp32 op order per token).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_road_tpu.models.vit import ImageEncoderViT
from sam_road_tpu.parallel.mesh import make_mesh
from sam_road_tpu.parallel.seq_parallel import encoder_forward_sp


def _make(img_size, n_dev, window_size=4):
    enc = ImageEncoderViT(
        img_size=img_size,
        embed_dim=64,
        depth=2,
        num_heads=2,
        window_size=window_size,
        global_attn_indexes=(1,),
        use_flash=False,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, img_size, img_size, 3)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    # non-degenerate rel-pos tables (zeros-init would hide rel-pos bugs)
    params = jax.tree.map(
        lambda p: p
        + 0.05 * np.random.default_rng(1).normal(size=p.shape).astype(np.float32),
        jax.tree.map(np.asarray, params),
    )
    ref = enc.apply({"params": params}, x)
    mesh = make_mesh(n_dev, jax.devices()[:n_dev])
    out = encoder_forward_sp(
        params, x, mesh, axis="dp", sam_version="vit_t", img_size=img_size,
        window_size=window_size, dtype=jnp.float32,
    )
    return np.asarray(ref), np.asarray(out)


def test_sp_encoder_aligned_grid():
    """grid 8, window 4 — no window padding; 8-way row sharding."""
    ref, out = _make(128, 8)
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-5)


def test_sp_encoder_padded_windows():
    """grid 6, window 4 — exercises the pad-to-8 window path; 2-way mesh
    (6 rows must divide over the mesh)."""
    ref, out = _make(96, 2)
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-5)


def test_sp_encoder_single_device_degenerates():
    ref, out = _make(128, 1)
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-5)


def test_sp_encoder_rejects_nondivisible_grid():
    """grid 6 over 8 devices can't band evenly — must fail with the clear
    divisibility error, not a shape crash mid-trace."""
    enc = ImageEncoderViT(
        img_size=96, embed_dim=64, depth=2, num_heads=2, window_size=4,
        global_attn_indexes=(1,), use_flash=False, dtype=jnp.float32,
    )
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    with pytest.raises(AssertionError, match="must divide"):
        encoder_forward_sp(
            params, x, make_mesh(8), axis="dp", sam_version="vit_t",
            img_size=96, window_size=4, dtype=jnp.float32,
        )


@pytest.mark.slow
def test_sp_encoder_16k_tokens_2048px_grid():
    """16384 tokens (2048px patch -> 128x128 token grid) across 8 devices
    with the flagship window size 14 (grid 128 pads to 140): the long-
    context geometry of SURVEY §2.2's SP row, exercising sharded global
    scores + padded window slicing at scale. vit_t dims keep CPU runtime
    sane; the sharding machinery is identical at any width."""
    enc = ImageEncoderViT(
        img_size=2048, embed_dim=64, depth=2, num_heads=2, window_size=14,
        global_attn_indexes=(1,), use_flash=False, dtype=jnp.float32,
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 2048, 2048, 3)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda p: p
        + 0.05 * np.random.default_rng(4).normal(size=p.shape).astype(np.float32),
        jax.tree.map(np.asarray, params),
    )
    ref = np.asarray(enc.apply({"params": params}, x))
    out = np.asarray(encoder_forward_sp(
        params, x, make_mesh(8), axis="dp", sam_version="vit_t",
        img_size=2048, window_size=14, dtype=jnp.float32,
    ))
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-5)
