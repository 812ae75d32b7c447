"""Fused-kernel encoder parity vs the flax encoder (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam_road_tpu.models.fast_encoder import encoder_forward_fused
from sam_road_tpu.models.vit import ENCODER_SPECS, ImageEncoderViT


def test_fast_encoder_matches_flax_vit_t():
    spec = ENCODER_SPECS["vit_t"]
    enc = ImageEncoderViT(
        img_size=96, embed_dim=spec["embed_dim"], depth=spec["depth"],
        num_heads=spec["num_heads"],
        global_attn_indexes=spec["global_attn_indexes"],
        window_size=4, dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 96, 96, 3)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    # randomize rel pos (zeros-init hides bias bugs)
    params = jax.tree.map(
        lambda p: p + 0.02 * np.random.default_rng(1).normal(size=p.shape).astype(p.dtype),
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


def test_fast_encoder_windowed_run_chaining():
    """Two consecutive windowed blocks chained in window layout must equal
    the unpartition/repartition reference path (vit_t has blocks [w, g];
    use a custom 3-block all-windowed-then-global layout via vit_t-like
    params by testing a 4-deep variant)."""
    enc = ImageEncoderViT(
        img_size=96, embed_dim=64, depth=4, num_heads=2,
        global_attn_indexes=(3,), window_size=4, dtype=jnp.float32,
    )
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 96, 96, 3)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(3), jnp.asarray(x))["params"]
    params = jax.tree.map(
        lambda p: p + 0.02 * np.random.default_rng(4).normal(size=p.shape).astype(p.dtype),
        jax.tree.map(np.asarray, params),
    )
    want = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    # depth-4 layout: blocks 0-2 windowed (one chained run), block 3 global
    spec_patch = dict(ENCODER_SPECS["vit_t"])
    ENCODER_SPECS["_test4"] = dict(embed_dim=64, depth=4, num_heads=2,
                                   global_attn_indexes=(3,))
    try:
        got = np.asarray(
            encoder_forward_fused(
                params, jnp.asarray(x), sam_version="_test4", img_size=96,
                window_size=4, dtype=jnp.float32, interpret=True,
            )
        )
    finally:
        del ENCODER_SPECS["_test4"]
        ENCODER_SPECS["vit_t"] = spec_patch
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fast_encoder_grouped_windows():
    spec = ENCODER_SPECS["vit_t"]
    enc = ImageEncoderViT(
        img_size=96, embed_dim=spec["embed_dim"], depth=spec["depth"],
        num_heads=spec["num_heads"],
        global_attn_indexes=spec["global_attn_indexes"],
        window_size=4, dtype=jnp.float32,
    )
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 96, 96, 3)).astype(np.float32)
    params = jax.tree.map(
        np.asarray, enc.init(jax.random.PRNGKey(6), jnp.asarray(x))["params"]
    )
    want = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    got = np.asarray(
        encoder_forward_fused(
            params, jnp.asarray(x), sam_version="vit_t", img_size=96,
            window_size=4, dtype=jnp.float32, interpret=True, group=3,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
