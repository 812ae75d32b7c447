"""Unit pins for the token-tiled fused LN kernels (interpret mode).

Each kernel is compared against the naive jnp formulation it replaces, at
full f32 precision, on shapes that exercise token tiling (M > tile) and
hidden chunking. Reference semantics: /root/reference/sam/.../ViT block
tail (attn proj + residual + LN + MLP + residual).
"""

import numpy as np

import jax
import jax.numpy as jnp

from sam_road_tpu.ops.fused_ln import (
    ln_dense,
    ln_mlp_residual,
    proj_ln_mlp_residual,
)


def _ln(x, s, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * s + b


def _gelu(x):
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def test_ln_dense_matches_naive():
    rng = np.random.default_rng(0)
    M, C, F = 64, 32, 96
    x = rng.normal(size=(M, C)).astype(np.float32)
    s, b = rng.normal(size=C).astype(np.float32), rng.normal(size=C).astype(np.float32)
    w = rng.normal(size=(C, F)).astype(np.float32) * 0.1
    bias = rng.normal(size=F).astype(np.float32)
    got = np.asarray(ln_dense(jnp.asarray(x), s, b, w, bias, tile=16,
                              interpret=True))
    want = _ln(x, s, b) @ w + bias
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_proj_ln_mlp_residual_matches_naive():
    """out = x1 + W2 gelu(W1 LN(x1) + b1) + b2 with x1 = x + a @ Wp + bp,
    tiled tokens and chunked hidden — the whole post-attention tail."""
    rng = np.random.default_rng(1)
    M, C, H = 48, 32, 128
    x = rng.normal(size=(M, C)).astype(np.float32)
    a = rng.normal(size=(M, C)).astype(np.float32)
    wp = rng.normal(size=(C, C)).astype(np.float32) * 0.1
    bp = rng.normal(size=C).astype(np.float32)
    s, b = rng.normal(size=C).astype(np.float32), rng.normal(size=C).astype(np.float32)
    w1 = rng.normal(size=(C, H)).astype(np.float32) * 0.1
    b1 = rng.normal(size=H).astype(np.float32)
    w2 = rng.normal(size=(H, C)).astype(np.float32) * 0.1
    b2 = rng.normal(size=C).astype(np.float32)

    got = np.asarray(proj_ln_mlp_residual(
        jnp.asarray(x), jnp.asarray(a), wp, bp, s, b, w1, b1, w2, b2,
        tile=16, chunks=4, interpret=True,
    ))
    x1 = x + a @ wp + bp
    want = x1 + _gelu(_ln(x1, s, b) @ w1 + b1) @ w2 + b2
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)

    # and the pre-fusion two-kernel formulation agrees (same chunking)
    two = np.asarray(ln_mlp_residual(
        jnp.asarray(x1), s, b, w1, b1, w2, b2, tile=16, chunks=4,
        interpret=True,
    ))
    np.testing.assert_allclose(got, two, rtol=3e-5, atol=3e-5)
