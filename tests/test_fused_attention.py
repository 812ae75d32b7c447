"""Pallas fused-attention parity vs plain XLA attention (interpret mode on
CPU; the same kernel compiles on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from sam_road_tpu.ops.attention import fused_attention


def _xla_attention(q, k, v):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)


def test_fused_attention_matches_xla():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 3, 256, 32)).astype(np.float32)
    k = rng.normal(size=(2, 3, 256, 32)).astype(np.float32)
    v = rng.normal(size=(2, 3, 256, 16)).astype(np.float32)
    got = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), True))
    want = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_attention_grads_match_xla():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 256, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 256, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 8)).astype(np.float32))

    def loss_fused(q, k, v):
        return fused_attention(q, k, v, True).sum()

    def loss_xla(q, k, v):
        return _xla_attention(q, k, v).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_blocked_flash_4096_tokens_matches_xla():
    """The 1024px config's global blocks run 4096 tokens — far past the
    whole-N kernel's VMEM budget (VERDICT r1 weak #4). The blocked kernel
    (kv-tiled running softmax) must engage and match XLA."""
    from sam_road_tpu.ops import attention

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 2, 4096, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 4096, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 4096, 8)).astype(np.float32))
    # budget check must route this to the blocked path
    assert attention._whole_bytes(4096, 16, 8, 4) > attention._VMEM_BUDGET_BYTES
    got = np.asarray(fused_attention(q, k, v, True))
    want = np.asarray(_xla_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_large_untileable_n_falls_back_to_xla():
    """Large N not divisible by 128 cannot be tiled; fused_attention must
    still return correct results via its internal XLA fallback."""
    from sam_road_tpu.ops import attention

    old = attention._VMEM_BUDGET_BYTES
    attention._VMEM_BUDGET_BYTES = 1  # force past the whole-N path
    try:
        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.normal(size=(1, 1, 196, 8)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 1, 196, 8)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 1, 196, 4)).astype(np.float32))
        got = np.asarray(fused_attention(q, k, v, True))
        want = np.asarray(_xla_attention(q, k, v))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        attention._VMEM_BUDGET_BYTES = old


def test_blocked_flash_uneven_q_kv_blocks():
    """N=1536 exercises bq=512 with nk=1 vs nk>1 paths (N % 1024 != 0 ->
    bk=512, nk=3)."""
    rng = np.random.default_rng(5)
    from sam_road_tpu.ops import attention

    old = attention._VMEM_BUDGET_BYTES
    attention._VMEM_BUDGET_BYTES = 1
    try:
        q = jnp.asarray(rng.normal(size=(1, 1, 1536, 16)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 1, 1536, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 1, 1536, 8)).astype(np.float32))
        got = np.asarray(fused_attention(q, k, v, True))
        want = np.asarray(_xla_attention(q, k, v))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        attention._VMEM_BUDGET_BYTES = old


def test_encoder_flash_path_matches_xla_path():
    """512-token global attention through the full encoder: flash vs XLA."""
    from sam_road_tpu.models.vit import ImageEncoderViT

    kw = dict(img_size=384, patch_size=16, embed_dim=64, depth=2, num_heads=2,
              out_chans=32, window_size=4, global_attn_indexes=(1,),
              dtype=jnp.float32)
    # grid 24x24 = 576 tokens >= 256 -> flash path on the global block
    enc_flash = ImageEncoderViT(use_flash="always", **kw)
    enc_xla = ImageEncoderViT(use_flash=False, **kw)
    x = np.random.default_rng(2).normal(size=(1, 384, 384, 3)).astype(np.float32)
    params = enc_xla.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    y_xla = np.asarray(enc_xla.apply({"params": params}, jnp.asarray(x)))
    y_flash = np.asarray(enc_flash.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_flash, y_xla, rtol=1e-4, atol=1e-4)


def test_window_attention_batched_matches_oracle_math():
    """window_attention_relpos_batched (heads as dot_general batch dims)
    vs a plain-XLA textbook formulation of decomposed rel-pos windowed
    attention — exact math, fp32, interpret mode."""
    from sam_road_tpu.ops.fused_block import (
        window_attention_relpos,
        window_attention_relpos_batched,
    )

    win, heads, hd, nW = 4, 2, 8, 6
    N = win * win
    C = heads * hd
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(nW, heads, N, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(nW, heads, N, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(nW, heads, N, hd)), jnp.float32)
    rh = jnp.asarray(rng.normal(size=(2 * win - 1, hd)) * 0.1, jnp.float32)
    rw = jnp.asarray(rng.normal(size=(2 * win - 1, hd)) * 0.1, jnp.float32)

    # reference: the per-head-loop kernel (itself oracle-pinned through the
    # v3 encoder parity tests) on the qkv-concat layout
    qkv = jnp.concatenate(
        [t.transpose(0, 2, 1, 3).reshape(nW, N, C) for t in (q, k, v)],
        axis=-1,
    )
    want = window_attention_relpos(qkv, rh, rw, win, heads, interpret=True)
    # grouped per-head programs must agree with group=1 exactly
    for g in (2, 3):
        got_g = window_attention_relpos(qkv, rh, rw, win, heads,
                                        interpret=True, group=g)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
    want = want.reshape(nW, N, heads, hd).transpose(0, 2, 1, 3)

    for group in (1, 2, 3):
        got = window_attention_relpos_batched(
            q, k, v, rh, rw, win, group=group, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"group={group}",
        )


def test_window_attention_rows_matches_relpos_kernel():
    """The production rows kernel (precomputed bias rows) must equal the
    in-kernel-reduce reference kernel exactly, for any group size."""
    from sam_road_tpu.ops.fused_block import (
        window_attention_relpos,
        window_attention_rows,
    )

    win, heads, hd, nW = 4, 2, 8, 6
    N = win * win
    C = heads * hd
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(nW, N, 3 * C)), jnp.float32)
    rh = jnp.asarray(rng.normal(size=(2 * win - 1, hd)) * 0.1, jnp.float32)
    rw = jnp.asarray(rng.normal(size=(2 * win - 1, hd)) * 0.1, jnp.float32)
    want = window_attention_relpos(qkv, rh, rw, win, heads, interpret=True)

    coords = np.arange(win)[:, None] - np.arange(win)[None, :] + win - 1
    Rh = jnp.asarray(rh)[coords]
    Rw = jnp.asarray(rw)[coords]
    q = qkv[..., :C].reshape(nW, win, win, heads, hd)
    bh = jnp.einsum("wijhc,iac->whija", q, Rh).reshape(nW, heads, N, win)
    bw = jnp.einsum("wijhc,jac->whija", q, Rw).reshape(nW, heads, N, win)
    for group in (1, 2, 3):
        got = window_attention_rows(qkv, bh, bw, win, heads, interpret=True,
                                    group=group)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"group={group}",
        )


def test_window_attention_rows_grid_matches_rows_kernel():
    """The grid-layout kernel (window partition in the block index maps,
    qkv bias added in-kernel) must reproduce the window-layout rows kernel
    on a padded grid whose pad tokens are zero pre-bias."""
    from sam_road_tpu.ops.fused_block import (
        window_attention_rows,
        window_attention_rows_grid,
    )

    win, heads, hd = 4, 2, 8
    B, H, W = 2, 6, 10  # pads to 8 x 12 -> nI=2, nJ=3
    N = win * win
    C = heads * hd
    rng = np.random.default_rng(21)
    qkv_nb = jnp.asarray(rng.normal(size=(B, H, W, 3 * C)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(3 * C,)) * 0.2, jnp.float32)
    rh = jnp.asarray(rng.normal(size=(2 * win - 1, hd)) * 0.1, jnp.float32)
    rw = jnp.asarray(rng.normal(size=(2 * win - 1, hd)) * 0.1, jnp.float32)
    pad_h, pad_w = (win - H % win) % win, (win - W % win) % win
    Hp, Wp = H + pad_h, W + pad_w
    nI, nJ = Hp // win, Wp // win

    # reference: explicit pad + bias + window transpose -> rows kernel
    qkv_p = jnp.pad(qkv_nb, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    qkv_b = qkv_p + bias
    qkv_w = qkv_b.reshape(B, nI, win, nJ, win, 3 * C)
    qkv_w = qkv_w.transpose(0, 1, 3, 2, 4, 5).reshape(-1, N, 3 * C)
    coords = np.arange(win)[:, None] - np.arange(win)[None, :] + win - 1
    Rh = jnp.asarray(rh)[coords]
    Rw = jnp.asarray(rw)[coords]
    qw = qkv_w[..., :C].reshape(-1, win, win, heads, hd)
    nW = qw.shape[0]
    bh_w = jnp.einsum("wijhc,iac->whija", qw, Rh).reshape(nW, heads, N, win)
    bw_w = jnp.einsum("wijhc,jac->whija", qw, Rw).reshape(nW, heads, N, win)
    want_w = window_attention_rows(qkv_w, bh_w, bw_w, win, heads,
                                   interpret=True)
    want = want_w.reshape(B, nI, nJ, win, win, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)

    # grid kernel: bias-free padded grid, bias rows with analytic qb.R term
    q_p = qkv_p[..., :C].reshape(B, nI, win, nJ, win, heads, hd)
    bias_q = bias[:C].reshape(heads, hd)
    bh = jnp.einsum("bIiJjhc,iac->bIJhija", q_p, Rh)
    bw = jnp.einsum("bIiJjhc,jac->bIJhija", q_p, Rw)
    bh = bh + jnp.einsum("hc,iac->hia", bias_q, Rh)[
        None, None, None, :, :, None, :]
    bw = bw + jnp.einsum("hc,jac->hja", bias_q, Rw)[
        None, None, None, :, None, :, :]
    bh = bh.reshape(B, nI, nJ, heads, N, win)
    bw = bw.reshape(B, nI, nJ, heads, N, win)
    got = window_attention_rows_grid(qkv_p, bias, bh, bw, win, heads,
                                     interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
    )

    # rolled-rows granularity (fori_loop over a row's windows) must agree
    got_r = window_attention_rows_grid(qkv_p, bias, bh, bw, win, heads,
                                       interpret=True, rolled_rows=True)
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(got))

    # batch-grouped rolled granularity must agree too (NOTE: like
    # rolled_rows, it fails to compile on the current platform's AOT
    # helper — kept for parity + other toolchains, docs/DESIGN.md
    # round-4 negative results)
    for g in (2, 4):
        got_g = window_attention_rows_grid(qkv_p, bias, bh, bw, win, heads,
                                           interpret=True, group_batch=g)
        np.testing.assert_array_equal(np.asarray(got_g), np.asarray(got))
