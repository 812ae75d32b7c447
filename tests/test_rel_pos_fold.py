"""fold_rel_pos_qk (the shared one-matmul rel-pos fold) vs the textbook
broadcast-add formulation it replaces (reference applies decomposed rel-pos
as scores.reshape(B, nH, H, W, H, W) + Rh[qh, kh][..., None] +
Rw[qw, kw][..., None, :]). One helper serves models/vit.py Attention, the
fused encoder, and the sequence-parallel encoder — this pins its math
directly, including row-sharded query subsets."""

import numpy as np
import jax.numpy as jnp

from sam_road_tpu.models.vit import _get_rel_pos_table, fold_rel_pos_qk


def _naive_scores(q, k, rel_h, rel_w, hw, scale):
    """Textbook decomposed rel-pos attention scores, fp64 numpy."""
    H, W = hw
    G, nH, N, hd = q.shape
    Rh = np.asarray(_get_rel_pos_table(H, jnp.asarray(rel_h)))  # [H, H, hd]
    Rw = np.asarray(_get_rel_pos_table(W, jnp.asarray(rel_w)))  # [W, W, hd]
    scores = np.einsum("gnqd,gnkd->gnqk", q, k) * scale
    r_q = q.reshape(G, nH, H, W, hd)
    bias_h = np.einsum("gnhwc,hkc->gnhwk", r_q, Rh)  # [G,nH,H,W,Hk]
    bias_w = np.einsum("gnhwc,wkc->gnhwk", r_q, Rw)  # [G,nH,H,W,Wk]
    s6 = scores.reshape(G, nH, H, W, H, W)
    s6 = s6 + bias_h[..., :, None] + bias_w[..., None, :]
    return s6.reshape(G, nH, H * W, H * W)


def test_fold_matches_naive_full_grid():
    H, W, nH, hd, G = 5, 4, 2, 8, 3
    rng = np.random.default_rng(0)
    q = rng.normal(size=(G, nH, H * W, hd))
    k = rng.normal(size=(G, nH, H * W, hd))
    rel_h = rng.normal(size=(2 * H - 1, hd))
    rel_w = rng.normal(size=(2 * W - 1, hd))
    scale = hd**-0.5

    want = _naive_scores(q, k, rel_h, rel_w, (H, W), scale)

    Rh = _get_rel_pos_table(H, jnp.asarray(rel_h, jnp.float32))
    Rw = _get_rel_pos_table(W, jnp.asarray(rel_w, jnp.float32))
    q_aug, k_aug = fold_rel_pos_qk(
        jnp.asarray(q, jnp.float32), jnp.asarray(k, jnp.float32),
        Rh, Rw, (H, W), scale,
    )
    got = np.einsum("gnqd,gnkd->gnqk", np.asarray(q_aug), np.asarray(k_aug))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_fold_row_sharded_queries():
    """A row-aligned query shard with row0 offset must reproduce the
    corresponding row block of the full-grid scores (the sequence-parallel
    contract)."""
    H, W, nH, hd = 6, 3, 2, 4
    rng = np.random.default_rng(1)
    q = rng.normal(size=(1, nH, H * W, hd))
    k = rng.normal(size=(1, nH, H * W, hd))
    rel_h = rng.normal(size=(2 * H - 1, hd))
    rel_w = rng.normal(size=(2 * W - 1, hd))
    scale = hd**-0.5
    full = _naive_scores(q, k, rel_h, rel_w, (H, W), scale)

    Rh = _get_rel_pos_table(H, jnp.asarray(rel_h, jnp.float32))
    Rw = _get_rel_pos_table(W, jnp.asarray(rel_w, jnp.float32))
    rows_per_shard = 2
    for row0 in (0, 2, 4):
        q_shard = jnp.asarray(
            q[:, :, row0 * W : (row0 + rows_per_shard) * W], jnp.float32
        )
        q_aug, k_aug = fold_rel_pos_qk(
            q_shard, jnp.asarray(k, jnp.float32), Rh, Rw, (H, W), scale,
            row0=row0,
        )
        got = np.einsum("gnqd,gnkd->gnqk", np.asarray(q_aug), np.asarray(k_aug))
        want = full[:, :, row0 * W : (row0 + rows_per_shard) * W]
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
