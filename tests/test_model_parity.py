"""Numerical parity tests: flax modules + checkpoint converter vs torch
oracles. These gate the riskiest rebuild components (SURVEY.md §7 hard parts
1 and 3): decomposed rel-pos windowed attention, grid-sample bilinear
sampling, transformer-encoder semantics, and conv-transpose layout
conversion."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from sam_road_tpu.models.vit import ImageEncoderViT
from sam_road_tpu.models.toponet import TopoNet
from sam_road_tpu.models.decoder import MapDecoder
from sam_road_tpu.models.convert import convert_state_dict, overlay_params
from sam_road_tpu.ops.sampling import bilinear_sample_points

from torch_oracle import (
    OracleImageEncoderViT,
    OracleTopoNet,
    make_oracle_map_decoder,
)


def _to_np(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def test_bilinear_sampler_matches_grid_sample():
    rng = np.random.default_rng(0)
    B, H, W, D = 2, 8, 8, 5
    patch = 128
    fmap = rng.normal(size=(B, H, W, D)).astype(np.float32)
    # points spanning inside and outside the patch
    pts = rng.uniform(-10, patch + 10, size=(B, 7, 2)).astype(np.float32)

    got = np.asarray(bilinear_sample_points(jnp.asarray(fmap), jnp.asarray(pts), patch))

    t_fmap = torch.tensor(fmap).permute(0, 3, 1, 2)  # BDHW
    norm = torch.tensor(pts) / patch * 2.0 - 1.0
    sampled = torch.nn.functional.grid_sample(
        t_fmap, norm.unsqueeze(2), mode="bilinear", align_corners=False
    )
    want = sampled.squeeze(-1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_encoder_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = OracleImageEncoderViT(
        img_size=96, embed_dim=64, depth=3, num_heads=2, out_chans=32,
        window_size=4, global_attn_indexes=(1,),
    ).eval()
    # randomize params incl. pos embed / rel pos
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.05)

    sd = {f"image_encoder.{k}": v for k, v in oracle.state_dict().items()}
    conv = convert_state_dict(sd, image_size=96, global_attn_indexes=(1,))
    assert not conv["skipped"], conv["skipped"]

    enc = ImageEncoderViT(
        img_size=96, embed_dim=64, depth=3, num_heads=2, out_chans=32,
        window_size=4, global_attn_indexes=(1,), dtype=jnp.float32,
    )
    x = np.random.default_rng(1).normal(size=(2, 96, 96, 3)).astype(np.float32)
    init = _to_np(enc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"])
    merged, matched, mismatched = overlay_params(
        init, conv["params"]["image_encoder"]
    )
    assert not mismatched, mismatched

    got = np.asarray(enc.apply({"params": merged}, jnp.asarray(x)))  # NHWC
    with torch.no_grad():
        want = oracle(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_toponet_matches_torch_oracle():
    torch.manual_seed(1)
    D = 16
    oracle = OracleTopoNet(feature_dim=D).eval()
    sd = {f"topo_net.{k}": v for k, v in oracle.state_dict().items()}
    conv = convert_state_dict(sd, image_size=1024)
    assert not conv["skipped"], conv["skipped"]

    B, N, S, P = 2, 10, 3, 4
    rng = np.random.default_rng(2)
    points = rng.uniform(0, 64, size=(B, N, 2)).astype(np.float32)
    feats = rng.normal(size=(B, N, D)).astype(np.float32)
    pairs = rng.integers(0, N, size=(B, S, P, 2)).astype(np.int32)
    valid = rng.random((B, S, P)) > 0.3
    valid[0, 0, :] = False  # exercise the all-invalid flip

    net = TopoNet(feature_dim=D, dtype=jnp.float32)
    init = _to_np(
        net.init(
            jax.random.PRNGKey(0),
            jnp.asarray(points), jnp.asarray(feats), jnp.asarray(pairs),
            jnp.asarray(valid),
        )["params"]
    )
    merged, matched, mismatched = overlay_params(init, conv["params"]["topo_net"])
    assert not mismatched, mismatched

    logits, scores = net.apply(
        {"params": merged},
        jnp.asarray(points), jnp.asarray(feats), jnp.asarray(pairs),
        jnp.asarray(valid),
    )
    with torch.no_grad():
        t_logits, t_scores = oracle(
            torch.tensor(points), torch.tensor(feats),
            torch.tensor(pairs.astype(np.int64)), torch.tensor(valid),
        )
    np.testing.assert_allclose(
        np.asarray(logits), t_logits.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(scores), t_scores.numpy(), rtol=1e-4, atol=1e-4
    )


def test_map_decoder_matches_torch_oracle():
    torch.manual_seed(2)
    oracle = make_oracle_map_decoder(in_dim=32).eval()
    sd = {f"map_decoder.{k}": v for k, v in oracle.state_dict().items()}
    conv = convert_state_dict(sd, image_size=1024)
    assert not conv["skipped"], conv["skipped"]

    x = np.random.default_rng(3).normal(size=(2, 4, 4, 32)).astype(np.float32)
    dec = MapDecoder(dtype=jnp.float32)
    init = _to_np(dec.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"])
    merged, matched, mismatched = overlay_params(init, conv["params"]["map_decoder"])
    assert not mismatched, mismatched

    got = np.asarray(dec.apply({"params": merged}, jnp.asarray(x)))
    with torch.no_grad():
        want = (
            oracle(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pos_embed_resize_matches_reference_path():
    # Build a fake 1024-sized SAM encoder state dict; convert for 512 and
    # check shapes follow the reference resize rule (reference:
    # model.py:392-411).
    torch.manual_seed(3)
    grid_1024, grid_512 = 64, 32
    hd = 8
    sd = {
        "image_encoder.pos_embed": torch.randn(1, grid_1024, grid_1024, 16),
        "image_encoder.blocks.2.attn.rel_pos_h": torch.randn(2 * grid_1024 - 1, hd),
        "image_encoder.blocks.2.attn.rel_pos_w": torch.randn(2 * grid_1024 - 1, hd),
        "image_encoder.blocks.0.attn.rel_pos_h": torch.randn(27, hd),
    }
    conv = convert_state_dict(sd, image_size=512, global_attn_indexes=(2,))
    p = conv["params"]["image_encoder"]
    assert p["pos_embed"].shape == (1, grid_512, grid_512, 16)
    assert p["blocks_2"]["attn"]["rel_pos_h"].shape == (2 * grid_512 - 1, hd)
    assert p["blocks_0"]["attn"]["rel_pos_h"].shape == (27, hd)  # window untouched


def test_bfloat16_encoder_close_to_fp32():
    # bf16 compute path stays within bf16 tolerance of fp32.
    enc32 = ImageEncoderViT(img_size=64, embed_dim=64, depth=2, num_heads=2,
                            out_chans=32, window_size=4, global_attn_indexes=(1,),
                            dtype=jnp.float32)
    x = np.random.default_rng(4).normal(size=(1, 64, 64, 3)).astype(np.float32)
    params = enc32.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    y32 = np.asarray(enc32.apply({"params": params}, jnp.asarray(x)))
    enc16 = ImageEncoderViT(img_size=64, embed_dim=64, depth=2, num_heads=2,
                            out_chans=32, window_size=4, global_attn_indexes=(1,),
                            dtype=jnp.bfloat16)
    y16 = np.asarray(enc16.apply({"params": params}, jnp.asarray(x)), dtype=np.float32)
    assert np.abs(y16 - y32).mean() < 0.05


@pytest.mark.slow
def test_flagship_vitb_512_matches_torch_oracle():
    """Flagship geometry parity (VERDICT r1 missing #2): the REAL ViT-B shape
    — depth 12, dim 768, heads 12, window 14, 512px input = 32x32 token grid
    padded 32->42 inside every windowed block (reference: model.py:245-258) —
    with weights arriving through the real checkpoint path: a full-sized
    1024px SAM layout resized 1024->512 (pos embed + global-attn rel-pos,
    reference: model.py:392-411) then layout-converted. A window-14 indexing
    or rel-pos-resize bug at this geometry cannot pass this test."""
    from test_sam_ckpt_conversion import _fake_sam_vit_b_state_dict

    torch.manual_seed(11)
    sd = _fake_sam_vit_b_state_dict()
    # scale to keep 12 blocks of activations O(1): small weights, LN gains ~1
    with torch.no_grad():
        for k, v in sd.items():
            v.copy_(torch.randn_like(v) * 0.02)
            if (".norm1.weight" in k or ".norm2.weight" in k
                    or k.endswith("neck.1.weight") or k.endswith("neck.3.weight")):
                v.add_(1.0)

    # --- JAX side: full converter (resize + layout) ---
    from sam_road_tpu.models.convert import convert_state_dict, resize_sam_pos_embed

    conv = convert_state_dict(dict(sd), image_size=512,
                              global_attn_indexes=(2, 5, 8, 11))
    enc = ImageEncoderViT(
        img_size=512, embed_dim=768, depth=12, num_heads=12, out_chans=256,
        window_size=14, global_attn_indexes=(2, 5, 8, 11), dtype=jnp.float32,
    )
    x = np.random.default_rng(5).normal(size=(1, 512, 512, 3)).astype(np.float32)
    shapes = jax.eval_shape(enc.init, jax.random.PRNGKey(0), jnp.asarray(x))
    init = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)["params"]
    merged, matched, mismatched = overlay_params(init, conv["params"]["image_encoder"])
    assert not mismatched, mismatched

    got = np.asarray(jax.jit(lambda p, x: enc.apply({"params": p}, x))(
        merged, jnp.asarray(x)))

    # --- torch side: same resize rule feeding the oracle at 512px ---
    resized = resize_sam_pos_embed(dict(sd), 512, 16, (2, 5, 8, 11))
    oracle = OracleImageEncoderViT(
        img_size=512, embed_dim=768, depth=12, num_heads=12, out_chans=256,
        window_size=14, global_attn_indexes=(2, 5, 8, 11),
    ).eval()
    oracle_sd = {
        k[len("image_encoder."):]: v
        for k, v in resized.items()
        if k.startswith("image_encoder.")
    }
    oracle.load_state_dict(oracle_sd)
    with torch.no_grad():
        want = oracle(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    assert got.shape == want.shape == (1, 32, 32, 256)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # ~26 s: vit_l/h spec builds at full embed dims; default
# tier covers the encoder via the vit_t torch-oracle parity tests.
def test_encoder_specs_all_sizes():
    """vit_l / vit_h specs build with correct rel-pos table shapes and run
    a tiny forward (64px keeps CPU time bounded)."""
    from sam_road_tpu.models.vit import ENCODER_SPECS

    for name in ("vit_l", "vit_h"):
        spec = ENCODER_SPECS[name]
        enc = ImageEncoderViT(
            img_size=64, embed_dim=spec["embed_dim"], depth=2,
            num_heads=spec["num_heads"],
            global_attn_indexes=(1,), dtype=jnp.float32,
        )
        x = jnp.zeros((1, 64, 64, 3))
        params = enc.init(jax.random.PRNGKey(0), x)["params"]
        hd = spec["embed_dim"] // spec["num_heads"]
        # windowed block 0: table 2*14-1; global block 1: 2*(64//16)-1
        assert params["blocks_0"]["attn"]["rel_pos_h"].shape == (27, hd)
        assert params["blocks_1"]["attn"]["rel_pos_h"].shape == (7, hd)
        y = enc.apply({"params": params}, x)
        assert y.shape == (1, 4, 4, 256)
    assert ENCODER_SPECS["vit_l"]["depth"] == 24
    assert ENCODER_SPECS["vit_h"]["depth"] == 32
    assert ENCODER_SPECS["vit_h"]["global_attn_indexes"] == (7, 15, 23, 31)
