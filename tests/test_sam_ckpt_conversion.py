"""Full-shape SAM checkpoint conversion: build a .pth laid out exactly like
the official sam_vit_b_01ec64.pth (1024px pos embeds, fused qkv, neck,
prompt encoder + mask decoder) and verify load_and_convert covers every
encoder parameter at PATCH_SIZE 512 with the resize path engaged."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _fake_sam_state_dict(dim, depth, heads, global_idx):
    """Full-shape state dict laid out like an official 1024px SAM ckpt."""
    sd = {}
    hd = dim // heads
    grid = 64  # 1024 / 16
    sd["image_encoder.pos_embed"] = torch.randn(1, grid, grid, dim)
    sd["image_encoder.patch_embed.proj.weight"] = torch.randn(dim, 3, 16, 16)
    sd["image_encoder.patch_embed.proj.bias"] = torch.randn(dim)
    for i in range(depth):
        p = f"image_encoder.blocks.{i}"
        sd[f"{p}.norm1.weight"] = torch.randn(dim)
        sd[f"{p}.norm1.bias"] = torch.randn(dim)
        sd[f"{p}.norm2.weight"] = torch.randn(dim)
        sd[f"{p}.norm2.bias"] = torch.randn(dim)
        sd[f"{p}.attn.qkv.weight"] = torch.randn(3 * dim, dim)
        sd[f"{p}.attn.qkv.bias"] = torch.randn(3 * dim)
        sd[f"{p}.attn.proj.weight"] = torch.randn(dim, dim)
        sd[f"{p}.attn.proj.bias"] = torch.randn(dim)
        size = 2 * grid - 1 if i in global_idx else 27
        sd[f"{p}.attn.rel_pos_h"] = torch.randn(size, hd)
        sd[f"{p}.attn.rel_pos_w"] = torch.randn(size, hd)
        sd[f"{p}.mlp.lin1.weight"] = torch.randn(4 * dim, dim)
        sd[f"{p}.mlp.lin1.bias"] = torch.randn(4 * dim)
        sd[f"{p}.mlp.lin2.weight"] = torch.randn(dim, 4 * dim)
        sd[f"{p}.mlp.lin2.bias"] = torch.randn(dim)
    sd["image_encoder.neck.0.weight"] = torch.randn(256, dim, 1, 1)
    sd["image_encoder.neck.1.weight"] = torch.randn(256)
    sd["image_encoder.neck.1.bias"] = torch.randn(256)
    sd["image_encoder.neck.2.weight"] = torch.randn(256, 256, 3, 3)
    sd["image_encoder.neck.3.weight"] = torch.randn(256)
    sd["image_encoder.neck.3.bias"] = torch.randn(256)
    return sd


def _fake_sam_vit_b_state_dict():
    """Tensor shapes of the official SAM ViT-B checkpoint."""
    sd = _fake_sam_state_dict(768, 12, 12, {2, 5, 8, 11})
    # a few prompt-encoder / mask-decoder entries (present in real ckpts)
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = torch.randn(2, 128)
    sd["prompt_encoder.no_mask_embed.weight"] = torch.randn(1, 256)
    sd["prompt_encoder.point_embeddings.0.weight"] = torch.randn(1, 256)
    sd["mask_decoder.iou_token.weight"] = torch.randn(1, 256)
    sd["mask_decoder.mask_tokens.weight"] = torch.randn(4, 256)
    return sd


@pytest.mark.slow  # ~40 s warm: full-shape vit_b fake-ckpt conversion; the
# default tier keeps converter coverage via the lightning-ckpt+LoRA and
# MAE-overlay conversions below (same machinery, smaller tensors).
def test_fake_sam_vit_b_converts_fully(tmp_path):
    from sam_road_tpu.config import load_config
    from sam_road_tpu.models.convert import load_and_convert

    sd = _fake_sam_vit_b_state_dict()
    path = tmp_path / "sam_vit_b_fake.pth"
    torch.save(sd, str(path))

    cfg = load_config(
        overrides=dict(SAM_VERSION="vit_b", PATCH_SIZE=512,
                       COMPUTE_DTYPE="float32")
    )
    params, matched, mismatched = load_and_convert(str(path), cfg)

    # every encoder param must match after the 1024 -> 512 resize
    enc_mismatch = [m for m in mismatched if m.startswith("image_encoder")]
    assert not enc_mismatch, enc_mismatch
    # pos embed resized to the 512px grid
    assert params["image_encoder"]["pos_embed"].shape == (1, 32, 32, 768)
    # global-attn rel-pos tables resized to 2*32-1; windowed untouched
    assert params["image_encoder"]["blocks_2"]["attn"]["rel_pos_h"].shape == (63, 64)
    assert params["image_encoder"]["blocks_0"]["attn"]["rel_pos_h"].shape == (27, 64)
    # decoder/toponet params are fresh (not in a raw SAM ckpt)
    assert any(m.startswith("map_decoder") for m in mismatched)
    assert any(m.startswith("topo_net") for m in mismatched)
    # converted values survive the layout transposes
    np.testing.assert_allclose(
        params["image_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"],
        sd["image_encoder.blocks.0.attn.qkv.weight"].numpy().T,
        rtol=1e-6,
    )


@pytest.mark.slow  # ~4 min: vit_l/h full-shape conversion (vit_b stays in default set)
@pytest.mark.parametrize(
    "version,dim,depth,heads,global_idx,quirk_windowed",
    [
        # reference global_attn_indexes: model.py:197-218. The resize's
        # substring match (reference model.py:406: `str(i) in k`) also
        # catches WINDOWED blocks whose index contains a global index as a
        # substring — their (27, hd) tables get interpolated to the global
        # size and then DROPPED at the name+shape overlay (reference
        # model.py:379-383 keeps init on shape mismatch). vit_b (depth 12)
        # is unaffected; vit_l loses block 15 ("5"), vit_h blocks 17/27
        # ("7").
        ("vit_l", 1024, 24, 16, (5, 11, 17, 23), (15,)),
        ("vit_h", 1280, 32, 16, (7, 15, 23, 31), (17, 27)),
    ],
)
def test_fake_sam_vit_lh_convert_with_resize_quirk(
    tmp_path, version, dim, depth, heads, global_idx, quirk_windowed
):
    """vit_l / vit_h layouts through the converter at PATCH_SIZE 256
    (configs/toponet_vitl_256.yaml, toponet_vith_256.yaml), asserting the
    1024->256 resize path and the bug-for-bug substring-match quirk."""
    from sam_road_tpu.config import load_config
    from sam_road_tpu.models.convert import load_and_convert

    sd = _fake_sam_state_dict(dim, depth, heads, set(global_idx))
    path = tmp_path / f"sam_{version}_fake.pth"
    torch.save(sd, str(path))

    cfg = load_config(
        overrides=dict(SAM_VERSION=version, PATCH_SIZE=256,
                       COMPUTE_DTYPE="float32")
    )
    params, matched, mismatched = load_and_convert(str(path), cfg)
    hd = dim // heads
    token = 16  # 256 / 16

    # the ONLY encoder mismatches are the quirk-corrupted windowed rel-pos
    enc_mismatch = sorted(m for m in mismatched if m.startswith("image_encoder"))
    want_mismatch = sorted(
        f"image_encoder.blocks_{i}.attn.rel_pos_{ax}"
        for i in quirk_windowed for ax in ("h", "w")
    )
    assert enc_mismatch == want_mismatch, enc_mismatch

    assert params["image_encoder"]["pos_embed"].shape == (1, token, token, dim)
    for i in global_idx:
        assert params["image_encoder"][f"blocks_{i}"]["attn"]["rel_pos_h"].shape \
            == (2 * token - 1, hd)
    # an unaffected windowed block keeps its 14x14 table verbatim
    np.testing.assert_allclose(
        params["image_encoder"]["blocks_0"]["attn"]["rel_pos_h"],
        sd["image_encoder.blocks.0.attn.rel_pos_h"].numpy(),
        rtol=1e-6,
    )
    # qkv layout transpose at the vit_l/h dims
    np.testing.assert_allclose(
        params["image_encoder"]["blocks_1"]["attn"]["qkv"]["kernel"],
        sd["image_encoder.blocks.1.attn.qkv.weight"].numpy().T,
        rtol=1e-6,
    )


@pytest.mark.slow  # ~40 s CPU: vit_l-dim oracle parity; the full vit_b
# parity + conversion tests keep default coverage of the same math
def test_vit_l_block_stack_matches_torch_oracle():
    """Small-grid oracle parity at the vit_l layout (dim 1024, 16 heads,
    full depth 24 with global_attn_indexes (5,11,17,23)) through the real
    converter — pins the conversion + model math at vit_l dims."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp
    from torch_oracle import OracleImageEncoderViT

    from sam_road_tpu.models.convert import convert_state_dict, overlay_params
    from sam_road_tpu.models.vit import ImageEncoderViT

    torch.manual_seed(0)
    kw = dict(img_size=64, embed_dim=1024, depth=24, num_heads=16,
              out_chans=256, window_size=4, global_attn_indexes=(5, 11, 17, 23))
    oracle = OracleImageEncoderViT(**kw).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.02)
    sd = {f"image_encoder.{k}": v for k, v in oracle.state_dict().items()}
    conv = convert_state_dict(sd, image_size=64,
                              global_attn_indexes=(5, 11, 17, 23))
    assert not conv["skipped"], conv["skipped"]

    enc = ImageEncoderViT(dtype=jnp.float32, **kw)
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32)
    init = jax.tree.map(np.asarray,
                        enc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"])
    merged, matched, mismatched = overlay_params(
        init, conv["params"]["image_encoder"]
    )
    assert not mismatched, mismatched
    got = np.asarray(enc.apply({"params": merged}, jnp.asarray(x)))
    with torch.no_grad():
        want = oracle(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


@pytest.mark.slow  # ~25 s CPU: push-button tool dryrun; the converter logic
# it drives is covered by the default conversion tests above
def test_verify_real_ckpt_tool_dryrun(tmp_path):
    """tools/verify_real_ckpt.py dry-run against the fake flagship ckpt:
    the one-command parity check must run end to end and report ~0 oracle
    diff (same weights both sides), so first contact with a REAL checkpoint
    is a one-liner, not new engineering."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "verify_real_ckpt",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "verify_real_ckpt.py"),
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    sd = _fake_sam_vit_b_state_dict()
    # unit-randn weights make 12-block activations explode (std ~6e3) and
    # saturate softmax, which amplifies fp32 reassociation chaotically —
    # scale to the well-conditioned regime real checkpoints live in
    sd = {k: v * 0.02 for k, v in sd.items()}
    path = tmp_path / "sam_vit_b_fake.pth"
    torch.save(sd, str(path))
    lines = []
    worst = tool.run(str(path), "vit_b", 256, oracle=True,
                     out=lambda *a: lines.append(" ".join(map(str, a))))
    assert worst < 1e-3, worst
    assert any("matched params" in l for l in lines)


def _fake_mae_vit_b_state_dict():
    """Tensor shapes of the official mae_pretrain_vit_base.pth 'model' dict
    (plain timm ViT-B/16 trunk: cls token, 197-token pos embed, fused qkv,
    fc1/fc2 MLP naming, final norm — no rel_pos, no neck)."""
    dim = 768
    sd = {}
    sd["cls_token"] = torch.randn(1, 1, dim)
    sd["pos_embed"] = torch.randn(1, 197, dim)
    sd["patch_embed.proj.weight"] = torch.randn(dim, 3, 16, 16)
    sd["patch_embed.proj.bias"] = torch.randn(dim)
    for i in range(12):
        p = f"blocks.{i}"
        for nm in ("norm1", "norm2"):
            sd[f"{p}.{nm}.weight"] = torch.randn(dim)
            sd[f"{p}.{nm}.bias"] = torch.randn(dim)
        sd[f"{p}.attn.qkv.weight"] = torch.randn(3 * dim, dim)
        sd[f"{p}.attn.qkv.bias"] = torch.randn(3 * dim)
        sd[f"{p}.attn.proj.weight"] = torch.randn(dim, dim)
        sd[f"{p}.attn.proj.bias"] = torch.randn(dim)
        sd[f"{p}.mlp.fc1.weight"] = torch.randn(4 * dim, dim)
        sd[f"{p}.mlp.fc1.bias"] = torch.randn(4 * dim)
        sd[f"{p}.mlp.fc2.weight"] = torch.randn(dim, 4 * dim)
        sd[f"{p}.mlp.fc2.bias"] = torch.randn(dim)
    sd["norm.weight"] = torch.randn(dim)
    sd["norm.bias"] = torch.randn(dim)
    return sd


@pytest.mark.slow  # ~32 s: full-shape vit_b fake-MAE conversion, like the
# other full-shape conversion cases already in this tier
def test_fake_mae_vit_b_no_sam_init(tmp_path):
    """NO_SAM ablation init from a fake full-shape MAE checkpoint
    (reference experiment: vitdet.py:43-110): the trunk transfers, while
    pos_embed (shape mismatch), rel_pos (absent from plain-ViT MAE), the
    neck and all heads stay at random init."""
    from sam_road_tpu.config import load_config
    from sam_road_tpu.models.convert import load_mae_encoder_params

    sd = _fake_mae_vit_b_state_dict()
    path = tmp_path / "mae_pretrain_vit_base_fake.pth"
    torch.save({"model": sd}, str(path))  # MAE release nesting (vitdet.py:79)

    cfg = load_config(overrides=dict(
        NO_SAM=True, SAM_VERSION="vit_b", PATCH_SIZE=512,
        MAE_CKPT_PATH=str(path), COMPUTE_DTYPE="float32",
    ))
    params, matched, mismatched = load_mae_encoder_params(str(path), cfg)

    # trunk coverage: patch embed + 12 blocks x (2 LN + qkv + proj + 2 MLP)
    # x (weight, bias) = 2 + 12*12 = 146 matched encoder params
    assert all(m.startswith("image_encoder") for m in matched)
    assert len(matched) == 2 + 12 * 12, len(matched)
    # excluded-by-semantics params stay init
    for name in ("image_encoder.pos_embed",
                 "image_encoder.blocks_0.attn.rel_pos_h",
                 "image_encoder.blocks_11.attn.rel_pos_w",
                 "image_encoder.neck_0.kernel"):
        assert name in mismatched, name
    assert any(m.startswith("map_decoder") for m in mismatched)
    assert any(m.startswith("topo_net") for m in mismatched)
    # fc1/fc2 -> lin1/lin2 rename + layout transpose survive
    np.testing.assert_allclose(
        params["image_encoder"]["blocks_3"]["mlp_lin1"]["kernel"],
        sd["blocks.3.mlp.fc1.weight"].numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        params["image_encoder"]["blocks_7"]["attn"]["qkv"]["kernel"],
        sd["blocks.7.attn.qkv.weight"].numpy().T, rtol=1e-6)


@pytest.mark.slow  # ~14 s: Lightning+LoRA conversion drive; the plain SAM
# conversion + resize-quirk cases stay default
def test_samroad_lightning_ckpt_with_lora_converts(tmp_path):
    """A fine-tuned SAMRoad Lightning checkpoint (512px-sized encoder +
    map_decoder + topo_net + LoRA adapters) converts with no unmapped keys
    and no mismatched LoRA/decoder/toponet params."""
    from sam_road_tpu.config import load_config
    from sam_road_tpu.models.convert import load_and_convert

    dim, hd, r = 768, 64, 4
    grid = 32  # 512 / 16
    sd = {}
    sd["image_encoder.pos_embed"] = torch.randn(1, grid, grid, dim)
    sd["image_encoder.patch_embed.proj.weight"] = torch.randn(dim, 3, 16, 16)
    sd["image_encoder.patch_embed.proj.bias"] = torch.randn(dim)
    global_idx = {2, 5, 8, 11}
    for i in range(12):
        p = f"image_encoder.blocks.{i}"
        for nm in ("norm1", "norm2"):
            sd[f"{p}.{nm}.weight"] = torch.randn(dim)
            sd[f"{p}.{nm}.bias"] = torch.randn(dim)
        sd[f"{p}.attn.qkv.weight"] = torch.randn(3 * dim, dim)
        sd[f"{p}.attn.qkv.bias"] = torch.randn(3 * dim)
        # LoRA surgery keys (reference: model.py:336-342 _LoRA_qkv attrs)
        sd[f"{p}.attn.qkv.linear_a_q.weight"] = torch.randn(r, dim)
        sd[f"{p}.attn.qkv.linear_b_q.weight"] = torch.randn(dim, r)
        sd[f"{p}.attn.qkv.linear_a_v.weight"] = torch.randn(r, dim)
        sd[f"{p}.attn.qkv.linear_b_v.weight"] = torch.randn(dim, r)
        sd[f"{p}.attn.proj.weight"] = torch.randn(dim, dim)
        sd[f"{p}.attn.proj.bias"] = torch.randn(dim)
        size = 2 * grid - 1 if i in global_idx else 27
        sd[f"{p}.attn.rel_pos_h"] = torch.randn(size, hd)
        sd[f"{p}.attn.rel_pos_w"] = torch.randn(size, hd)
        sd[f"{p}.mlp.lin1.weight"] = torch.randn(4 * dim, dim)
        sd[f"{p}.mlp.lin1.bias"] = torch.randn(4 * dim)
        sd[f"{p}.mlp.lin2.weight"] = torch.randn(dim, 4 * dim)
        sd[f"{p}.mlp.lin2.bias"] = torch.randn(dim)
    sd["image_encoder.neck.0.weight"] = torch.randn(256, dim, 1, 1)
    sd["image_encoder.neck.1.weight"] = torch.randn(256)
    sd["image_encoder.neck.1.bias"] = torch.randn(256)
    sd["image_encoder.neck.2.weight"] = torch.randn(256, 256, 3, 3)
    sd["image_encoder.neck.3.weight"] = torch.randn(256)
    sd["image_encoder.neck.3.bias"] = torch.randn(256)
    # naive decoder slots 0/1/3/5/7
    sd["map_decoder.0.weight"] = torch.randn(256, 128, 2, 2)
    sd["map_decoder.0.bias"] = torch.randn(128)
    sd["map_decoder.1.weight"] = torch.randn(128)
    sd["map_decoder.1.bias"] = torch.randn(128)
    sd["map_decoder.3.weight"] = torch.randn(128, 64, 2, 2)
    sd["map_decoder.3.bias"] = torch.randn(64)
    sd["map_decoder.5.weight"] = torch.randn(64, 32, 2, 2)
    sd["map_decoder.5.bias"] = torch.randn(32)
    sd["map_decoder.7.weight"] = torch.randn(32, 2, 2, 2)
    sd["map_decoder.7.bias"] = torch.randn(2)
    # toponet
    sd["topo_net.feature_proj.weight"] = torch.randn(128, 256)
    sd["topo_net.feature_proj.bias"] = torch.randn(128)
    sd["topo_net.pair_proj.weight"] = torch.randn(128, 258)
    sd["topo_net.pair_proj.bias"] = torch.randn(128)
    for i in range(3):
        q = f"topo_net.transformer_encoder.layers.{i}"
        sd[f"{q}.self_attn.in_proj_weight"] = torch.randn(384, 128)
        sd[f"{q}.self_attn.in_proj_bias"] = torch.randn(384)
        sd[f"{q}.self_attn.out_proj.weight"] = torch.randn(128, 128)
        sd[f"{q}.self_attn.out_proj.bias"] = torch.randn(128)
        sd[f"{q}.linear1.weight"] = torch.randn(128, 128)
        sd[f"{q}.linear1.bias"] = torch.randn(128)
        sd[f"{q}.linear2.weight"] = torch.randn(128, 128)
        sd[f"{q}.linear2.bias"] = torch.randn(128)
        sd[f"{q}.norm1.weight"] = torch.randn(128)
        sd[f"{q}.norm1.bias"] = torch.randn(128)
        sd[f"{q}.norm2.weight"] = torch.randn(128)
        sd[f"{q}.norm2.bias"] = torch.randn(128)
    sd["topo_net.output_proj.weight"] = torch.randn(1, 128)
    sd["topo_net.output_proj.bias"] = torch.randn(1)

    path = tmp_path / "samroad_lora.ckpt"
    torch.save({"state_dict": sd, "epoch": 9}, str(path))

    cfg = load_config(overrides=dict(
        SAM_VERSION="vit_b", PATCH_SIZE=512, ENCODER_LORA=True, LORA_RANK=4,
        COMPUTE_DTYPE="float32",
    ))
    params, matched, mismatched = load_and_convert(str(path), cfg)
    assert not mismatched, mismatched  # every init param found in the ckpt
    np.testing.assert_allclose(
        params["image_encoder"]["blocks_0"]["attn"]["linear_a_q"]["kernel"],
        sd["image_encoder.blocks.0.attn.qkv.linear_a_q.weight"].numpy().T,
        rtol=1e-6,
    )
