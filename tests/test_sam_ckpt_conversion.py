"""Full-shape SAM checkpoint conversion: build a .pth laid out exactly like
the official sam_vit_b_01ec64.pth (1024px pos embeds, fused qkv, neck,
prompt encoder + mask decoder) and verify load_and_convert covers every
encoder parameter at PATCH_SIZE 512 with the resize path engaged."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _fake_sam_vit_b_state_dict():
    """Tensor shapes of the official SAM ViT-B checkpoint."""
    sd = {}
    dim, depth, heads, hd = 768, 12, 12, 64
    grid = 64  # 1024 / 16
    sd["image_encoder.pos_embed"] = torch.randn(1, grid, grid, dim)
    sd["image_encoder.patch_embed.proj.weight"] = torch.randn(dim, 3, 16, 16)
    sd["image_encoder.patch_embed.proj.bias"] = torch.randn(dim)
    global_idx = {2, 5, 8, 11}
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
    # a few prompt-encoder / mask-decoder entries (present in real ckpts)
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = torch.randn(2, 128)
    sd["prompt_encoder.no_mask_embed.weight"] = torch.randn(1, 256)
    sd["prompt_encoder.point_embeddings.0.weight"] = torch.randn(1, 256)
    sd["mask_decoder.iou_token.weight"] = torch.randn(1, 256)
    sd["mask_decoder.mask_tokens.weight"] = torch.randn(4, 256)
    return sd


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
