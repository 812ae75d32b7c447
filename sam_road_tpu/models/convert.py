"""PyTorch checkpoint -> flax parameter conversion.

Converts both the official SAM encoder checkpoints (sam_vit_b_01ec64.pth et
al.) and released/trained SAMRoad Lightning checkpoints into this framework's
parameter pytree. Mirrors the reference's load semantics:

- position-embedding + global-attention rel-pos resize when PATCH_SIZE != 1024
  (reference: model.py:392-411, resize_sam_pos_embed) — done with torch
  F.interpolate so the numerics match the reference bit-for-bit;
- partial load by name+shape intersection (reference: model.py:375-390),
  returning matched/mismatched name lists.

torch is used only as a deserializer + resizer on CPU; everything returned is
numpy, ready to overlay on an init_params() pytree.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _t(x):  # torch tensor -> numpy
    return np.asarray(x.detach().cpu().numpy())


def load_torch_state_dict(path: str) -> dict:
    """Load a .pth/.ckpt file; unwraps Lightning's 'state_dict' nesting."""
    import torch

    with open(path, "rb") as f:
        obj = torch.load(f, map_location="cpu", weights_only=False)
    if isinstance(obj, Mapping) and "state_dict" in obj:
        obj = obj["state_dict"]
    return dict(obj)


def resize_sam_pos_embed(state_dict: dict, image_size: int, vit_patch_size: int,
                         global_attn_indexes) -> dict:
    """Resize abs pos embed + global-attn rel-pos tables for PATCH_SIZE
    (exact port of reference model.py:392-411, including its quirk of
    substring-matching block indices)."""
    import torch
    import torch.nn.functional as F

    new_state_dict = {k: v for k, v in state_dict.items()}
    pos_embed = new_state_dict["image_encoder.pos_embed"]
    token_size = int(image_size // vit_patch_size)
    if pos_embed.shape[1] != token_size:
        pos_embed = pos_embed.permute(0, 3, 1, 2)
        pos_embed = F.interpolate(
            pos_embed, (token_size, token_size), mode="bilinear", align_corners=False
        )
        new_state_dict["image_encoder.pos_embed"] = pos_embed.permute(0, 2, 3, 1)
        rel_pos_keys = [k for k in state_dict.keys() if "rel_pos" in k]
        # NOTE: reference matches str(i) as a substring ("2" also hits block
        # 12 etc.). Kept bug-for-bug so converted weights agree.
        global_rel_pos_keys = [
            k for k in rel_pos_keys if any(str(i) in k for i in global_attn_indexes)
        ]
        for k in global_rel_pos_keys:
            rel_pos_params = new_state_dict[k]
            h, w = rel_pos_params.shape
            rel_pos_params = rel_pos_params.unsqueeze(0).unsqueeze(0)
            rel_pos_params = F.interpolate(
                rel_pos_params, (token_size * 2 - 1, w), mode="bilinear",
                align_corners=False,
            )
            new_state_dict[k] = rel_pos_params[0, 0, ...]
    return new_state_dict


# map_decoder Sequential slot -> flax module name
_DECODER_SLOTS = {"0": "up_0", "1": "ln_1", "3": "up_2", "5": "up_3", "7": "up_4"}


def _convert_encoder_key(rest: str, value: np.ndarray):
    """'image_encoder.'-relative torch key -> (flax path tuple, array)."""
    if rest == "pos_embed":
        return ("pos_embed",), value
    if rest == "patch_embed.proj.weight":
        return ("patch_embed_proj", "kernel"), value.transpose(2, 3, 1, 0)
    if rest == "patch_embed.proj.bias":
        return ("patch_embed_proj", "bias"), value
    m = re.match(r"blocks\.(\d+)\.(.*)", rest)
    if m:
        i, sub = m.group(1), m.group(2)
        blk = f"blocks_{i}"
        table = {
            "norm1.weight": (("norm1", "scale"), None),
            "norm1.bias": (("norm1", "bias"), None),
            "norm2.weight": (("norm2", "scale"), None),
            "norm2.bias": (("norm2", "bias"), None),
            "attn.qkv.weight": (("attn", "qkv", "kernel"), "T"),
            "attn.qkv.bias": (("attn", "qkv", "bias"), None),
            "attn.proj.weight": (("attn", "proj", "kernel"), "T"),
            "attn.proj.bias": (("attn", "proj", "bias"), None),
            "attn.rel_pos_h": (("attn", "rel_pos_h"), None),
            "attn.rel_pos_w": (("attn", "rel_pos_w"), None),
            "mlp.lin1.weight": (("mlp_lin1", "kernel"), "T"),
            "mlp.lin1.bias": (("mlp_lin1", "bias"), None),
            "mlp.lin2.weight": (("mlp_lin2", "kernel"), "T"),
            "mlp.lin2.bias": (("mlp_lin2", "bias"), None),
            # LoRA adapters (reference: model.py:152-187,336-342)
            "attn.qkv.linear_a_q.weight": (("attn", "linear_a_q", "kernel"), "T"),
            "attn.qkv.linear_b_q.weight": (("attn", "linear_b_q", "kernel"), "T"),
            "attn.qkv.linear_a_v.weight": (("attn", "linear_a_v", "kernel"), "T"),
            "attn.qkv.linear_b_v.weight": (("attn", "linear_b_v", "kernel"), "T"),
        }
        if sub in table:
            path, op = table[sub]
            return (blk,) + path, (value.T if op == "T" else value)
        return None
    m = re.match(r"neck\.(\d+)\.(weight|bias)", rest)
    if m:
        slot, wb = m.group(1), m.group(2)
        name = f"neck_{slot}"
        if slot in ("0", "2"):  # convs
            if wb == "weight":
                return (name, "kernel"), value.transpose(2, 3, 1, 0)
            return (name, "bias"), value
        # LayerNorm2d slots keep torch names weight/bias
        return (name, wb), value
    return None


def _convert_toponet_key(rest: str, value: np.ndarray):
    table_direct = {
        "feature_proj.weight": (("feature_proj", "kernel"), "T"),
        "feature_proj.bias": (("feature_proj", "bias"), None),
        "pair_proj.weight": (("pair_proj", "kernel"), "T"),
        "pair_proj.bias": (("pair_proj", "bias"), None),
        "output_proj.weight": (("output_proj", "kernel"), "T"),
        "output_proj.bias": (("output_proj", "bias"), None),
    }
    if rest in table_direct:
        path, op = table_direct[rest]
        return path, (value.T if op == "T" else value)
    m = re.match(r"transformer_encoder\.layers\.(\d+)\.(.*)", rest)
    if m:
        i, sub = m.group(1), m.group(2)
        layer = f"layers_{i}"
        table = {
            "self_attn.in_proj_weight": (("self_attn", "in_proj", "kernel"), "T"),
            "self_attn.in_proj_bias": (("self_attn", "in_proj", "bias"), None),
            "self_attn.out_proj.weight": (("self_attn", "out_proj", "kernel"), "T"),
            "self_attn.out_proj.bias": (("self_attn", "out_proj", "bias"), None),
            "linear1.weight": (("linear1", "kernel"), "T"),
            "linear1.bias": (("linear1", "bias"), None),
            "linear2.weight": (("linear2", "kernel"), "T"),
            "linear2.bias": (("linear2", "bias"), None),
            "norm1.weight": (("norm1", "scale"), None),
            "norm1.bias": (("norm1", "bias"), None),
            "norm2.weight": (("norm2", "scale"), None),
            "norm2.bias": (("norm2", "bias"), None),
        }
        if sub in table:
            path, op = table[sub]
            return (layer,) + path, (value.T if op == "T" else value)
    return None


def _convert_decoder_key(rest: str, value: np.ndarray):
    m = re.match(r"(\d+)\.(weight|bias)", rest)
    if not m:
        return None
    slot, wb = m.group(1), m.group(2)
    if slot not in _DECODER_SLOTS:
        return None
    name = _DECODER_SLOTS[slot]
    if name.startswith("up_"):
        if wb == "weight":
            # torch ConvTranspose2d (in, out, kh, kw) -> (kh, kw, in, out)
            return (name, "kernel"), value.transpose(2, 3, 0, 1)
        return (name, "bias"), value
    return (name, wb), value  # LayerNorm2d


def convert_state_dict(state_dict: dict, image_size: int,
                       global_attn_indexes=(2, 5, 8, 11)) -> dict:
    """torch state dict -> nested flax param dict (numpy leaves).

    Applies the pos-embed resize when needed, then converts every recognized
    key. Unrecognized keys (prompt_encoder/mask_decoder when unused, metric
    buffers, pixel stats) are skipped and reported.
    """
    # Torch-side resize first (reference behavior: model.py:370-373).
    if "image_encoder.pos_embed" in state_dict and image_size != 1024:
        state_dict = resize_sam_pos_embed(state_dict, image_size, 16,
                                          global_attn_indexes)

    params: dict = {}
    converted, skipped = [], []

    def put(path, arr):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(arr, dtype=np.float32)

    for key, v in state_dict.items():
        value = _t(v) if hasattr(v, "detach") else np.asarray(v)
        out = None
        if key.startswith("image_encoder."):
            out = _convert_encoder_key(key[len("image_encoder."):], value)
            if out:
                out = (("image_encoder",) + out[0], out[1])
        elif key.startswith("map_decoder."):
            out = _convert_decoder_key(key[len("map_decoder."):], value)
            if out:
                out = (("map_decoder",) + out[0], out[1])
        elif key.startswith("topo_net."):
            out = _convert_toponet_key(key[len("topo_net."):], value)
            if out:
                out = (("topo_net",) + out[0], out[1])
        elif key.startswith(("mask_decoder.", "prompt_encoder.")):
            try:
                from sam_road_tpu.models.sam_decoder import convert_sam_decoder_key

                out = convert_sam_decoder_key(key, value)
            except ImportError:
                out = None
        if out is None:
            skipped.append(key)
        else:
            put(out[0], out[1])
            converted.append(key)
    return {"params": params, "converted": converted, "skipped": skipped}


def convert_mae_state_dict(state_dict: dict) -> dict:
    """IN1k-MAE ViT-B checkpoint ('model' dict of mae_pretrain_vit_base.pth)
    -> encoder param subtree for the NO_SAM ablation init.

    Implements the reference ablation's INTENDED load semantics
    (reference: vitdet.py:78-105): name+shape partial intersection of the MAE
    trunk weights with a ViTDet-family encoder —

    - patch_embed + every block's norm1/norm2, attn.qkv, attn.proj and MLP
      (MAE names fc1/fc2, SAM-family names lin1/lin2) transfer;
    - pos_embed does NOT (MAE's is [1, 197, 768] with a cls token; the
      ViTDet grid embed is [1, H, W, C] — shape mismatch, and the resize
      path is commented out in the reference, vitdet.py:85-88);
    - rel_pos_h/w do NOT exist in MAE (plain ViT pretraining) and stay init;
    - cls_token / mask_token / final norm have no ViTDet counterpart.

    NOTE the reference's shipped code never actually applied these weights:
    vitdet.py:80 prefixes every checkpoint key with 'vitb.' and then loads
    the prefixed dict into `self.vitb` itself (vitdet.py:105) with
    strict=False, so zero keys match and the encoder silently trains from
    random init (its printed "Matched params" list is computed against
    `self.named_parameters()`, which DOES carry the prefix — masking the
    bug). Like the reference's broken --resume flag, we implement what the
    code plainly intends rather than reproducing the silent no-op; the
    deviation is recorded in docs/PARITY.md row 28.
    """
    params: dict = {}
    converted, skipped = [], []

    def put(path, arr):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(arr, dtype=np.float32)

    for key, v in state_dict.items():
        value = _t(v) if hasattr(v, "detach") else np.asarray(v)
        # MAE trunk -> SAM-family encoder naming (mlp.fc* -> mlp.lin*).
        sam_key = key.replace(".mlp.fc1.", ".mlp.lin1.").replace(
            ".mlp.fc2.", ".mlp.lin2.")
        out = None
        if sam_key != "pos_embed":  # shape-mismatch exclusion (see docstring)
            out = _convert_encoder_key(sam_key, value)
        if out is None:
            skipped.append(key)
        else:
            put(("image_encoder",) + out[0], out[1])
            converted.append(key)
    return {"params": params, "converted": converted, "skipped": skipped}


def load_mae_encoder_params(path: str, config):
    """NO_SAM ablation init: overlay an IN1k-MAE ViT-B checkpoint's trunk
    onto a fresh init (reference experiment: vitdet.py:43-110; published
    road F1 0.3363 in config/toponet_vitb_512_cityscale_no_sam.yaml).

    Returns (merged_params, matched_names, mismatched_names)."""
    import torch

    from sam_road_tpu.models.sam_road import init_params

    with open(path, "rb") as f:
        obj = torch.load(f, map_location="cpu", weights_only=False)
    if isinstance(obj, Mapping) and "model" in obj:
        obj = obj["model"]  # MAE release nesting (reference: vitdet.py:79)
    conv = convert_mae_state_dict(dict(obj))
    init_tree = init_params(config)
    import jax

    init_np = jax.tree.map(np.asarray, init_tree)
    merged, matched, mismatched = overlay_params(init_np, conv["params"])
    return merged, matched, mismatched


def overlay_params(init_tree, loaded_tree, prefix=()):
    """Overlay loaded arrays onto an init pytree by name+shape match
    (reference partial-load semantics: model.py:375-390).

    Returns (merged_tree, matched_names, mismatched_names): mismatched lists
    init params with no (or wrong-shape) loaded value.
    """
    matched, mismatched = [], []

    def rec(init_node, loaded_node, path):
        if isinstance(init_node, dict):
            out = {}
            for k, v in init_node.items():
                sub = loaded_node.get(k) if isinstance(loaded_node, dict) else None
                out[k] = rec(v, sub, path + (k,))
            return out
        name = ".".join(path)
        if loaded_node is not None and tuple(np.shape(loaded_node)) == tuple(
            np.shape(init_node)
        ):
            matched.append(name)
            return np.asarray(loaded_node, dtype=np.asarray(init_node).dtype)
        mismatched.append(name)
        return init_node

    merged = rec(dict(init_tree), loaded_tree, prefix)
    return merged, matched, mismatched


def load_and_convert(path: str, config):
    """One-call path: .pth/.ckpt file + framework config -> merged params.

    Mirrors reference SAMRoad.__init__ checkpoint handling
    (model.py:365-390): convert, resize, then name+shape partial overlay on a
    fresh init.
    """
    from sam_road_tpu.models.sam_road import init_params
    from sam_road_tpu.models.vit import ENCODER_SPECS

    spec = ENCODER_SPECS[str(config.SAM_VERSION)]
    sd = load_torch_state_dict(path)
    conv = convert_state_dict(
        sd, int(config.PATCH_SIZE), tuple(spec["global_attn_indexes"])
    )
    init_tree = init_params(config)
    import jax

    init_np = jax.tree.map(np.asarray, init_tree)
    merged, matched, mismatched = overlay_params(init_np, conv["params"])
    return merged, matched, mismatched
