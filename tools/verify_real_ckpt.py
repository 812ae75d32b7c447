"""Real-checkpoint verification: one command from a .pth/.ckpt file to a
stage-by-stage parity report.

The converter (sam_road_tpu/models/convert.py) is quirk-faithful and
oracle-tested on full-shape FAKE checkpoints, but no real
sam_vit_b_01ec64.pth / released SAMRoad checkpoint exists in this
environment (reference: model.py:365-411, README.md:84-85 — released ckpts
at HF congrui/sam_road). The day a real file is available, run:

    python tools/verify_real_ckpt.py /path/to/ckpt.pth \
        --sam-version vit_b --patch-size 512 --oracle

and it will:
  1. convert + overlay the checkpoint, reporting matched/mismatched params
     by subsystem (the reference prints the same lists, model.py:384-387);
  2. run ONE deterministic patch through the encoder (+ decoder when the
     checkpoint carries one) and print per-stage activation stats
     (mean/std/L1) — comparable across machines/runs;
  3. with --oracle (requires torch), rebuild the SAME stages from the raw
     state dict with the torch oracle modules (tests/torch_oracle.py,
     numerics-identical to the reference's SAM submodule) and print the
     per-stage max abs diff — parity in one look.

Dry-run is exercised in tests/test_sam_ckpt_conversion.py against the fake
flagship checkpoint.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stats(name, arr):
    a = np.asarray(arr, np.float64)
    return {
        "stage": name,
        "shape": tuple(a.shape),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "l1": float(np.abs(a).mean()),
    }


def run(ckpt_path: str, sam_version: str = "vit_b", patch_size: int = 512,
        oracle: bool = False, seed: int = 0, out=print):
    import jax

    jax.config.update("jax_platforms", "cpu")  # determinism for comparison
    import jax.numpy as jnp

    from sam_road_tpu.config import load_config
    from sam_road_tpu.models.convert import load_and_convert, load_torch_state_dict
    from sam_road_tpu.models.sam_road import PIXEL_MEAN, PIXEL_STD
    from sam_road_tpu.models.vit import ENCODER_SPECS, ImageEncoderViT

    cfg = load_config(overrides=dict(
        SAM_VERSION=sam_version, PATCH_SIZE=patch_size,
        COMPUTE_DTYPE="float32",
    ))
    params, matched, mismatched = load_and_convert(ckpt_path, cfg)

    def bucket(names):
        b: dict = {}
        for n in names:
            b.setdefault(n.split(".")[0], []).append(n)
        return {k: len(v) for k, v in sorted(b.items())}

    out(f"== {ckpt_path} ==")
    out(f"matched params:    {len(matched)}  {bucket(matched)}")
    out(f"mismatched params: {len(mismatched)}  {bucket(mismatched)}")
    enc_miss = [m for m in mismatched if m.startswith("image_encoder")]
    if enc_miss:
        out("encoder params NOT loaded (kept init):")
        for m in enc_miss:
            out(f"  {m}")

    # one deterministic patch
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(1, patch_size, patch_size, 3)).astype(np.float32)
    mean = np.asarray(PIXEL_MEAN, np.float32)
    std = np.asarray(PIXEL_STD, np.float32)
    x = (img - mean) / std

    spec = ENCODER_SPECS[sam_version]
    enc = ImageEncoderViT(
        img_size=patch_size, embed_dim=spec["embed_dim"], depth=spec["depth"],
        num_heads=spec["num_heads"],
        global_attn_indexes=spec["global_attn_indexes"], dtype=jnp.float32,
    )
    emb, state = enc.apply(
        {"params": params["image_encoder"]}, jnp.asarray(x),
        capture_intermediates=True,
    )
    inter = state["intermediates"]
    rows = []
    for i in range(spec["depth"]):
        rows.append(_stats(f"block_{i}", inter[f"blocks_{i}"]["__call__"][0]))
    rows.append(_stats("neck", emb))

    jx_stage = {r["stage"]: None for r in rows}
    decoder_scores = None
    if "map_decoder" in {m.split(".")[0] for m in matched}:
        from sam_road_tpu.models.decoder import MapDecoder

        logits = MapDecoder(dtype=jnp.float32).apply(
            {"params": params["map_decoder"]}, emb
        )
        decoder_scores = jax.nn.sigmoid(logits)
        rows.append(_stats("mask_scores", decoder_scores))

    out("\nper-stage activation stats (deterministic seed %d patch):" % seed)
    for r in rows:
        out("  %-12s %-22s mean %+.6f  std %.6f  l1 %.6f"
            % (r["stage"], r["shape"], r["mean"], r["std"], r["l1"]))

    if not oracle:
        return rows

    # ---- torch oracle side-by-side ----
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import torch
    from torch_oracle import OracleImageEncoderViT

    from sam_road_tpu.models.convert import resize_sam_pos_embed

    sd = load_torch_state_dict(ckpt_path)
    if patch_size != 1024 and "image_encoder.pos_embed" in sd:
        sd = resize_sam_pos_embed(sd, patch_size, 16,
                                  spec["global_attn_indexes"])
    o = OracleImageEncoderViT(
        img_size=patch_size, embed_dim=spec["embed_dim"], depth=spec["depth"],
        num_heads=spec["num_heads"], out_chans=256, window_size=14,
        global_attn_indexes=tuple(spec["global_attn_indexes"]),
    ).eval()
    o_sd = {k[len("image_encoder."):]: torch.as_tensor(np.asarray(v))
            for k, v in sd.items() if k.startswith("image_encoder.")}
    missing, unexpected = o.load_state_dict(o_sd, strict=False)
    if missing:
        out(f"oracle missing keys (kept init): {missing}")

    acts = {}

    def hook(i):
        def fn(mod, inp, outp):
            acts[f"block_{i}"] = outp.detach().numpy()
        return fn

    for i, blk in enumerate(o.blocks):
        blk.register_forward_hook(hook(i))
    with torch.no_grad():
        want = o(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    acts["neck"] = want

    out("\noracle per-stage diff (relative = max abs diff / activation std):")
    worst = 0.0

    def stage_diff(name, got, want):
        nonlocal worst
        d = float(np.abs(got - want).max())
        rel = d / (float(np.asarray(want, np.float64).std()) + 1e-12)
        worst = max(worst, rel)
        out(f"  {name:<9s} abs {d:.3e}  rel {rel:.3e}")

    for i in range(spec["depth"]):
        stage_diff(f"block_{i}",
                   np.asarray(inter[f"blocks_{i}"]["__call__"][0]),
                   acts[f"block_{i}"])
    stage_diff("neck", np.asarray(emb), acts["neck"])
    out(f"WORST RELATIVE STAGE DIFF: {worst:.3e} "
        f"({'PASS' if worst < 1e-3 else 'INVESTIGATE'} at fp32 rel tol 1e-3)")
    return worst


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt")
    ap.add_argument("--sam-version", default="vit_b",
                    choices=["vit_b", "vit_l", "vit_h"])
    ap.add_argument("--patch-size", type=int, default=512)
    ap.add_argument("--oracle", action="store_true",
                    help="side-by-side torch oracle diff (needs torch)")
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    run(a.ckpt, a.sam_version, a.patch_size, a.oracle, a.seed)


if __name__ == "__main__":
    main()
