"""Phase-1 stage breakdown on the real TPU: where the gap between
8 x encoder-forward and the measured phase-1 wall time goes.

Times four nested programs (each scanned over all 8 batches in ONE jit,
interleaved round-robin — docs/DESIGN.md round-3 protocol):

  crop:     on-device patch crops + f32 convert only
  encoder:  + the (fused v3 or flax) encoder forward
  decoder:  + map decoder + sigmoid + int32 quantization
  fusion:   + the scatter-add mask accumulation (the full _phase1_impl)

plus the host-visible extras (region upload, mask download) measured
separately. Run: python tools/profile_phase1.py [fused(0/1)]
"""

import json
import sys
import time

import numpy as np


def main(fused=1):
    import jax
    import jax.numpy as jnp

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from sam_road_tpu.config import load_config
    from sam_road_tpu.data.partitions import get_patch_info_one_img
    from sam_road_tpu.inference.engine import TiledInferenceEngine
    from sam_road_tpu.models.sam_road import init_params

    cfg = load_config(overrides=dict(
        DATASET="cityscale", PATCH_SIZE=512, INFER_BATCH_SIZE=32,
        INFER_PATCHES_PER_EDGE=16, SAMPLE_MARGIN=64,
        COMPUTE_DTYPE="bfloat16", TOPO_SAMPLE_NUM=512,
        FUSED_ENCODER=bool(fused),
    ))
    params = init_params(cfg)
    eng = TiledInferenceEngine(cfg, params)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(2048, 2048, 3), dtype=np.uint8)
    info = get_patch_info_one_img(0, 2048, 64, 512, 16)
    B = 32
    nb = len(info) // B
    x0s = np.zeros((nb, B), np.int32)
    y0s = np.zeros((nb, B), np.int32)
    w = np.ones((nb, B), np.int32)
    for bi in range(nb):
        for i, (_, (x0, y0), _) in enumerate(info[bi * B:(bi + 1) * B]):
            x0s[bi, i], y0s[bi, i] = x0, y0

    img_dev = jax.device_put(img)
    args = (jnp.asarray(x0s), jnp.asarray(y0s), jnp.asarray(w))
    p = 512

    def crop_stage(params, img_u8, bx, by, bw):
        patches = jax.vmap(
            lambda x0, y0: jax.lax.dynamic_slice(img_u8, (y0, x0, 0), (p, p, 3))
        )(bx, by)
        return patches.astype(jnp.float32)

    def enc_stage(params, img_u8, bx, by, bw):
        rgb = crop_stage(params, img_u8, bx, by, bw)
        _, feats = eng._infer_masks_feats(params, rgb)
        return feats

    def dec_stage(params, img_u8, bx, by, bw):
        rgb = crop_stage(params, img_u8, bx, by, bw)
        scores, feats = eng._infer_masks_feats(params, rgb)
        quant = jnp.round(
            scores.astype(jnp.float32) * eng.MASK_QUANT).astype(jnp.int32)
        return feats, quant

    stages = {"crop": crop_stage, "encoder": enc_stage, "decoder": dec_stage}
    runners = {}
    for name, fn in stages.items():
        @jax.jit
        def run(params, img_u8, bx, by, bw, fn=fn):
            def step(c, xyw):
                out = fn(params, img_u8, xyw[0], xyw[1], xyw[2])
                leaf = jax.tree_util.tree_leaves(out)[-1]
                s = jnp.abs(leaf.astype(jnp.float32)).sum()
                return c + s * 1e-30, s
            _, ss = jax.lax.scan(step, jnp.zeros(()), (bx, by, bw))
            return ss
        float(run(eng.params, img_dev, *args)[0])
        runners[name] = run
        print(f"# {name}: compiled", flush=True)

    @jax.jit
    def fusion_run(params, img_u8, bx, by, bw):
        fused0 = jnp.zeros((2048, 2048, 2), jnp.int32)
        cnt0 = jnp.zeros((2048, 2048), jnp.int32)

        def step(carry, xyw):
            f, c = carry
            feats, f, c = eng._phase1_impl(
                params, img_u8, xyw[0], xyw[1], f, c, xyw[2])
            return (f, c), jnp.abs(feats.astype(jnp.float32)).sum()
        (f, c), ss = jax.lax.scan(step, (fused0, cnt0), (bx, by, bw))
        return ss

    float(fusion_run(eng.params, img_dev, *args)[0])
    runners["fusion"] = fusion_run
    print("# fusion: compiled", flush=True)

    times = {k: [] for k in runners}
    for r in range(4):
        for name, run in runners.items():
            t0 = time.time()
            float(run(eng.params, img_dev, *args)[0])
            times[name].append(time.time() - t0)
    out = {k + "_s": round(min(v), 3) for k, v in times.items()}

    # host link extras
    t0 = time.time()
    d = jax.device_put(img)
    _ = float(jnp.sum(d[:2, :2, 0]))
    out["upload_s"] = round(time.time() - t0, 3)
    masks = jnp.zeros((2048, 2048, 2), jnp.uint8) + d[..., :2]
    _ = np.asarray(masks)
    t0 = time.time()
    _ = np.asarray(masks)
    out["mask_download_s"] = round(time.time() - t0, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
