"""Phase-2 device-time breakdown on the real TPU.

The bench's p2_fetch (~0.18 s) is the TopoNet scoring tail: 8 batches'
device time serialized after extraction. This tool times the jitted
phase-2 program at the bench's realistic shapes (B=32 patches, S point
bucket, P=16 neighbor queries), split into nested programs — sampler
only, + feature/pair projections, + transformer, full _phase2_impl with
int16 encode — each scanned ITERS times inside one jit so the tunnel's
per-dispatch RTT amortizes (docs/DESIGN.md round-3 protocol). Run:
python tools/profile_phase2.py [S]
"""

import json
import sys
import time

import numpy as np


def main(S=128):
    import jax
    import jax.numpy as jnp

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from sam_road_tpu.config import load_config
    from sam_road_tpu.inference.engine import TiledInferenceEngine
    from sam_road_tpu.models.sam_road import SAMRoad, init_params
    from sam_road_tpu.ops.sampling import bilinear_sample_points

    cfg = load_config(overrides=dict(
        DATASET="cityscale", PATCH_SIZE=512, INFER_BATCH_SIZE=32,
        INFER_PATCHES_PER_EDGE=16, SAMPLE_MARGIN=64,
        COMPUTE_DTYPE="bfloat16", TOPO_SAMPLE_NUM=512, FUSED_ENCODER=True,
    ))
    params = init_params(cfg)
    eng = TiledInferenceEngine(cfg, params)
    model = eng.model

    B, P = 32, int(cfg.MAX_NEIGHBOR_QUERIES)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.normal(size=(B, 32, 32, 256)).astype(np.float32), jnp.bfloat16
    )
    points_u16 = jnp.asarray(
        rng.integers(0, 512, size=(B, S, 2)).astype(np.uint16))
    tgt = jnp.asarray(
        rng.integers(0, S, size=(B, S, P)).astype(np.int16))
    valid = rng.random(size=(B, S, P)) < 0.6
    valid_packed = jnp.asarray(np.packbits(valid, axis=-1))

    def sampler_only(params, feats, pts_u16, tgt, vp):
        pts = pts_u16.astype(jnp.float32)
        return bilinear_sample_points(feats, pts, 512)

    def toponet_full(params, feats, pts_u16, tgt, vp):
        return eng._phase2_impl(params, feats, pts_u16, tgt, vp)

    def toponet_fp32_fetch(params, feats, pts_u16, tgt, vp):
        # same program but returning fp32 scores (transport cost delta)
        pts = pts_u16.astype(jnp.float32)
        Bq, Sq, Pq = tgt.shape
        src = jax.lax.broadcasted_iota(jnp.int32, (Bq, Sq, Pq), 1)
        pairs = jnp.stack([src, tgt.astype(jnp.int32)], axis=-1)
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = (vp[..., None] >> shifts) & jnp.uint8(1)
        val = bits.reshape(Bq, Sq, -1)[..., :Pq].astype(bool)
        return model.apply({"params": params}, feats, pts, pairs, val,
                           method=SAMRoad.infer_toponet)

    ITERS = 20
    results = {}
    runners = {}
    for name, fn in [("sampler", sampler_only),
                     ("toponet", toponet_fp32_fetch),
                     ("full_int16", toponet_full)]:
        @jax.jit
        def run(params, feats, pts, tgt, vp, fn=fn):
            def step(c, _):
                out = fn(params, feats, pts, tgt, vp)
                s = jnp.abs(out.astype(jnp.float32)).sum()
                return c + s * 1e-30, s
            _, ss = jax.lax.scan(step, jnp.zeros(()), None, length=ITERS)
            return ss
        float(run(params, feats, points_u16, tgt, valid_packed)[0])
        runners[name] = run
        print(f"# {name}: compiled", flush=True)

    times = {k: [] for k in runners}
    for r in range(5):
        for name, run in runners.items():
            t0 = time.time()
            float(run(params, feats, points_u16, tgt, valid_packed)[0])
            times[name].append((time.time() - t0) / ITERS)
    for name, ts in times.items():
        results[name + "_ms"] = round(min(ts) * 1e3, 2)
        results[name + "_ms_rounds"] = [round(t * 1e3, 2) for t in ts]
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
