"""Isolate the streamed-band DEVICE overhead vs the whole-region scan.

The live-schedule probe (probe_stream_sched.py) suggested the k=4 band
programs take ~1.32 s of device time vs ~1.05 s for the single
whole-region scan program — ~0.27 s of split overhead. This probe
removes every transfer from the measurement: all slabs (and the whole
image) are device-resident up front, each program is dispatched and
block_until_ready'd, and the two paths alternate in one process so
weather drift cancels.

Per round, prints device-seconds for:
  whole    the single whole-region scan program
  bands    sum over the k band programs (chained seeds) + fin programs
  per_band each band program individually

Run: python tools/probe_band_overhead.py [rounds]
"""

import json
import sys
import time

import numpy as np


def main(rounds=4):
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
        COMPUTE_DTYPE="bfloat16", TOPO_SAMPLE_NUM=512, FUSED_ENCODER=True,
    ))
    params = init_params(cfg)
    eng = TiledInferenceEngine(cfg, params)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(2048, 2048, 3), dtype=np.uint8)
    eng.infer_one_img(img)  # warm all programs

    B = eng.batch_size
    H, W = img.shape[0], img.shape[1]
    image_size = img.shape[0]
    all_patch_info = get_patch_info_one_img(
        0, image_size, cfg.SAMPLE_MARGIN, eng.patch_size,
        cfg.INFER_PATCHES_PER_EDGE)
    plan = eng._stream_plan(all_patch_info, image_size,
                            int(cfg.INFER_STREAM_BANDS or 2))
    k = len(plan)
    slab_lo = [0] + [b["e"] for b in plan[:-1]]
    slabs = [jax.device_put(np.ascontiguousarray(img[:, lo:b["e"]]))
             for lo, b in zip(slab_lo, plan)]
    img_dev = jax.device_put(img)
    jax.block_until_ready(slabs + [img_dev])

    def coords(info_slice, x_off):
        r = len(info_slice) // B
        x0s = np.zeros((r, B), np.int32)
        y0s = np.zeros((r, B), np.int32)
        for j, (_, (x0, y0), _) in enumerate(info_slice):
            x0s[j // B, j % B] = x0 - x_off
            y0s[j // B, j % B] = y0
        w = np.ones((r, B), np.int32)
        return jnp.asarray(x0s), jnp.asarray(y0s), jnp.asarray(w)

    # pre-build per-band static args (device-resident)
    band_args = []
    for i, b in enumerate(plan):
        a, e = b["a"], b["e"]
        segs, seg_ws = [], []
        for j, (lo, sb) in enumerate(zip(slab_lo, slabs)):
            hi = plan[j]["e"]
            if hi <= a or lo >= e:
                continue
            s0 = max(a - lo, 0)
            segs.append(sb[:, s0:])
            seg_ws.append(hi - lo - s0)
        info = all_patch_info[b["i0"]:b["i1"]]
        band_args.append((a, e, segs, seg_ws, coords(info, a),
                          len(info) // B))

    # whole-region scan program (feats + finalized masks in ONE program,
    # engine.py _phase1_region) — warm it explicitly, the streamed engine
    # path doesn't compile it
    xs_all, ys_all, w_all = coords(all_patch_info, 0)
    jax.block_until_ready(
        eng._phase1_region(eng.params, img_dev, xs_all, ys_all, w_all))

    def run_whole():
        t0 = time.time()
        out = eng._phase1_region(eng.params, img_dev, xs_all, ys_all, w_all)
        jax.block_until_ready(out)
        return time.time() - t0

    def run_bands():
        ts = []
        prev = None
        fins = []
        t_all0 = time.time()
        for i, (a, e, segs, seg_ws, (x0s, y0s, w), nr) in enumerate(
                band_args):
            seed_w = 0 if prev is None else prev[3] - a
            prog = eng._get_stream_band_prog(H, e - a, seg_ws, nr, seed_w)
            args = [eng.params] + segs + [x0s, y0s, w]
            if prev is not None:
                off = a - prev[2]
                args += [prev[0][:, off:], prev[1][:, off:]]
            t0 = time.time()
            feats, fused, cnt = prog(*args)
            jax.block_until_ready((feats, fused, cnt))
            ts.append(round(time.time() - t0, 3))
            chunk_end = plan[i + 1]["a"] if i + 1 < k else W
            fins.append(eng._get_stream_fin(H, e - a, chunk_end - a)(
                fused, cnt))
            prev = (fused, cnt, a, e)
        jax.block_until_ready(fins)
        return round(time.time() - t_all0, 3), ts

    def run_bands_async():
        """Live-engine schedule: dispatch every band + fin with NO
        intermediate host blocking (device chains on data deps), block
        once at the end — the pure device-pipeline cost of the split."""
        prev = None
        fins = []
        outs = []
        t0 = time.time()
        for i, (a, e, segs, seg_ws, (x0s, y0s, w), nr) in enumerate(
                band_args):
            seed_w = 0 if prev is None else prev[3] - a
            prog = eng._get_stream_band_prog(H, e - a, seg_ws, nr, seed_w)
            args = [eng.params] + segs + [x0s, y0s, w]
            if prev is not None:
                off = a - prev[2]
                args += [prev[0][:, off:], prev[1][:, off:]]
            feats, fused, cnt = prog(*args)
            outs.append(feats)
            chunk_end = plan[i + 1]["a"] if i + 1 < k else W
            fins.append(eng._get_stream_fin(H, e - a, chunk_end - a)(
                fused, cnt))
            prev = (fused, cnt, a, e)
        jax.block_until_ready((outs, fins))
        return round(time.time() - t0, 3)

    for r in range(rounds):
        tw = run_whole()
        tb, per = run_bands()
        ta = run_bands_async()
        tw2 = run_whole()
        print(json.dumps({
            "round": r, "whole": round(tw, 3), "whole2": round(tw2, 3),
            "bands_total": tb, "bands_async": ta, "per_band": per,
            "overhead_async_vs_mean_whole": round(ta - (tw + tw2) / 2, 3),
        }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
