"""Instrument the LIVE streamed phase-1 schedule (bench config, taper on).

Replays engine._phase1_streamed step-for-step (same memoized programs, same
plan) with timestamps, to find where the measured phase-1 wall exceeds the
ideal [first-slab upload + device compute + last-chunk fetch] budget
(~1.2-1.3 s per tools/profile_phase1.py + the async-device_put probe,
2026-08-19) while bench records 1.45-1.8 s.

Records, per run:
  slab_disp[i]   host time when device_put(slab i) RETURNED (async dispatch)
  slab_ready[i]  time slab i actually finished arriving (bg thread blocks)
  band_disp[i]   host time when band i's jitted program call returned
  chunk_ready[i] time band i's finalized chunk was computed (bg thread)
  fetch_done[i]  time np.asarray(chunk i) returned in _finish order
  p1_wall / extract / phase2 from engine.last_timings

Run: python tools/probe_stream_sched.py [n_rounds]
"""

import json
import sys
import threading
import time

import numpy as np


def main(rounds=3):
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
    _, _, kp_mask, road_mask = eng.infer_one_img(img)  # warm compile
    eng.config.ITSC_THRESHOLD = float(np.quantile(kp_mask / 255.0, 0.99))
    eng.config.ROAD_THRESHOLD = float(np.quantile(road_mask / 255.0, 0.92))
    eng.infer_one_img(img)  # workload warm

    B = eng.batch_size
    image_size = img.shape[0]
    all_patch_info = get_patch_info_one_img(
        0, image_size, cfg.SAMPLE_MARGIN, eng.patch_size,
        cfg.INFER_PATCHES_PER_EDGE)
    plan = eng._stream_plan(all_patch_info, image_size,
                            int(cfg.INFER_STREAM_BANDS or 2))
    assert plan is not None
    k = len(plan)

    def instrumented_run():
        """engine._phase1_streamed with timestamps; then eng._finish."""
        rec = dict(slab_disp=[], slab_ready=[None] * k,
                   band_disp=[], chunk_ready=[None] * k,
                   fetch_done=[], seg_slice_s=[])
        threads = []
        t00 = time.time()
        H, W = img.shape[0], img.shape[1]
        slab_lo = [0] + [b["e"] for b in plan[:-1]]
        slabs = []
        for i, (lo, b) in enumerate(zip(slab_lo, plan)):
            sb = jax.device_put(np.ascontiguousarray(img[:, lo:b["e"]]))
            rec["slab_disp"].append(time.time() - t00)
            slabs.append(sb)

            def wait_slab(i=i, sb=sb):
                sb.block_until_ready()
                rec["slab_ready"][i] = time.time() - t00
            th = threading.Thread(target=wait_slab)
            th.start()
            threads.append(th)

        def coords(info_slice, x_off):
            r = len(info_slice) // B
            x0s = np.zeros((r, B), np.int32)
            y0s = np.zeros((r, B), np.int32)
            for j, (_, (x0, y0), _) in enumerate(info_slice):
                x0s[j // B, j % B] = x0 - x_off
                y0s[j // B, j % B] = y0
            w = np.ones((r, B), np.int32)
            return jnp.asarray(x0s), jnp.asarray(y0s), jnp.asarray(w)

        chunks, batches = [], []
        prev = None
        for i, b in enumerate(plan):
            a, e = b["a"], b["e"]
            band_w = e - a
            t_seg = time.time()
            segs, seg_ws = [], []
            for j, (lo, sb) in enumerate(zip(slab_lo, slabs)):
                hi = plan[j]["e"]
                if hi <= a or lo >= e:
                    continue
                s0 = max(a - lo, 0)
                segs.append(sb[:, s0:])
                seg_ws.append(hi - lo - s0)
            rec["seg_slice_s"].append(round(time.time() - t_seg, 4))
            info = all_patch_info[b["i0"]:b["i1"]]
            x0s, y0s, w = coords(info, a)
            seed_w = 0 if prev is None else prev[3] - a
            prog = eng._get_stream_band_prog(
                H, band_w, seg_ws, len(info) // B, seed_w)
            args = [eng.params] + segs + [x0s, y0s, w]
            if prev is not None:
                off = a - prev[2]
                args += [prev[0][:, off:], prev[1][:, off:]]
            feats, fused, cnt = prog(*args)
            rec["band_disp"].append(time.time() - t00)
            chunk_end = plan[i + 1]["a"] if i + 1 < k else W
            ch = eng._get_stream_fin(H, band_w, chunk_end - a)(fused, cnt)
            chunks.append(ch)

            def wait_chunk(i=i, ch=ch):
                jax.tree_util.tree_leaves(ch)[0].block_until_ready()
                rec["chunk_ready"][i] = time.time() - t00
            th = threading.Thread(target=wait_chunk)
            th.start()
            threads.append(th)
            for r in range(len(info) // B):
                batches.append((feats[r], list(info[r * B:(r + 1) * B])))
            prev = (fused, cnt, a, e)

        # ---- _finish's fetch, instrumented ----
        fetched = []
        for ch in chunks:
            fetched.append(np.asarray(ch))
            rec["fetch_done"].append(time.time() - t00)
        masks_u8 = np.concatenate(fetched, axis=1)
        p1_wall = time.time() - t00
        for th in threads:
            th.join()
        # hand off to the real _finish for extract/phase2 timing
        p1 = dict(image_size=image_size,
                  batches=batches,
                  masks_dev=("stream_prefetched", masks_u8),
                  put_batch=lambda x: jnp.asarray(x), t0=t00)
        # _finish expects masks_dev; emulate with already-fetched array
        md = p1["masks_dev"]
        p1["masks_dev"] = masks_u8
        out = eng._finish(p1)
        rec["p1_wall"] = round(p1_wall, 3)
        rec["engine_timings"] = {
            kk: round(vv, 3) for kk, vv in eng.last_timings.items()}
        rec["total"] = round(time.time() - t00, 3)
        for key in ("slab_disp", "slab_ready", "band_disp",
                    "chunk_ready", "fetch_done"):
            rec[key] = [round(v, 3) for v in rec[key]]
        return rec

    # interleave: plain engine run / instrumented run
    for r in range(rounds):
        t0 = time.time()
        eng.infer_one_img(img)
        plain = time.time() - t0
        pt = {kk: round(vv, 3) for kk, vv in eng.last_timings.items()}
        rec = instrumented_run()
        print(json.dumps({"round": r, "plain_total": round(plain, 3),
                          "plain_timings": pt, "instr": rec}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
