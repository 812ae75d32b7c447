"""Fine-grained profile of the host extract step and the phase-2 fetch tail.

Questions this answers (round 4):
  1. Inside extract_graph_points (0.16 s of region wall): how much is mask
     thresholding (np.where over 2048^2) vs the three NMS passes?
  2. Inside p2_fetch (0.22 s): how much is WAITING for the scoring queue vs
     the actual link transfer of the int16 score stacks? (Decides whether
     device-side edge aggregation can pay: it removes transfer bytes from
     the tail but not compute wait.)

Run on the TPU: python tools/profile_extract_p2.py
"""

import time

import numpy as np


def main():
    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from sam_road_tpu.config import load_config
    from sam_road_tpu.graph.extraction import get_points_and_scores_from_mask
    from sam_road_tpu.graph.nms import nms_points
    from sam_road_tpu.inference.engine import TiledInferenceEngine
    from sam_road_tpu.models.sam_road import init_params

    base = dict(
        DATASET="cityscale",
        PATCH_SIZE=512,
        INFER_BATCH_SIZE=32,
        INFER_PATCHES_PER_EDGE=16,
        SAMPLE_MARGIN=64,
        COMPUTE_DTYPE="bfloat16",
        TOPO_SAMPLE_NUM=512,
        FUSED_ENCODER=True,
    )
    config = load_config(overrides=base)
    params = init_params(config)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(2048, 2048, 3), dtype=np.uint8)

    engine = TiledInferenceEngine(config, params)
    _, _, kp_mask, road_mask = engine.infer_one_img(img)
    engine.config.ITSC_THRESHOLD = float(np.quantile(kp_mask / 255.0, 0.99))
    engine.config.ROAD_THRESHOLD = float(np.quantile(road_mask / 255.0, 0.92))
    nodes, edges, kp_mask, road_mask = engine.infer_one_img(img)
    print("nodes", nodes.shape[0], "edges", edges.shape[0])
    print("engine timings", engine.last_timings)

    # ---- 1. extract breakdown (pure host, masks already fetched) ----
    cfg = engine.config
    for _ in range(3):
        t0 = time.time()
        kp_c, kp_s = get_points_and_scores_from_mask(
            kp_mask, cfg.ITSC_THRESHOLD * 255)
        t1 = time.time()
        kps_0 = nms_points(kp_c, kp_s, cfg.ITSC_NMS_RADIUS)
        t2 = time.time()
        rd_c, rd_s = get_points_and_scores_from_mask(
            road_mask, cfg.ROAD_THRESHOLD * 255)
        t3 = time.time()
        kps_1 = nms_points(rd_c, rd_s, cfg.ROAD_NMS_RADIUS)
        t4 = time.time()
        cand = np.concatenate([kps_0, kps_1], axis=0)
        sc = np.concatenate(
            [np.ones((kps_0.shape[0],)), np.zeros((kps_1.shape[0],))])
        _ = nms_points(cand, sc, cfg.ROAD_NMS_RADIUS)
        t5 = time.time()
        print(
            f"extract: kp_thresh {t1-t0:.4f} ({kp_c.shape[0]} cand) "
            f"kp_nms {t2-t1:.4f} ({kps_0.shape[0]}) "
            f"road_thresh {t3-t2:.4f} ({rd_c.shape[0]} cand) "
            f"road_nms {t4-t3:.4f} ({kps_1.shape[0]}) "
            f"final_nms {t5-t4:.4f} total {t5-t0:.4f}"
        )

    # ---- 2. p2 fetch anatomy: run a region, but instrument the pending
    # scores fetch: block on the LAST scoring program (queue drain) first,
    # then time the pure transfer. ----
    # Re-run phase 1 + extraction to set up phase 2 state exactly as
    # _finish does, then replicate its dispatch loop.
    for rep in range(3):
        p1 = engine._run_phase1(img)
        md = p1["masks_dev"]
        if isinstance(md, tuple) and md[0] == "stream":
            masks_u8 = np.concatenate(
                [np.asarray(c) for c in md[1:]], axis=1)
        else:
            masks_u8 = np.asarray(md)
        fkp = np.ascontiguousarray(masks_u8[..., 0])
        frd = np.ascontiguousarray(masks_u8[..., 1])
        from sam_road_tpu.graph.extraction import extract_graph_points
        from sam_road_tpu.inference.pairs import build_pairs_for_boxes
        graph_points = extract_graph_points(fkp, frd, cfg)
        B = engine.batch_size
        max_nbr = int(cfg.MAX_NEIGHBOR_QUERIES)
        radius = float(cfg.NEIGHBOR_RADIUS)
        from sam_road_tpu.inference.engine import _bucket_size, _round_up

        pending = []
        tb0 = time.time()
        for feats_b, info in p1["batches"]:
            boxes = np.array(
                [
                    (e[1][0], e[1][1], e[2][0], e[2][1])
                    if e is not None else (0.0, 0.0, -1.0, -1.0)
                    for e in info
                ], np.float64)
            per_patch = build_pairs_for_boxes(
                graph_points, boxes, max_nbr, radius)
            max_pts = max(p[1].shape[0] for p in per_patch)
            if max_pts == 0:
                continue
            S = _bucket_size(max_pts, engine.point_bucket)
            bpoints = np.zeros((B, S, 2), np.uint16)
            btgt = np.zeros((B, S, max_nbr), np.int16)
            bvalid = np.zeros((B, S, max_nbr), bool)
            for i, (pidx, pts, pairs, valid) in enumerate(per_patch):
                n = pts.shape[0]
                bpoints[i, :n] = pts
                btgt[i, :n] = pairs[..., 1]
                bvalid[i, :n] = valid
            bvp = np.packbits(bvalid, axis=-1)
            sd = engine._phase2(
                engine.params, feats_b, p1["put_batch"](bpoints),
                p1["put_batch"](btgt), p1["put_batch"](bvp))
            pending.append((sd, per_patch))
        tb1 = time.time()
        # drain the scoring queue: block on last program's output
        jax.block_until_ready(pending[-1][0])
        # one tiny fetch to fence through the link for real
        _ = np.asarray(pending[-1][0][:1, :1, :1])
        tb2 = time.time()
        # now time the pure transfer of the stacks, queue empty
        by_shape = {}
        for bi, (sd, _) in enumerate(pending):
            by_shape.setdefault(sd.shape, []).append(bi)
        nbytes = 0
        tb3 = time.time()
        for shape, idxs in by_shape.items():
            maxn = max(
                (p[1].shape[0] for bi in idxs for p in pending[bi][1]),
                default=0)
            maxn_c = min(shape[1], _round_up(max(maxn, 1), 32))
            stacked = np.asarray(
                jax.numpy.stack(
                    [pending[bi][0] for bi in idxs])[:, :, :maxn_c])
            nbytes += stacked.nbytes
        tb4 = time.time()
        print(
            f"p2[{rep}]: build+dispatch {tb1-tb0:.4f} "
            f"queue_drain {tb2-tb1:.4f} pure_fetch {tb4-tb3:.4f} "
            f"({nbytes/1e6:.2f} MB, {len(pending)} batches)"
        )


if __name__ == "__main__":
    main()
