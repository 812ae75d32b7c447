"""Auditable derivation of the reference pipeline's per-region wall time.

The reference (htcr/sam_road) commits no inference-time number in-tree — its
inferencer only writes a wall-time sum per run (reference:
inferencer.py:271-281,345-349). This script derives a defensible estimate of
the reference's 2048px Cityscale region time on an A100-class GPU from first
principles plus measurements that CAN be made in this environment:

  T_region = T_device (analytic FLOPs / assumed A100 efficiency)
           + T_host   (the reference's Python host loops, TIMED ON THIS HOST
                       at the reference's exact algorithmic shape)
           + T_dispatch (per-batch launch/transfer overhead band)

Device side. The reference inferencer runs fp32 — no autocast/half
(inferencer.py:239-254) and no torch.backends.cuda.matmul.allow_tf32=True
(PyTorch >= 1.12 disables TF32 matmuls by default; the reference, a 2024
torch-2.x codebase, never re-enables it). A100 fp32 CUDA-core peak is 19.5
TFLOP/s; large eager GEMMs reach 60-90% of it, attention's smaller batched
matmuls and the memory-bound LN/GELU/softmax pull whole-model utilization
down to a 35-65% band. Both bounds are carried through, plus a sensitivity
line for a TF32-enabled variant (if a user flips the flag, matmuls move to
tensor cores at 156 TFLOP/s peak).

Host side. Three loops run on the host in the reference per region:
  1. mask -> candidate points + greedy KDTree NMS
     (graph_extraction.py:24-28,130-139, graph_utils.py:572-591)
  2. per-patch rtree box query + KDTree kNN pair building
     (inferencer.py:148-176)
  3. the triple Python aggregation loop over B x N_points x N_pairs
     (inferencer.py:209-221)
These are algorithmically replicated below (same data structures, same
complexity — scipy cKDTree, python dict accumulation) on the workload the
benchmark's calibrated run produces (~1% keypoint px, ~8% road px, ~1800
vertices, 256 patches), and timed on this machine. A100 hosts (EPYC/Xeon)
are comparable to this host for single-threaded Python.

Run: python tools/baseline_derivation.py
The output feeds BASELINE.md and bench.py's REF_A100_REGION_SECONDS.
"""

from __future__ import annotations

import json
import time

import numpy as np

# ---------------------------------------------------------------- FLOPs ----

def vit_b_forward_flops(img: int = 512, patch: int = 16, dim: int = 768,
                        depth: int = 12, heads: int = 12, window: int = 14,
                        n_global: int = 4, out_chans: int = 256) -> dict:
    """Analytic forward FLOPs of the SAM ViT-B encoder + naive decoder at one
    512px patch, mirroring the reference module structure
    (reference: model.py:245-295). Multiply-accumulate = 2 FLOPs."""
    g = img // patch                      # 32 token grid
    n = g * g                             # 1024 tokens
    # windowed blocks pad the grid to a window multiple: 32 -> 42
    gp = ((g + window - 1) // window) * window
    n_pad = gp * gp                       # 1764 tokens
    L_win = window * window               # 196 tokens per window

    f = {}
    f["patch_embed"] = 2 * n * dim * (patch * patch * 3)
    n_windowed = depth - n_global

    def block_flops(tokens, L):
        qkv = 2 * tokens * dim * 3 * dim
        proj = 2 * tokens * dim * dim
        # scores QK^T and AV each: 2 * tokens * L * dim
        attn = 2 * 2 * tokens * L * dim
        # mlp always runs on the unpadded grid (after window unpartition)
        mlp = 2 * n * dim * 4 * dim * 2
        return qkv + proj + attn + mlp

    f["windowed_blocks"] = n_windowed * block_flops(n_pad, L_win)
    f["global_blocks"] = n_global * block_flops(n, n)
    f["neck"] = 2 * n * dim * out_chans + 2 * n * 9 * out_chans * out_chans
    # naive decoder: 4 ConvTranspose2d stages 256->128->64->32->2, kernel 2
    # stride 2 (each output pixel draws from exactly one input pixel)
    dec = 0
    h, cin = g, out_chans
    for cout in (128, 64, 32, 2):
        h *= 2
        dec += 2 * h * h * cout * cin
        cin = cout
    f["decoder"] = dec
    f["total"] = sum(f.values())
    return f


# ------------------------------------------------- host loop measurements --

def time_mask_nms(n_keypoint_px: int, n_road_px: int, itsc_r=8, road_r=16,
                  size=2048) -> float:
    """Reference extract_graph_points: every above-threshold pixel becomes a
    candidate; greedy score-sorted NMS with cKDTree ball queries
    (graph_utils.py:572-591). Returns seconds."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)

    def greedy_nms(pts, scores, radius):
        order = np.argsort(-scores)
        pts = pts[order]
        tree = cKDTree(pts)
        alive = np.ones(len(pts), bool)
        kept = []
        for i in range(len(pts)):
            if not alive[i]:
                continue
            kept.append(i)
            for j in tree.query_ball_point(pts[i], radius):
                if j > i:
                    alive[j] = False
        return pts[kept]

    kp = rng.uniform(0, size, (n_keypoint_px, 2))
    rd = rng.uniform(0, size, (n_road_px, 2))
    t0 = time.time()
    kept_kp = greedy_nms(kp, rng.random(n_keypoint_px), itsc_r)
    kept_rd = greedy_nms(rd, rng.random(n_road_px), road_r)
    # union pass with keypoint priority (graph_extraction.py:130-139)
    allp = np.concatenate([kept_kp, kept_rd])
    scores = np.concatenate([np.ones(len(kept_kp)), np.zeros(len(kept_rd))])
    greedy_nms(allp, scores, itsc_r)
    return time.time() - t0


def time_pair_building(n_vertices: int, n_patches: int = 256,
                       patch: int = 512, region: int = 2048,
                       max_nbr: int = 16, radius: float = 64.0) -> float:
    """Reference pass-2 per-patch work: box query + kNN + pad-collate
    (inferencer.py:148-185). rtree is unavailable here; a vectorized numpy
    box filter UNDERSTATES the reference's per-object rtree cost, keeping the
    estimate conservative."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(1)
    pts = rng.uniform(0, region, (n_vertices, 2))
    stride = (region - patch) // 15
    t0 = time.time()
    for pi in range(n_patches):
        x0 = (pi % 16) * stride
        y0 = (pi // 16) * stride
        m = ((pts[:, 0] >= x0) & (pts[:, 0] < x0 + patch)
             & (pts[:, 1] >= y0) & (pts[:, 1] < y0 + patch))
        local = pts[m]
        if len(local) < 2:
            continue
        tree = cKDTree(local)
        d, idx = tree.query(local, k=min(max_nbr + 1, len(local)),
                            distance_upper_bound=radius)
        # pad-collate copies (inferencer.py:179-185)
        np.zeros((len(local), max_nbr, 2), np.float32)
    return time.time() - t0


def time_triple_aggregation(n_patches: int = 256, pts_per_patch: int = 100,
                            max_nbr: int = 16) -> float:
    """Reference inferencer.py:209-221: pure-Python triple loop with dict
    accumulation per (src, tgt) edge key."""
    rng = np.random.default_rng(2)
    scores = rng.random((n_patches, pts_per_patch, max_nbr))
    pairs = rng.integers(0, 2000, (n_patches, pts_per_patch, max_nbr, 2))
    valid = rng.random((n_patches, pts_per_patch, max_nbr)) > 0.3
    edge_scores, edge_counts = {}, {}
    t0 = time.time()
    for b in range(n_patches):
        for i in range(pts_per_patch):
            for j in range(max_nbr):
                if not valid[b, i, j]:
                    continue
                key = (int(pairs[b, i, j, 0]), int(pairs[b, i, j, 1]))
                edge_scores[key] = edge_scores.get(key, 0.0) + scores[b, i, j]
                edge_counts[key] = edge_counts.get(key, 0) + 1
    return time.time() - t0


def main():
    f = vit_b_forward_flops()
    n_patches = 256
    region_tflops = f["total"] * n_patches / 1e12

    # A100 strict-fp32 (CUDA core) efficiency band for eager PyTorch ViT
    # inference; TF32 sensitivity reported separately.
    fp32_peak = 19.5
    eff_hi, eff_lo = 0.65, 0.35
    t_dev_fast = region_tflops / (fp32_peak * eff_hi)
    t_dev_slow = region_tflops / (fp32_peak * eff_lo)
    tf32_peak = 156.0
    t_dev_tf32 = [region_tflops / (tf32_peak * 0.50),
                  region_tflops / (tf32_peak * 0.25)]

    # Host loops at the calibrated benchmark workload: 2048px region,
    # ~1% keypoint px (42k), ~8% road px (335k), ~1800 final vertices.
    t_nms = time_mask_nms(n_keypoint_px=42_000, n_road_px=335_000)
    t_pairs = time_pair_building(n_vertices=1800)
    t_agg = time_triple_aggregation()

    # Per-batch dispatch/transfer overhead: the reference uploads each patch
    # batch (fp32 crops, 805 MB/region over PCIe ~25 GB/s = 32 ms) and
    # launches 2x4=8 batches of small TopoNet kernels; band 0.2-0.5 s.
    t_disp_fast, t_disp_slow = 0.2, 0.5

    host = t_nms + t_pairs + t_agg
    fast = t_dev_fast + host + t_disp_fast
    slow = t_dev_slow + host + t_disp_slow
    central = (fast + slow) / 2

    print(json.dumps({
        "vit_b_fwd_gflops_per_patch": round(f["total"] / 1e9, 1),
        "flops_breakdown_gflops": {k: round(v / 1e9, 1) for k, v in f.items()},
        "region_tflops_256_patches": round(region_tflops, 1),
        "a100_fp32_assumption": {"peak_tflops": fp32_peak,
                                 "efficiency_band": [eff_lo, eff_hi]},
        "t_device_s": [round(t_dev_fast, 2), round(t_dev_slow, 2)],
        "t_device_if_tf32_enabled_s": [round(t_dev_tf32[0], 2),
                                       round(t_dev_tf32[1], 2)],
        "t_host_measured_s": {"mask_nms": round(t_nms, 2),
                              "pair_building": round(t_pairs, 2),
                              "triple_aggregation": round(t_agg, 2)},
        "t_dispatch_band_s": [t_disp_fast, t_disp_slow],
        "ref_region_seconds": {"optimistic": round(fast, 1),
                               "pessimistic": round(slow, 1),
                               "central": round(central, 1)},
        # 512px tile (patch) throughput: patches are processed in pass 1
        # (inferencer.py:87-104 — encoder fwd + mask accumulation), so the
        # per-tile denominator is device time + the upload/dispatch band;
        # host graph loops are per-region, not per-tile.
        "ref_a100_tiles_per_sec": {
            "optimistic": round(n_patches / (t_dev_fast + t_disp_fast), 1),
            "pessimistic": round(n_patches / (t_dev_slow + t_disp_slow), 1),
            "central": round(
                n_patches / ((t_dev_fast + t_dev_slow) / 2
                             + (t_disp_fast + t_disp_slow) / 2), 1),
        },
        "ref_region_seconds_if_tf32": {
            "optimistic": round(t_dev_tf32[0] + host + t_disp_fast, 1),
            "pessimistic": round(t_dev_tf32[1] + host + t_disp_slow, 1),
        },
    }, indent=2))


if __name__ == "__main__":
    main()
