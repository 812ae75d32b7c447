"""Profile the TOPO metric on a realistic synthetic 2048px city tile.

Builds a jittered street grid (~100px spacing, nodes every ~8px along roads,
like the cityscale GT pickles), perturbs it into a "proposal", and times
topo_score_one_tile. Run with --profile for a cProfile breakdown.
"""

import argparse
import time

import numpy as np


def make_city_adj(size=2048, spacing=128, node_step=8, seed=0, jitter=0.0,
                  drop_frac=0.0):
    """Jittered street grid as a sat2graph adjacency dict {(r,c): [(r,c)..]}."""
    rng = np.random.default_rng(seed)
    adj = {}

    def add_edge(a, b):
        adj.setdefault(a, [])
        adj.setdefault(b, [])
        if b not in adj[a]:
            adj[a].append(b)
        if a not in adj[b]:
            adj[b].append(a)

    def add_polyline(pts):
        for i in range(len(pts) - 1):
            add_edge(pts[i], pts[i + 1])

    lines = []
    for y in range(spacing // 2, size, spacing):  # horizontal streets
        pts = []
        for x in range(0, size + 1, node_step):
            yy = y + jitter * rng.normal()
            pts.append((int(round(yy)), int(x)))
        lines.append(pts)
    for x in range(spacing // 2, size, spacing):  # vertical streets
        pts = []
        for y in range(0, size + 1, node_step):
            xx = x + jitter * rng.normal()
            pts.append((int(y), int(round(xx))))
        lines.append(pts)
    keep = rng.random(len(lines)) >= drop_frac
    for ln, k in zip(lines, keep):
        if k:
            add_polyline(ln)
    return adj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--size", type=int, default=2048)
    args = ap.parse_args()

    from sam_road_tpu.metrics.topo import topo_score_one_tile

    gt = make_city_adj(size=args.size, seed=0)
    prop = make_city_adj(size=args.size, seed=1, jitter=1.5, drop_frac=0.06)
    print(f"gt nodes={len(gt)} prop nodes={len(prop)}")

    if args.profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        p, r, f1 = topo_score_one_tile(gt, prop)
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(25)
    else:
        t0 = time.time()
        p, r, f1 = topo_score_one_tile(gt, prop)
        print(f"time={time.time() - t0:.2f}s")
    print(f"P={p:.4f} R={r:.4f} F1={f1:.4f}")


if __name__ == "__main__":
    main()
