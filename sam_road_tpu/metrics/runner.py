"""Metric evaluation runner (reference: cityscale_metrics/eval_schedule.bash +
apls.bash + topo.bash + apls.py + topo.py).

Per run dir (containing graph/<tile>.p pickles): per-tile APLS (native C++
binary or Python fallback) and TOPO, then aggregation into
score/{apls,topo}.json with the reference's statistics.
"""

from __future__ import annotations

import json
import os
import pickle
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from sam_road_tpu.data.partitions import (
    cityscale_data_partition,
    spacenet_data_partition,
)
from sam_road_tpu.metrics.apls import (
    apls_score,
    sat2graph_to_apls_json,
)
from sam_road_tpu.metrics.apls_native import apls_score_files_native
from sam_road_tpu.metrics.topo import topo_score_one_tile


def _tiles_and_gt(dataset: str, data_root: str):
    if dataset == "cityscale":
        _, _, tiles = cityscale_data_partition()
        gt_pattern = os.path.join(
            data_root, "cityscale/20cities/region_{}_graph_gt.pickle"
        )
    else:
        _, _, tiles = spacenet_data_partition(
            os.path.join(data_root, "spacenet/data_split.json")
        )
        gt_pattern = os.path.join(data_root, "spacenet/RGB_1.0_meter/{}__gt_graph.p")
    return tiles, gt_pattern


def _apls_one_tile(args):
    (tile, gt_path, pred_path, results_dir, use_native, spacenet) = args
    gt_adj = pickle.load(open(gt_path, "rb"))
    prop_adj = pickle.load(open(pred_path, "rb"))
    gt_json = sat2graph_to_apls_json(gt_adj)
    prop_json = sat2graph_to_apls_json(prop_adj)
    out_txt = os.path.join(results_dir, f"{tile}.txt")
    score = None
    if use_native:
        gt_tmp = os.path.join(results_dir, f"{tile}_gt.json")
        prop_tmp = os.path.join(results_dir, f"{tile}_prop.json")
        json.dump(gt_json, open(gt_tmp, "w"))
        json.dump(prop_json, open(prop_tmp, "w"))
        score = apls_score_files_native(gt_tmp, prop_tmp, out_txt,
                                        spacenet=spacenet)
        os.remove(gt_tmp)
        os.remove(prop_tmp)
    if score is None:
        a, b, m = apls_score(gt_json, prop_json, spacenet=spacenet)
        with open(out_txt, "w") as f:
            f.write("%f %f %f\n" % (a, b, m))
        score = (a, b, m)
    return tile, score[2]


def evaluate_apls(run_dir: str, dataset: str = "cityscale", data_root: str = ".",
                  use_native: bool = True, tiles=None, workers: int = 0):
    """Per-tile APLS -> results/apls/<tile>.txt -> score/apls.json
    (reference: apls.bash + apls.py; tiles scored in parallel processes)."""
    spacenet = dataset == "spacenet"
    all_tiles, gt_pattern = _tiles_and_gt(dataset, data_root)
    tiles = tiles if tiles is not None else all_tiles
    results_dir = os.path.join(run_dir, "results", "apls")
    os.makedirs(results_dir, exist_ok=True)
    jobs = [
        (t, gt_pattern.format(t), os.path.join(run_dir, "graph", f"{t}.p"),
         results_dir, use_native, spacenet)
        for t in tiles
        if os.path.exists(os.path.join(run_dir, "graph", f"{t}.p"))
    ]
    jobs = [(t, g, p, r, u, s) for (t, g, p, r, u, s) in jobs]
    workers = workers or min(len(jobs), max(1, (os.cpu_count() or 2) // 2))
    scores = []
    if jobs:
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for tile, m in ex.map(_apls_one_tile, jobs):
                print(f"APLS {tile}: {m:.4f}", flush=True)
                scores.append(m)
    score_dir = os.path.join(run_dir, "score")
    os.makedirs(score_dir, exist_ok=True)
    mean = float(np.mean(scores)) if scores else 0.0
    with open(os.path.join(score_dir, "apls.json"), "w") as jf:
        json.dump({"apls": scores, "final_APLS": mean}, jf)
    print("APLS", mean)
    return mean


def _topo_one_tile(args):
    (tile, gt_path, pred_path, results_dir, spacenet) = args
    gt_adj = pickle.load(open(gt_path, "rb"))
    prop_adj = pickle.load(open(pred_path, "rb"))
    out_txt = os.path.join(results_dir, f"{tile}.txt")
    p, r, f = topo_score_one_tile(gt_adj, prop_adj, spacenet=spacenet,
                                  outputfile=out_txt)
    return tile, p, r, f


def evaluate_topo(run_dir: str, dataset: str = "cityscale", data_root: str = ".",
                  tiles=None, workers: int = 0):
    """Per-tile TOPO -> results/topo/<tile>.txt -> score/topo.json
    (reference: topo.bash + topo/main.py + topo.py; tiles scored in parallel
    processes — the marble/hole walks are ~100 s/tile at city density)."""
    spacenet = dataset == "spacenet"
    all_tiles, gt_pattern = _tiles_and_gt(dataset, data_root)
    tiles = tiles if tiles is not None else all_tiles
    results_dir = os.path.join(run_dir, "results", "topo")
    os.makedirs(results_dir, exist_ok=True)
    jobs = [
        (t, gt_pattern.format(t), os.path.join(run_dir, "graph", f"{t}.p"),
         results_dir, spacenet)
        for t in tiles
        if os.path.exists(os.path.join(run_dir, "graph", f"{t}.p"))
    ]
    workers = workers or min(len(jobs), max(1, os.cpu_count() or 2))
    precision, recall, f1 = [], [], []
    if jobs:
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for tile, p, r, f in ex.map(_topo_one_tile, jobs):
                print(f"TOPO {tile}: P={p:.4f} R={r:.4f} F1={f:.4f}", flush=True)
                precision.append(p)
                recall.append(r)
                f1.append(f)
    score_dir = os.path.join(run_dir, "score")
    os.makedirs(score_dir, exist_ok=True)
    out = {
        "mean topo": [
            float(np.mean(f1)) if f1 else 0.0,
            float(np.mean(precision)) if precision else 0.0,
            float(np.mean(recall)) if recall else 0.0,
        ],
        "prec": precision,
        "recall": recall,
        "f1": f1,
    }
    with open(os.path.join(score_dir, "topo.json"), "w") as jf:
        json.dump(out, jf)
    print("TOPO", out["mean topo"])
    return out["mean topo"][0]


def evaluate_run(run_dir: str, dataset: str = "cityscale", data_root: str = ".",
                 use_native: bool = True, tiles=None):
    """Full eval schedule for one run dir (reference: eval_schedule.bash)."""
    apls = evaluate_apls(run_dir, dataset, data_root, use_native, tiles)
    topo = evaluate_topo(run_dir, dataset, data_root, tiles)
    return {"apls": apls, "topo_f1": topo}
