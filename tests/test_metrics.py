"""Metric suite tests: APLS (Python + C++ cross-validation) and TOPO on
synthetic road graphs with known degradations."""

import shutil

import numpy as np
import pytest

from sam_road_tpu.metrics.apls import (
    apls_score,
    sat2graph_to_apls_json,
)
from sam_road_tpu.metrics.topo import topo_score_one_tile
from sam_road_tpu.metrics.matching import maximum_matching_size


def grid_adj(size=2048, spacing=300, lo=300, hi=1800, drop_edges=()):
    """Street grid as a sat2graph dict with (r, c) keys."""
    adj = {}

    def add(a, b):
        if (a, b) in drop_edges or (b, a) in drop_edges:
            return
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)

    for r in range(lo, hi + 1, spacing):
        for c in range(lo, hi + 1, spacing):
            if c + spacing <= hi:
                add((r, c), (r, c + spacing))
            if r + spacing <= hi:
                add((r, c), (r + spacing, c))
    return adj


def test_hopcroft_karp():
    assert maximum_matching_size({"a": {1}, "b": {1}}) == 1
    assert maximum_matching_size({"a": {1, 2}, "b": {1}}) == 2
    assert maximum_matching_size({}) == 0
    # augmenting-path case: greedy would find 2, maximum is 3
    g = {"a": {1, 2}, "b": {1}, "c": {2, 3}}
    assert maximum_matching_size(g) == 3


def test_apls_identical_graphs_near_one():
    adj = grid_adj()
    j = sat2graph_to_apls_json(adj)
    a, b, m = apls_score(j, j)
    assert m > 0.97, m


def test_apls_degraded_graph_lower():
    gt = grid_adj()
    # drop several central edges -> detours -> APLS drops
    drops = {((900, 900), (900, 1200)), ((900, 900), (1200, 900)),
             ((1200, 1200), (1200, 1500)), ((600, 600), (600, 900))}
    prop = grid_adj(drop_edges=drops)
    m_same = apls_score(sat2graph_to_apls_json(gt), sat2graph_to_apls_json(gt))[2]
    m_degraded = apls_score(sat2graph_to_apls_json(gt), sat2graph_to_apls_json(prop))[2]
    assert m_degraded < m_same - 0.01, (m_same, m_degraded)


def test_apls_empty_proposal():
    gt = grid_adj()
    empty = [[], []]
    a, b, m = apls_score(sat2graph_to_apls_json(gt), empty)
    assert m < 0.1


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_apls_native_matches_python(tmp_path):
    import json

    from sam_road_tpu.metrics.apls_native import apls_score_files_native

    gt = grid_adj()
    drops = {((900, 900), (900, 1200)), ((1200, 1200), (1200, 1500))}
    prop = grid_adj(drop_edges=drops)
    gt_json = sat2graph_to_apls_json(gt)
    prop_json = sat2graph_to_apls_json(prop)

    gt_p = tmp_path / "gt.json"
    prop_p = tmp_path / "prop.json"
    out_p = tmp_path / "out.txt"
    json.dump(gt_json, open(gt_p, "w"))
    json.dump(prop_json, open(prop_p, "w"))
    native = apls_score_files_native(str(gt_p), str(prop_p), str(out_p))
    assert native is not None
    py = apls_score(gt_json, prop_json)
    # same algorithm, independent implementations; small divergence allowed
    # from snapping candidate order
    assert abs(native[2] - py[2]) < 0.02, (native, py)


def test_topo_identical_graphs_perfect():
    adj = grid_adj()
    p, r, f1 = topo_score_one_tile(adj, adj)
    assert p > 0.98, p
    assert r > 0.98, r
    assert f1 > 0.98, f1


def test_topo_missing_road_lowers_recall():
    gt = grid_adj()
    drops = {((900, r * 300), (900, (r + 1) * 300)) for r in range(1, 6)}
    prop = grid_adj(drop_edges=drops)
    p, r, f1 = topo_score_one_tile(gt, prop)
    assert r < 0.97, r
    assert p > 0.9, p  # existing roads still precise


def test_topo_hallucinated_road_lowers_precision():
    gt = grid_adj(spacing=300)
    # proposal adds a dense diagonal road not in GT
    prop = grid_adj(spacing=300)

    def add(a, b):
        prop.setdefault(a, []).append(b)
        prop.setdefault(b, []).append(a)

    diag = [(300 + i * 50, 300 + i * 50) for i in range(0, 25)]
    for a, b in zip(diag[:-1], diag[1:]):
        add(a, b)
    p_perfect, _, _ = topo_score_one_tile(gt, gt)
    p, r, f1 = topo_score_one_tile(gt, prop)
    assert p < p_perfect - 0.005, (p, p_perfect)


def test_topo_empty_proposal():
    gt = grid_adj()
    p, r, f1 = topo_score_one_tile(gt, {(0, 0): [(0, 1)], (0, 1): [(0, 0)]})
    assert f1 < 0.05
