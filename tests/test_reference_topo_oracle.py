"""Run the REFERENCE TOPO implementation, unmodified, as an oracle.

The reference metric (/root/reference/cityscale_metrics/topo/{topo,graph}.py)
is pure Python but depends on `rtree` and `hopcroftkarp`, absent in this
environment; tests/ref_shims vendors behavior-equivalent stand-ins so the
reference files execute by path, byte-for-byte unmodified. The driver below
replicates topo/main.py:52-154 (create_graph, region, starting points,
pairs, TOPOWithPairs) and the scores are asserted equal to our port
(sam_road_tpu.metrics.topo.topo_score_one_tile) on perfect, degraded and
jittered synthetic graphs.

This is the cross-validation VERDICT r3 asked for: until now the port was
only validated port-vs-port (Python spec vs C++); a silent spec drift (e.g.
in the TOPOGeneratePairs angle gate, reference topo/topo.py:242-370) would
have gone undetected.
"""

import importlib
import math
import os
import sys

import numpy as np
import pytest

REF_TOPO_DIR = "/root/reference/cityscale_metrics/topo"
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_shims")

LAT_TOP_LEFT = 41.0
LON_TOP_LEFT = -71.0

_REF_MODULE_NAMES = (
    "graph", "topo", "showTOPO", "rtree", "rtree.index", "hopcroftkarp",
    "svgwrite",
)


@pytest.fixture(scope="module")
def ref_topo():
    """Import the reference topo/graph modules by path, with shimmed deps.

    The flat module names ('graph', 'topo') are popped from sys.modules
    afterwards so they cannot shadow anything else in the session.
    """
    if not os.path.isdir(REF_TOPO_DIR):
        pytest.skip("reference checkout not available")
    saved = {n: sys.modules.pop(n) for n in _REF_MODULE_NAMES if n in sys.modules}
    sys.path.insert(0, SHIM_DIR)
    sys.path.insert(0, REF_TOPO_DIR)
    try:
        splfy = importlib.import_module("graph")
        topo_mod = importlib.import_module("topo")
        assert topo_mod.__file__.startswith(REF_TOPO_DIR)
        yield splfy, topo_mod
    finally:
        sys.path.remove(SHIM_DIR)
        sys.path.remove(REF_TOPO_DIR)
        for n in _REF_MODULE_NAMES:
            sys.modules.pop(n, None)
        sys.modules.update(saved)


def _xy2latlon(x, y):
    # reference: topo/main.py:56-60
    lat = LAT_TOP_LEFT - x * 1.0 / 111111.0
    lon = LON_TOP_LEFT + (y * 1.0 / 111111.0) / math.cos(
        math.radians(LAT_TOP_LEFT))
    return lat, lon


def reference_topo_score(splfy, topo_mod, gt_adj, prop_adj, out_txt):
    """Replicates the reference driver topo/main.py:52-154 for one tile."""
    state = {"min_lat": LAT_TOP_LEFT, "max_lon": LON_TOP_LEFT}

    def create_graph(m):
        # reference: topo/main.py:63-122 (the dead inner `getid` omitted)
        graph = splfy.RoadGraph()
        nid = 0
        idmap = {}
        for k, v in m.items():
            lat1, lon1 = _xy2latlon(k[0], k[1])
            state["min_lat"] = min(state["min_lat"], lat1)
            state["max_lon"] = max(state["max_lon"], lon1)
            for n2 in v:
                lat2, lon2 = _xy2latlon(n2[0], n2[1])
                if k in idmap:
                    id1 = idmap[k]
                else:
                    id1 = nid
                    idmap[k] = nid
                    nid += 1
                if n2 in idmap:
                    id2 = idmap[n2]
                else:
                    id2 = nid
                    idmap[n2] = nid
                    nid += 1
                graph.addEdge(id1, lat1, lon1, id2, lat2, lon2)
        graph.ReverseDirectionLink()
        for node in graph.nodes.keys():
            graph.nodeScore[node] = 100
        for edge in graph.edges.keys():
            graph.edgeScore[edge] = 100
        return graph

    graph_gt = create_graph(gt_adj)
    graph_prop = create_graph(prop_adj)
    region = [
        state["min_lat"] - 300 * 1.0 / 111111.0,
        LON_TOP_LEFT - 500 * 1.0 / 111111.0,
        LAT_TOP_LEFT + 300 * 1.0 / 111111.0,
        state["max_lon"] + 500 * 1.0 / 111111.0,
    ]
    graph_gt.region = region
    graph_prop.region = region

    losm = topo_mod.TOPOGenerateStartingPoints(
        graph_gt, region=region, image="NULL", check=False, direction=False,
        metaData=None)
    lmap = topo_mod.TOPOGeneratePairs(
        graph_prop, graph_gt, losm, threshold=0.00010, region=region)
    r = 0.00300
    if LAT_TOP_LEFT - state["min_lat"] < 0.01000:
        r = 0.00150
    result = topo_mod.TOPOWithPairs(
        graph_prop, graph_gt, lmap, losm, r=r, step=0.00005,
        threshold=0.00010, outputfile=out_txt, one2oneMatching=True,
        metaData=None)
    p, rcl = topo_mod.topoAvg(result)
    overall_recall = rcl * len(result) / float(len(losm))
    return p, overall_recall, result, len(losm), len(lmap)


# ------------------------------------------------------------- fixtures ----

def grid_adj(size=1536, spacing=256, sub=32, drop=(), jitter=0.0, seed=0):
    """Symmetric sat2graph adjacency dict of a street grid with polyline
    vertices every `sub` px (like real Cityscale GT pickles). `drop` removes
    whole street segments (pairs of intersection grid indices); `jitter`
    perturbs every vertex by U(-j, j) px."""
    rng = np.random.default_rng(seed)
    n = size // spacing
    adj = {}

    def jit(p):
        if jitter <= 0.0:
            return p
        # deterministic per-vertex offset, consistent across both uses
        h = np.random.default_rng(
            (seed, int(p[0] * 8), int(p[1] * 8))).uniform(-jitter, jitter, 2)
        return (p[0] + float(h[0]), p[1] + float(h[1]))

    def add_chain(p0, p1):
        x0, y0 = p0
        x1, y1 = p1
        length = max(abs(x1 - x0), abs(y1 - y0))
        k = max(int(length // sub), 1)
        pts = [
            (x0 + (x1 - x0) * t / k, y0 + (y1 - y0) * t / k)
            for t in range(k + 1)
        ]
        pts = [jit(p) for p in pts]
        for a, b in zip(pts[:-1], pts[1:]):
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)

    for i in range(1, n):
        for j in range(1, n):
            x, y = i * spacing, j * spacing
            if j + 1 < n and ((i, j), (i, j + 1)) not in drop:
                add_chain((x, y), (x, y + spacing))
            if i + 1 < n and ((i, j), (i + 1, j)) not in drop:
                add_chain((x, y), (x + spacing, y))
    return adj


CASES = {
    "perfect": dict(gt=dict(), prop=dict()),
    "degraded": dict(
        gt=dict(),
        prop=dict(drop=(((2, 2), (2, 3)), ((3, 2), (4, 2)), ((4, 4), (4, 5)))),
    ),
    "jittered": dict(gt=dict(), prop=dict(jitter=2.5, seed=7)),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_reference_topo_oracle_agrees(ref_topo, case, tmp_path):
    splfy, topo_mod = ref_topo
    spec = CASES[case]
    gt_adj = grid_adj(**spec["gt"])
    prop_adj = grid_adj(**spec["prop"])

    ref_p, ref_or, ref_result, ref_n_losm, ref_n_pairs = reference_topo_score(
        splfy, topo_mod, gt_adj, prop_adj, str(tmp_path / "ref.txt"))

    from sam_road_tpu.metrics.topo import topo_score_one_tile

    p, overall_recall, f1 = topo_score_one_tile(gt_adj, prop_adj)

    assert ref_n_losm > 50, "fixture too small to be meaningful"
    assert p == pytest.approx(ref_p, abs=1e-9)
    assert overall_recall == pytest.approx(ref_or, abs=1e-9)
    if case == "perfect":
        assert ref_p == pytest.approx(1.0, abs=1e-9)
        assert ref_or == pytest.approx(1.0, abs=1e-9)
    if case == "degraded":
        assert ref_or < 0.999  # the metric actually noticed the damage
