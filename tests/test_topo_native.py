"""Native TOPO kernels (native/topo.cc) vs the pure-Python spec: the marble
stream, bounded location distances, match counts and full-tile scores must
be EXACTLY equal (the C++ is compiled with -ffp-contract=off so doubles
track Python bit-for-bit)."""

import numpy as np
import pytest

from sam_road_tpu.metrics import _native
from sam_road_tpu.metrics.latlon import distance
from sam_road_tpu.metrics.topo import _match_count, topo_score_one_tile
from sam_road_tpu.metrics.topo_graph import create_graph_from_adj


def _grid_adj(size=384, spacing=96, step=8, seed=0, jitter=0.0, drop=0.0):
    rng = np.random.default_rng(seed)
    adj = {}

    def add(a, b):
        adj.setdefault(a, [])
        adj.setdefault(b, [])
        if b not in adj[a]:
            adj[a].append(b)
        if a not in adj[b]:
            adj[b].append(a)

    for y in range(spacing // 2, size, spacing):
        pts = [(int(round(y + jitter * rng.normal())), x)
               for x in range(0, size + 1, step)]
        if rng.random() >= drop:
            for i in range(len(pts) - 1):
                add(pts[i], pts[i + 1])
    for x in range(spacing // 2, size, spacing):
        pts = [(y, int(round(x + jitter * rng.normal())))
               for y in range(0, size + 1, step)]
        if rng.random() >= drop:
            for i in range(len(pts) - 1):
                add(pts[i], pts[i + 1])
    return adj


needs_native = pytest.mark.skipif(
    _native.load_topo_native() is None, reason="native topo lib unavailable"
)


@pytest.fixture()
def force_python():
    """Context helper: runs a callable with the native lib disabled."""
    def run(fn):
        dll = _native._NATIVE
        _native._NATIVE = None
        try:
            return fn()
        finally:
            _native._NATIVE = dll

    return run


@needs_native
def test_walk_stream_bit_identical(force_python):
    g, _ = create_graph_from_adj(_grid_adj())
    edges = sorted(g.edgeHash)[::7][:20]
    for a, b in edges:
        l = distance(g.nodes[a], g.nodes[b])
        for bidir in (False, True):
            kw = dict(step=0.00005, r=0.0015, newstyle=True, nid1=a, nid2=b,
                      dist1=0.3 * l, dist2=0.7 * l, bidirection=bidir)
            nat = np.asarray(g.TOPOWalk(1, **kw))
            py = np.asarray(
                force_python(lambda: g.TOPOWalk(1, **kw)), dtype=np.float64
            ).reshape(-1, 4)
            assert nat.shape == py.shape
            np.testing.assert_array_equal(nat, py)


@needs_native
def test_loc_distance_identical(force_python):
    g, _ = create_graph_from_adj(_grid_adj())
    edges = sorted(g.edgeHash)
    for i in range(30):
        a, b = edges[(i * 11) % len(edges)]
        c, d = edges[(i * 29 + 5) % len(edges)]
        l1 = distance(g.nodes[a], g.nodes[b])
        l2 = distance(g.nodes[c], g.nodes[d])
        loc1 = (a, b, 0.4 * l1, 0.6 * l1)
        loc2 = (c, d, 0.5 * l2, 0.5 * l2)
        nat = g.distanceBetweenTwoLocation(loc1, loc2, 0.0003)
        py = force_python(
            lambda: g.distanceBetweenTwoLocation(loc1, loc2, 0.0003)
        )
        assert nat == py


@needs_native
def test_match_count_identical(force_python):
    rng = np.random.default_rng(3)
    base = np.array([41.0, -71.0, 0.0, 0.0])
    scale = np.array([1e-4, 1e-4, 1e-3, 1e-3])
    src = [tuple(r) for r in rng.normal(size=(400, 4)) * scale + base]
    tgt = [tuple(r) for r in rng.normal(size=(500, 4)) * scale + base]
    for one2one in (False, True):
        nat = _match_count(src, tgt, 0.00015, one2one)
        py = force_python(lambda: _match_count(src, tgt, 0.00015, one2one))
        assert nat == py


@needs_native
def test_full_tile_score_identical(force_python):
    gt = _grid_adj(size=512, seed=0)
    prop = _grid_adj(size=512, seed=1, jitter=1.0, drop=0.1)
    nat = topo_score_one_tile(gt, prop)
    py = force_python(lambda: topo_score_one_tile(gt, prop))
    assert nat == py
    assert 0 <= nat[2] <= 1
