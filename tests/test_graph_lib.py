"""Geometry/graph library tests.

The first block ports the reference's 11 unit tests (reference:
graph_utils.py:635-750) as behavioral goldens; the rest are property tests of
the new vectorized implementations against brute-force oracles.
"""

import numpy as np
import pytest

from sam_road_tpu import graph as G


# ---------- ported reference goldens ----------


def test_remove_isolated_nodes():
    nodes = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    edges = [[0, 2]]
    new_nodes, new_edges = G.remove_isolate_nodes(nodes, edges)
    np.testing.assert_array_equal(new_nodes, np.array([[0.0, 0.0], [2.0, 2.0]]))
    np.testing.assert_array_equal(np.array(new_edges), np.array([[0, 1]]))


def test_merge_nodes():
    nodes = np.array([[0.0, 0.0], [1.0, 1.0], [1.1, 1.1], [2.0, 2.0], [0.1, 0.1]])
    edges = [[0, 1], [1, 2], [1, 3], [2, 3], [2, 4]]
    new_nodes, new_edges = G.merge_nodes(nodes, edges, 0.2)
    np.testing.assert_almost_equal(
        new_nodes, np.array([[0.05, 0.05], [1.05, 1.05], [2.0, 2.0]])
    )
    np.testing.assert_array_equal(
        np.array(sorted(new_edges)), np.array([[0, 1], [1, 2]])
    )


def test_split_edges():
    nodes = np.array([[0.0, 0.0], [1.01, 1.01], [2.0, 2.0], [2.0, 0.0]])
    edges = [[0, 1], [1, 2], [0, 2], [2, 3]]
    new_nodes, new_edges = G.split_edges(nodes, edges, 0.2)
    np.testing.assert_almost_equal(new_nodes, nodes)
    np.testing.assert_array_equal(
        np.array(sorted(new_edges)), np.array([[0, 1], [1, 2], [2, 3]])
    )


def test_combine_graphs():
    nodes0 = np.array([[0.0, 0.0], [1.0, 0.0]])
    nodes1 = np.array([[2.0, 2.0], [3.0, 3.0]])
    new_nodes, new_edges = G.combine_graphs([(nodes0, [[0, 1]]), (nodes1, [[0, 1]])])
    np.testing.assert_almost_equal(
        new_nodes, np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 2.0], [3.0, 3.0]])
    )
    np.testing.assert_array_equal(np.array(new_edges), np.array([[0, 1], [2, 3]]))


def test_convert_to_sat2graph_format():
    nodes = np.array([[0.0, 0.0], [1.1, 1.1], [1.6, 1.6]])
    edges = np.array([[0, 1], [1, 2]])
    result = G.convert_to_sat2graph_format(nodes, edges)
    gt = {(0, 0): [(1, 1)], (1, 1): [(0, 0), (2, 2)], (2, 2): [(1, 1)]}
    assert set(result.keys()) == set(gt.keys())
    for k, v in result.items():
        assert set(v) == set(gt[k])


def test_convert_from_sat2graph_format():
    graph = {(0, 0): [(1, 1)], (1, 1): [(0, 0), (2, 2)], (2, 2): [(1, 1)]}
    nodes, edges = G.convert_from_sat2graph_format(graph)
    np.testing.assert_almost_equal(nodes, np.array([[0, 0], [1, 1], [2, 2]]))
    np.testing.assert_almost_equal(
        np.array(edges), np.array([[0, 1], [1, 0], [1, 2], [2, 1]])
    )


def test_convert_from_nx():
    nx = pytest.importorskip("networkx")
    graph = nx.Graph()
    graph.add_edge((1, 2), (3, 4))
    graph.add_edge((3, 4), (5, 6))
    nodes, edges = G.convert_from_nx(graph)
    np.testing.assert_almost_equal(nodes, np.array([[2, 1], [4, 3], [6, 5]]))
    np.testing.assert_almost_equal(edges, np.array([[0, 1], [1, 2]]))


def test_graph_from_adj_dict():
    adj = {(1, 2): [(3, 4), (5, 6)], (3, 4): [(1, 2), (5, 6)]}
    rc2xy = lambda x: x[:, ::-1]
    g = G.graph_from_adj_dict(adj, rc2xy)
    assert g.edges.shape[0] == 3
    assert g.n_vertices == 3
    assert g.points[0][0] == 2
    assert g.points[0][1] == 1


def test_find_crossover_points():
    adj = {(0, 1): [(10, 1)], (2, -2): [(2, 10)], (10, 1): [(20, 1)]}
    rc2xy = lambda x: x[:, ::-1]
    g = G.graph_from_adj_dict(adj, rc2xy)
    pts = G.find_crossover_points(g)
    assert len(pts) == 1
    np.testing.assert_almost_equal(np.array([1.0, 2.0]), np.array(pts[0]))


def test_subdivide_graph():
    adj = {(0, 0): [(10, 0)], (10, 0): [(20, 0)]}
    rc2xy = lambda x: x[:, ::-1]
    g = G.graph_from_adj_dict(adj, rc2xy)
    g1 = G.subdivide_graph(g, resolution=2.0)
    assert g1.points.shape[0] == 11
    assert g1.edges.shape[0] == 10


def test_filter_nodes():
    nodes = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    edges = np.array([[0, 1], [1, 2]])
    keep = np.array([True, False, True])
    new_nodes, new_edges = G.filter_nodes(nodes, edges, keep)
    np.testing.assert_array_equal(new_nodes, np.array([[0.0, 0.0], [2.0, 2.0]]))
    assert new_edges.shape[0] == 0


# ---------- property tests vs brute-force oracles ----------


def _naive_nms(points, scores, radius):
    """Direct transcription of the reference greedy loop semantics."""
    order = np.argsort(scores)[::-1]
    pts = points[order]
    sc = scores[order]
    kept = np.ones(len(pts), dtype=bool)
    for idx in range(len(pts)):
        if not kept[idx]:
            continue
        d = np.linalg.norm(pts - pts[idx], axis=1)
        nbr = np.where(d <= radius)[0]
        kept[nbr] = sc[nbr] > 1.0
        kept[idx] = True
    return pts[kept], order[kept]


def test_nms_matches_naive():
    rng = np.random.default_rng(0)
    for _ in range(5):
        pts = rng.uniform(0, 200, size=(300, 2))
        scores = rng.uniform(0.0, 1.0, size=300)
        scores[rng.choice(300, 10, replace=False)] = 2.0  # immune points
        got_pts, got_idx = G.nms_points(pts, scores, radius=8.0, return_indices=True)
        want_pts, want_idx = _naive_nms(pts, scores, radius=8.0)
        np.testing.assert_array_equal(got_idx, want_idx)
        np.testing.assert_allclose(got_pts, want_pts)


def test_nms_empty():
    pts, idx = G.nms_points(np.zeros((0, 2)), np.zeros(0), 8.0, return_indices=True)
    assert pts.shape == (0, 2) and idx.shape == (0,)


def test_point_grid_index_matches_bruteforce():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-50, 150, size=(500, 2))
    idx = G.PointGridIndex(pts, cell_size=16)
    for _ in range(20):
        x0, y0 = rng.uniform(-60, 140, 2)
        x1, y1 = x0 + rng.uniform(0, 80), y0 + rng.uniform(0, 80)
        got = set(idx.query_box((x0, y0, x1, y1)).tolist())
        want = set(
            np.where(
                (pts[:, 0] >= x0) & (pts[:, 0] <= x1) & (pts[:, 1] >= y0) & (pts[:, 1] <= y1)
            )[0].tolist()
        )
        assert got == want


def test_bfs_with_conditions_matches_reference_semantics():
    # Queue-based oracle transcribed from reference graph_utils.py:594-630.
    from collections import deque

    def oracle(graph, start, stop_nodes, max_depth):
        visited = set()
        q = deque([(start, 0)])
        while q:
            node, depth = q.popleft()
            visited.add(node)
            if node in stop_nodes or depth >= max_depth:
                continue
            for nbr in graph.neighbors(node):
                if nbr not in visited:
                    q.append((int(nbr), depth + 1))
        return visited

    rng = np.random.default_rng(2)
    for _ in range(10):
        n = 40
        e = rng.integers(0, n, size=(60, 2))
        g = G.ArrayGraph(n, e)
        start = int(rng.integers(0, n))
        stops = set(rng.integers(0, n, size=5).tolist())
        depth = int(rng.integers(1, 6))
        assert G.bfs_with_conditions(g, start, stops, depth) == oracle(
            g, start, stops, depth
        )


def test_subdivide_spacing():
    # Interior points spaced ~resolution along a long edge.
    g = G.ArrayGraph(2, [[0, 1]], points=[[0.0, 0.0], [100.0, 0.0]])
    g1 = G.subdivide_graph(g, resolution=4)
    assert g1.points.shape[0] == 2 + 24  # 25 pieces
    xs = np.sort(g1.points[:, 0])
    np.testing.assert_allclose(np.diff(xs), 4.0)


def test_polylines_roundtrip():
    coords = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [2.0, 1.0]])
    edges = [[0, 1], [1, 2], [2, 3]]
    polylines = G.get_polylines_from_road_graph(coords, edges, 7)
    assert len(polylines) == 1
    assert polylines[0].shape == (7, 2)
    np.testing.assert_allclose(polylines[0][0], [0.0, 0.0])
    np.testing.assert_allclose(polylines[0][-1], [2.0, 1.0])
    # Arc-length uniform spacing
    d = np.linalg.norm(np.diff(polylines[0], axis=0), axis=1)
    np.testing.assert_allclose(d, d[0])


def test_merge_into_large_graph_pipeline():
    nodes = np.array([[0.0, 0.0], [0.05, 0.0], [10.0, 0.0], [5.0, 0.05], [50.0, 50.0]])
    edges = [[0, 2], [1, 2], [3, 3]]
    out_nodes, out_edges = G.merge_into_large_graph(nodes, edges, 0.2, 0.2)
    # node 4 isolated -> dropped; 0/1 merged; edge 0-2 split at node 3
    assert out_nodes.shape[0] == 3
    assert len(out_edges) == 2


def test_polyline_connectivity():
    a = np.array([[0.0, 0.0], [1.0, 0.0]])
    b = np.array([[1.0, 0.05], [2.0, 0.0]])
    c = np.array([[5.0, 5.0], [6.0, 5.0]])
    pairs, endpoints = G.get_polyline_connectivity([a, b, c], dist_threshold=0.2)
    assert (0, 1) in pairs and (1, 0) in pairs
    assert not any(2 in p for p in pairs)


def test_trace_segment_and_find_segments():
    # path 0-1-2-3 plus a branch at 2 -> segments split at the branch node
    edges = [[0, 1], [1, 0], [1, 2], [2, 1], [2, 3], [3, 2], [2, 4], [4, 2]]
    coords = np.array([[0, 0], [1, 0], [2, 0], [3, 0], [2, 1]], float)
    adj = G.edge_list_to_adj_table(coords, edges)
    segments = G.find_segments_in_road_graph(adj)
    flattened = sorted(tuple(sorted((s[0], s[-1]))) for s in segments)
    assert flattened == [(0, 2), (2, 3), (2, 4)]
