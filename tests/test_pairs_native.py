"""Native phase-2 pair builder (native/pairs.cc) vs the scipy fallback:
identical point sets and identical pair/valid edge sets (ties on exact
distance are excluded from the fixture — nearest-k tie order is ambiguous in
any implementation, including the reference's scipy path)."""

import numpy as np
import pytest

import sam_road_tpu.inference.pairs as pairs_mod
from sam_road_tpu.inference.pairs import build_pairs_for_boxes

needs_native = pytest.mark.skipif(
    pairs_mod._load_native() is None, reason="native pairs lib unavailable"
)


def _edges(per_patch):
    es = set()
    for pidx, pts, pairs, valid in per_patch:
        for i in range(pts.shape[0]):
            for j in range(valid.shape[1]):
                if valid[i, j]:
                    es.add((int(pidx[pairs[i, j, 0]]), int(pidx[pairs[i, j, 1]])))
    return es


@needs_native
def test_native_matches_scipy_fallback():
    rng = np.random.default_rng(0)
    # continuous coords -> no exact distance ties
    points = rng.uniform(0, 1024, (600, 2))
    boxes = np.array(
        [(x, y, x + 256, y + 256) for x in (0, 200, 700) for y in (0, 300, 760)]
        + [(0.0, 0.0, -1.0, -1.0)],  # degenerate (padding slot)
        np.float64,
    )
    nat = build_pairs_for_boxes(points, boxes, 8, 48.0)
    dll = pairs_mod._NATIVE
    pairs_mod._NATIVE = None
    try:
        py = build_pairs_for_boxes(points, boxes, 8, 48.0)
    finally:
        pairs_mod._NATIVE = dll

    assert len(nat) == len(py) == len(boxes)
    for (pi_n, pts_n, _, _), (pi_p, pts_p, _, _) in zip(nat, py):
        np.testing.assert_array_equal(np.sort(pi_n), np.sort(pi_p))
    assert _edges(nat) == _edges(py)
    # degenerate box -> empty
    assert nat[-1][0].shape[0] == 0


@needs_native
def test_native_neighbor_cap_and_radius():
    # a 5-point cross: center has 4 neighbors at distance 10; cap at 2 keeps
    # the nearest two (ties broken deterministically); radius excludes d >= r
    points = np.array([[50.0, 50.0], [60.0, 50.0], [40.0, 50.0],
                       [50.0, 58.0], [50.0, 90.0]])
    boxes = np.array([[0.0, 0.0, 100.0, 100.0]])
    (pidx, pts, pairs, valid), = build_pairs_for_boxes(points, boxes, 2, 15.0)
    assert pts.shape[0] == 5
    # center point (index 0 after sort): nearest are (50,58) d=8 then one of
    # the d=10 pair
    c = int(np.where(pidx == 0)[0][0])
    assert valid[c].sum() == 2
    nbr_global = {int(pidx[pairs[c, j, 1]]) for j in range(2) if valid[c, j]}
    assert 3 in nbr_global  # d=8 neighbor always kept
    # far point (50,90): nearest real neighbor is (50,58) at d=32 >= 15 -> none
    f = int(np.where(pidx == 4)[0][0])
    assert valid[f].sum() == 0


@needs_native
def test_exact_radius_boundary_excluded():
    # scipy's distance_upper_bound excludes d == bound; native must too
    points = np.array([[0.0, 0.0], [15.0, 0.0], [5.0, 0.0]])
    boxes = np.array([[-1.0, -1.0, 20.0, 20.0]])
    (pidx, pts, pairs, valid), = build_pairs_for_boxes(points, boxes, 4, 15.0)
    a = int(np.where(pidx == 0)[0][0])
    nbrs = {int(pidx[pairs[a, j, 1]]) for j in range(4) if valid[a, j]}
    assert nbrs == {2}  # d=5 in, d=15 boundary out
