"""Phase-2 pair building: per patch, box-query the region's graph vertices
and connect each to its nearest neighbors within NEIGHBOR_RADIUS (reference:
inferencer.py:148-176).

Native fast path (native/pairs.cc) does the box gather + kNN for every patch
of a batch in one call — the scipy per-patch cKDTree construction this
replaces cost ~0.3 s per 2048px region, most of phase 2's host half. The
scipy fallback preserves the original behavior when the toolchain is
unavailable (neighbor sets may differ only on exact distance ties, where
nearest-k is ambiguous in any implementation)."""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _load_native():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    try:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        src = os.path.join(root, "native", "pairs.cc")
        if not os.path.exists(src) or shutil.which("g++") is None:
            return None
        build_dir = os.path.join(root, "native", "build")
        os.makedirs(build_dir, exist_ok=True)
        lib = os.path.join(build_dir, "libsamroad_pairs.so")
        if not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", lib, src],
                check=True, capture_output=True,
            )
        dll = ctypes.CDLL(lib)
        dll.samroad_build_pairs.restype = ctypes.c_int64
        dll.samroad_build_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _NATIVE = dll
    except Exception:
        _NATIVE = None
    return _NATIVE


def build_pairs_for_boxes(graph_points, boxes, max_nbr: int, radius: float,
                          cap: int = 512):
    """For each box (x0, y0, x1, y1): vertices inside it, their patch-local
    f32 coords, kNN pairs and validity.

    Returns a list of (pidx [m], pts [m, 2] f32, pairs [m, max_nbr, 2],
    valid [m, max_nbr] bool) per box. Degenerate boxes (x1 < x0) yield
    empties.
    """
    graph_points = np.ascontiguousarray(graph_points, dtype=np.float64)
    boxes = np.ascontiguousarray(boxes, dtype=np.float64).reshape(-1, 4)
    nb = boxes.shape[0]
    dll = _load_native()
    if dll is not None and graph_points.shape[0] > 0:
        while True:
            counts = np.zeros(nb, np.int32)
            pidx = np.zeros((nb, cap), np.int64)
            pts = np.zeros((nb, cap, 2), np.float32)
            pairs = np.zeros((nb, cap, max_nbr, 2), np.int32)
            valid = np.zeros((nb, cap, max_nbr), np.uint8)
            got = dll.samroad_build_pairs(
                graph_points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                graph_points.shape[0],
                boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nb,
                max_nbr, float(radius), cap,
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                pidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if got <= cap:
                break
            cap = int(got)
        return [
            (pidx[b, :counts[b]].copy(), pts[b, :counts[b]].copy(),
             pairs[b, :counts[b]].copy(), valid[b, :counts[b]].astype(bool))
            for b in range(nb)
        ]

    # ---- scipy fallback (original host path) ----
    from scipy.spatial import cKDTree

    from sam_road_tpu.graph.spatial import PointGridIndex

    index = PointGridIndex(graph_points, cell_size=max(radius, 1.0))
    out = []
    for x0, y0, x1, y1 in boxes:
        if x1 < x0 or y1 < y0 or graph_points.shape[0] == 0:
            out.append((np.zeros(0, np.int64), np.zeros((0, 2), np.float32),
                        np.zeros((0, max_nbr, 2), np.int64),
                        np.zeros((0, max_nbr), bool)))
            continue
        pidx = np.sort(index.query_box((x0, y0, x1, y1)))
        pts = graph_points[pidx].astype(np.float32) - np.array(
            [[x0, y0]], np.float32
        )
        n = pts.shape[0]
        if n > 0:
            tree = cKDTree(pts)
            _, knn_idx = tree.query(
                pts, k=min(max_nbr + 1, max(n, 2)),
                distance_upper_bound=radius,
            )
            if knn_idx.ndim == 1:
                knn_idx = knn_idx[:, None]
            knn_idx = knn_idx[:, 1:]  # drop self
            if knn_idx.shape[1] < max_nbr:
                pad = np.full((n, max_nbr - knn_idx.shape[1]), n, dtype=np.int64)
                knn_idx = np.concatenate([knn_idx, pad], axis=1)
            src = np.tile(np.arange(n)[:, None], (1, max_nbr))
            valid = knn_idx < n
            tgt = np.where(valid, knn_idx, src)
            pairs = np.stack([src, tgt], axis=-1)
        else:
            pairs = np.zeros((0, max_nbr, 2), np.int64)
            valid = np.zeros((0, max_nbr), bool)
        out.append((pidx, pts, pairs, valid))
    return out
