"""`rtree.index` shim: exact bbox-intersection queries over a flat store.

Uses numpy arrays for the query scan so the reference TOPO's O(marbles x
holes) matching loops stay tractable; the returned id SET is exactly what
libspatialindex would return (inclusive interval overlap on both axes).
"""

import numpy as np


class Index:
    def __init__(self, *args, **kwargs):
        self._ids = []
        self._boxes = []
        self._arr = None  # lazily built [N, 4] float64
        self._ids_arr = None

    def insert(self, id_, bbox):
        x0, y0, x1, y1 = (float(v) for v in bbox)
        self._ids.append(int(id_))
        self._boxes.append((x0, y0, x1, y1))
        self._arr = None

    def _materialize(self):
        if self._arr is None:
            self._arr = np.asarray(self._boxes, dtype=np.float64).reshape(-1, 4)
            self._ids_arr = np.asarray(self._ids, dtype=np.int64)
        return self._arr, self._ids_arr

    def intersection(self, bbox):
        if not self._ids:
            return iter(())
        qx0, qy0, qx1, qy1 = (float(v) for v in bbox)
        arr, ids = self._materialize()
        hit = (
            (arr[:, 0] <= qx1)
            & (arr[:, 2] >= qx0)
            & (arr[:, 1] <= qy1)
            & (arr[:, 3] >= qy0)
        )
        return iter(int(i) for i in ids[hit])
