"""Minimal pure-Python stand-in for the `rtree` package, vendored so the
REFERENCE TOPO implementation (/root/reference/cityscale_metrics/topo) can
run unmodified as an oracle in this environment (libspatialindex is absent).

Only the surface the reference uses is provided: `rtree.index.Index` with
`insert(id, bbox)` and `intersection(bbox)` (reference: topo/topo.py:248-276,
396-401, 625-643, 743-755). Semantics match libspatialindex for that surface:
intersection is an inclusive bbox-overlap test; result ordering is undefined
in the real library and the reference only consumes the results through
min-reductions and set membership, so insertion order here is behaviorally
equivalent.
"""

from . import index  # noqa: F401
