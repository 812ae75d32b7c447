"""Road-graph metric suite: APLS and TOPO.

Behavioral port of the reference's cityscale_metrics/ + spacenet_metrics/
(Go APLS scorer + Python TOPO scorer), preserving their idiosyncrasies
(duplicate-marble bidirection hack, 1.0 penalty for unmatched APLS pairs,
cross-graph coverage propagation) so scores are comparable. The APLS
production path is a C++ binary (native/apls.cc); a pure-Python fallback
validates it and serves environments without a toolchain.
"""

from sam_road_tpu.metrics.latlon import xy2latlon, gps_distance
from sam_road_tpu.metrics.topo_graph import TopoGraph, create_graph_from_adj
from sam_road_tpu.metrics.topo import (
    TOPOGenerateStartingPoints,
    TOPOGeneratePairs,
    TOPOWithPairs,
    topo_score_one_tile,
)
from sam_road_tpu.metrics.apls import apls_score, sat2graph_to_apls_json

__all__ = [
    "xy2latlon",
    "gps_distance",
    "TopoGraph",
    "create_graph_from_adj",
    "TOPOGenerateStartingPoints",
    "TOPOGeneratePairs",
    "TOPOWithPairs",
    "topo_score_one_tile",
    "apls_score",
    "sat2graph_to_apls_json",
]
