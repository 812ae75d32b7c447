"""Host-side road-graph geometry library.

Re-implements the capability surface of the reference's graph_utils.py /
graph_extraction.py (reference: graph_utils.py:1-753) as a self-contained,
vectorized numpy library: array-backed graphs (instead of igraph), a uniform
grid spatial index (instead of rtree), exact segment geometry (instead of
shapely), greedy point NMS, and the large-map merge operators.
"""

from sam_road_tpu.graph.structure import (
    ArrayGraph,
    graph_from_adj_dict,
    subdivide_graph,
    bfs_with_conditions,
)
from sam_road_tpu.graph.spatial import PointGridIndex, RectGridIndex
from sam_road_tpu.graph.geometry import (
    segments_intersect,
    find_crossover_points,
    point_segment_distance,
)
from sam_road_tpu.graph.nms import nms_points
from sam_road_tpu.graph.convert import (
    convert_to_sat2graph_format,
    convert_from_sat2graph_format,
    convert_from_nx,
    edge_list_to_adj_table,
    filter_nodes,
)
from sam_road_tpu.graph.merge import (
    remove_isolate_nodes,
    merge_nodes,
    split_edges,
    combine_graphs,
    merge_into_large_graph,
)
from sam_road_tpu.graph.polylines import (
    trace_segment,
    find_segments_in_road_graph,
    normalize_segments,
    get_resampled_polylines,
    get_polylines_from_road_graph,
    get_polyline_connectivity,
)

__all__ = [
    "ArrayGraph",
    "graph_from_adj_dict",
    "subdivide_graph",
    "bfs_with_conditions",
    "PointGridIndex",
    "RectGridIndex",
    "segments_intersect",
    "find_crossover_points",
    "point_segment_distance",
    "nms_points",
    "convert_to_sat2graph_format",
    "convert_from_sat2graph_format",
    "convert_from_nx",
    "edge_list_to_adj_table",
    "filter_nodes",
    "remove_isolate_nodes",
    "merge_nodes",
    "split_edges",
    "combine_graphs",
    "merge_into_large_graph",
    "trace_segment",
    "find_segments_in_road_graph",
    "normalize_segments",
    "get_resampled_polylines",
    "get_polylines_from_road_graph",
    "get_polyline_connectivity",
]
