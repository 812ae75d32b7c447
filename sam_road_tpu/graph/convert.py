"""Graph format converters (sat2graph adjacency dict <-> array graphs).

Mirrors the behavior of reference graph_utils.py:40-94 and 383-453: the
sat2graph format is a dict {(r, c): [(r, c) neighbor, ...]} used by the GT
pickles, the saved inference outputs, and the metric suite.
"""

from __future__ import annotations

import numpy as np


def filter_nodes(node_array, edge_array, keep_node):
    """Drop masked-out nodes, reindex edges, drop dangling edges
    (reference: graph_utils.py:40-59)."""
    node_array = np.asarray(node_array)
    edge_array = np.asarray(edge_array).reshape(-1, 2)
    keep_node = np.asarray(keep_node, dtype=bool)
    new_nodes = node_array[keep_node, :]
    old_node_num = node_array.shape[0]
    keep_indices = np.where(keep_node)[0]
    new_node_num = keep_indices.shape[0]
    old_to_new = np.full((old_node_num,), -1, dtype=np.int32)
    old_to_new[keep_indices] = np.arange(new_node_num, dtype=np.int32)
    new_edges = old_to_new[edge_array.flatten()].reshape(-1, 2)
    keep_edge = np.all(new_edges > -1, axis=-1)
    return new_nodes, new_edges[keep_edge, :]


def edge_list_to_adj_table(nodes, edges):
    """Adjacency table as a list of neighbor-index sets
    (reference: graph_utils.py:82-93)."""
    node_num = len(nodes)
    adj_table = [set() for _ in range(node_num)]
    for edge in edges:
        start_idx, end_idx = int(edge[0]), int(edge[1])
        adj_table[start_idx].add(end_idx)
    return adj_table


def convert_to_sat2graph_format(nodes, edges) -> dict:
    """Array graph -> sat2graph dict with symmetrized edges and rounded int
    (row, col) keys (reference: graph_utils.py:383-405)."""
    nodes = np.asarray(nodes)
    edges = np.asarray(edges).reshape(-1, 2)
    reverse_edges = edges[:, ::-1]
    all_edges = np.concatenate((edges, reverse_edges), axis=0)
    adj_table = edge_list_to_adj_table(nodes, all_edges)
    int_nodes = [(round(float(x)), round(float(y))) for x, y in nodes]
    result = dict()
    for node_idx, neighbor_indices in enumerate(adj_table):
        key = int_nodes[node_idx]
        result[key] = [int_nodes[ni] for ni in neighbor_indices]
    return result


def convert_from_sat2graph_format(graph: dict):
    """sat2graph dict -> (nodes [N, 2], edge index list). Edges keep both
    directions and are NOT de-duplicated (reference: graph_utils.py:408-434).
    Node order follows first appearance in dict iteration."""
    node_to_idx = dict()
    for node, neighbors in graph.items():
        if node not in node_to_idx:
            node_to_idx[node] = len(node_to_idx)
        for neighbor in neighbors:
            if neighbor not in node_to_idx:
                node_to_idx[neighbor] = len(node_to_idx)
    edges = list()
    for node, neighbors in graph.items():
        for neighbor in neighbors:
            edges.append((node_to_idx[node], node_to_idx[neighbor]))
    num_nodes = len(node_to_idx)
    nodes = [None] * num_nodes
    for node, idx in node_to_idx.items():
        nodes[idx] = node
    return np.array(nodes), edges


def convert_from_nx(graph):
    """networkx-like graph with (x, y) nodes -> ((r, c) nodes, edges)
    (reference: graph_utils.py:437-453). Accepts any object exposing
    .nodes() and .edges() iterables."""
    node_to_idx = dict()
    nodes = list()
    edges = list()
    for node in graph.nodes():
        if node not in node_to_idx:
            node_to_idx[node] = len(node_to_idx)
        x, y = node
        nodes.append((y, x))  # to (row, col)
    for node_0, node_1 in graph.edges():
        edges.append((node_to_idx[node_0], node_to_idx[node_1]))
    return np.array(nodes), np.array(edges)


def inspect_graph(node_array, edge_array):
    """Debug statistics: one-way edge count + near-duplicate node count
    (reference: graph_utils.py:18-37)."""
    node_array = np.asarray(node_array)
    edge_set = {(int(e[0]), int(e[1])) for e in np.asarray(edge_array).reshape(-1, 2)}
    one_way_edge_count = sum(1 for s, d in edge_set if (d, s) not in edge_set)
    print(f"DEBUG: One-way-edge count {one_way_edge_count}")
    diff = node_array[:, None, :] - node_array[None, :, :]
    dist = np.sqrt((diff**2).sum(-1))
    dup = (np.sum(dist < 0.1) - node_array.shape[0]) / 2
    print(f"DEBUG: duplicate_node_count: {dup}")
    return one_way_edge_count, dup
