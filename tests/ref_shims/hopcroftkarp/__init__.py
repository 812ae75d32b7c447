"""Pure-Python stand-in for the `hopcroftkarp` PyPI package so the REFERENCE
TOPO implementation can run unmodified as an oracle.

API surface used by the reference (topo/topo.py:808,886):
    HopcroftKarp({left_vertex: set(right_vertices)}).maximum_matching()
returning a dict containing BOTH directions of every matched pair (so
len(result) == 2 * matching_cardinality — the reference only consumes the
cardinality, which is unique for any maximum matching).

Implemented as Hopcroft-Karp (BFS layering + DFS augmentation), the same
algorithm as the real package.
"""

import collections

_INF = float("inf")


class HopcroftKarp:
    def __init__(self, graph):
        # left vertices are the dict keys; right vertices the set members.
        self._graph = {k: set(v) for k, v in graph.items()}

    def maximum_matching(self):
        graph = self._graph
        left = list(graph.keys())
        match_l = {u: None for u in left}
        match_r = {}
        dist = {}

        def bfs():
            queue = collections.deque()
            for u in left:
                if match_l[u] is None:
                    dist[u] = 0
                    queue.append(u)
                else:
                    dist[u] = _INF
            found = False
            while queue:
                u = queue.popleft()
                for v in graph[u]:
                    w = match_r.get(v)
                    if w is None:
                        found = True
                    elif dist[w] == _INF:
                        dist[w] = dist[u] + 1
                        queue.append(w)
            return found

        def dfs(u):
            for v in graph[u]:
                w = match_r.get(v)
                if w is None or (dist[w] == dist[u] + 1 and dfs(w)):
                    match_l[u] = v
                    match_r[v] = u
                    return True
            dist[u] = _INF
            return False

        while bfs():
            for u in left:
                if match_l[u] is None:
                    dfs(u)

        result = {}
        for u, v in match_l.items():
            if v is not None:
                result[u] = v
                result[v] = u
        return result
