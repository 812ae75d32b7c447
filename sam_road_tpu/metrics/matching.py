"""Hopcroft-Karp maximum bipartite matching (replacement for the missing
hopcroftkarp dependency; only the matching SIZE feeds the TOPO score, and
maximum-matching size is unique)."""

from __future__ import annotations

from collections import deque

INF = float("inf")


def maximum_matching_size(bigraph: dict) -> int:
    """Size of a maximum matching of {left_key: set(right_key)}."""
    left = list(bigraph.keys())
    right_ids = {}
    adj = []
    for u in left:
        row = []
        for v in bigraph[u]:
            if v not in right_ids:
                right_ids[v] = len(right_ids)
            row.append(right_ids[v])
        adj.append(row)
    n_left, n_right = len(left), len(right_ids)
    match_l = [-1] * n_left
    match_r = [-1] * n_right
    dist = [0] * n_left

    def bfs():
        q = deque()
        for u in range(n_left):
            if match_l[u] == -1:
                dist[u] = 0
                q.append(u)
            else:
                dist[u] = INF
        found = False
        while q:
            u = q.popleft()
            for v in adj[u]:
                w = match_r[v]
                if w == -1:
                    found = True
                elif dist[w] == INF:
                    dist[w] = dist[u] + 1
                    q.append(w)
        return found

    def dfs(u):
        for v in adj[u]:
            w = match_r[v]
            if w == -1 or (dist[w] == dist[u] + 1 and dfs(w)):
                match_l[u] = v
                match_r[v] = u
                return True
        dist[u] = INF
        return False

    matching = 0
    while bfs():
        for u in range(n_left):
            if match_l[u] == -1 and dfs(u):
                matching += 1
    return matching
