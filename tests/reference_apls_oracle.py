"""TEST-ONLY literal transliteration of the reference APLS scorer
(/root/reference/cityscale_metrics/apls/main.go; the spacenet variant
differs only in the parameter block, spacenet_metrics/apls/main.go:717-726).

The reference's native scorer is Go and no Go toolchain exists in this
environment, so this file is the next-best oracle: a line-by-line port that
preserves every quirk of the Go — including the ones the production
implementations (sam_road_tpu/metrics/apls.py, native/apls.cc) must agree
with. Copying reference logic is sanctioned inside tests/ exactly as
tests/torch_oracle.py is: the oracle must BE the upstream behavior.

Quirks preserved literally (cited into main.go):
- GPSDistance scales by cos(p1.lat) only (main.go:72-77).
- GPSInBound mixes math.Pi and 3.1415926 (main.go:79-93).
- GraphDensify: d > 3.0 -> int(d/2)+1 sub-segments, endpoint locations
  reused exactly, interior points linearly interpolated; node dedup by
  "%.7f_%.7f" string keys (main.go:109-111, 162-247).
- Chain walking from every degree!=2 node; next node found by summing the
  two neighbor ids (main.go:282-291).
- Control-point index arithmetic: idx = int(float64(len)*float64(i)/
  float64(n)) with n = int(len/interval_2)+1 (main.go:297-301).
- lockey dedup: int-truncated 2 m grid keys (main.go:249-251, 305).
- Coverage propagation runs on the PROP graph with a GT node id
  (main.go:312-314, 332-334) — a cross-graph id mixup kept bug-for-bug —
  with the hop budget HARDCODED to 4 (it does not follow prop_step in the
  spacenet variant). The Go propagate applies the action to the start node
  unconditionally even when the id has no adjacency in that graph
  (main.go:38-68: node_cover_map_gt is a Go map, any key allowed).
- Snap: 10 nearest proposal nodes by rtreego's metric — minimum Euclidean
  distance in RAW lat/lon degrees to the tol=1e-6 rectangle centered on
  each node (main.go:100-107, 370-394) — first non-covered candidate
  within 10 GPS-meters wins; winner propagates prop_step hops of coverage.
  NOTE the Go iterates control_point_gt in MAP ORDER, i.e. randomly: every
  fixed order is one valid execution of the reference. `snap_order`
  selects which one this run reproduces.
- Dijkstra in truncated-int centimeters; unreachable targets -1
  (main.go:589-695).
- Pair scoring: unordered pairs cp2 > cp1; any unmatched endpoint counts
  (1.0, 1.0) regardless of d1; matched pairs only count when
  d1 > min_distance_filter; d2 < 0 clamps to 0; s capped at 1
  (main.go:491-541). cc == 0 yields Go's 0/0 = NaN (main.go:541).
"""

from __future__ import annotations

import heapq
import math

# --- parameters (main.go:17-25; spacenet overrides main.go:717-726) ---
GO_CITY = dict(interval_1=37, interval_2=25.0, min_distance_filter=100.0,
               prop_step=4, region_size=2048.0, margin_size=100.0)
GO_SPACENET = dict(interval_1=int(15.0 * 1.5), interval_2=15.0,
                   min_distance_filter=30.0, prop_step=3,
                   region_size=352.0, margin_size=30.0)

TOL = 0.000001  # rtreego rect half-side (main.go:100)


def gps_distance(p1, p2):
    """(main.go:72-77)"""
    a = (p1[0] - p2[0]) * 111111.0
    b = (p1[1] - p2[1]) * 111111.0 * math.cos(p1[0] / 360.0 * 2.0 * math.pi)
    return math.sqrt(a * a + b * b)


def gps_in_bound(p1, params):
    """(main.go:79-93)"""
    region_size = params["region_size"]
    margin_size = params["margin_size"]
    lat_top_left = 41.0
    lon_top_left = -71.0
    lat2 = lat_top_left - region_size / 111111.0
    lon2 = lon_top_left + region_size / 111111.0 / math.cos(
        lat_top_left / 180.0 * 3.1415926)
    return (
        p1[0] > lat2 + margin_size / 111111.0
        and p1[0] < lat_top_left - margin_size / 111111.0
        and p1[1] > lon_top_left + margin_size / 111111.0 / math.cos(
            lat_top_left / 180.0 * 3.1415926)
        and p1[1] < lon2 - margin_size / 111111.0 / math.cos(
            lat_top_left / 180.0 * 3.1415926)
    )


def loc2key(loc):
    """(main.go:109-111)"""
    return "%.7f_%.7f" % (loc[0], loc[1])


def lockey(loc, dist):
    """(main.go:249-251) — Go int() truncates toward zero, as Python's."""
    return "%d_%d" % (int(loc[0] * 111111.0 / dist),
                      int(loc[1] * 111111.0 / dist))


class GoGraph:
    """graph struct + addEdge (main.go:27-35, 162-201)."""

    def __init__(self):
        self.nodes = []           # [][2]float64
        self.loc2index = {}
        self.neighbors = {}       # map[int]map[int]bool

    def add_edge(self, loc1, loc2):
        sk1, sk2 = loc2key(loc1), loc2key(loc2)
        if sk1 in self.loc2index:
            nid1 = self.loc2index[sk1]
        else:
            nid1 = len(self.nodes)
            self.nodes.append(tuple(loc1))
            self.loc2index[sk1] = nid1
        if sk2 in self.loc2index:
            nid2 = self.loc2index[sk2]
        else:
            nid2 = len(self.nodes)
            self.nodes.append(tuple(loc2))
            self.loc2index[sk2] = nid2
        self.neighbors.setdefault(nid1, {})[nid2] = True
        self.neighbors.setdefault(nid2, {})[nid1] = True

    def propagate(self, nid, step, action):
        """(main.go:38-68) — the action fires for the start node even when
        it has no adjacency in THIS graph (Go maps accept any key)."""
        visited = {nid: 0}
        queue = [nid]
        while queue:
            cur = queue.pop(0)
            if visited[cur] > step:
                continue
            action(cur)
            for k in self.neighbors.get(cur, {}):
                if k not in visited:
                    queue.append(k)
                    visited[k] = visited[cur] + 1

    def shortest_paths(self, nid1, nid2_list):
        """(main.go:638-695) — Dijkstra, truncated-int centimeter weights,
        -1.0 for unreachable targets."""
        result = {v: -1.0 for v in nid2_list}
        mindistance = {nid: 100000000000 for nid in range(len(self.nodes))}
        mindistance[nid1] = 0
        pq = [(0, nid1)]
        done = set()
        while pq:
            d, cur = heapq.heappop(pq)
            if cur in done:
                continue
            done.add(cur)
            if cur in result:
                result[cur] = float(d) / 100.0
            for nxt in self.neighbors.get(cur, {}):
                w = int(gps_distance(self.nodes[cur], self.nodes[nxt]) * 100.0)
                if w + d < mindistance[nxt]:
                    mindistance[nxt] = w + d
                    heapq.heappush(pq, (w + d, nxt))
        return result


def graph_densify(nodes, edges):
    """(main.go:203-247)"""
    ng = GoGraph()
    for n1, n2 in edges:
        d = gps_distance(nodes[n1], nodes[n2])
        if d > 3.0:
            n = int(d / 2.0) + 1
            for i in range(n):
                alpha1 = float(i) / float(n)
                alpha2 = float(i + 1) / float(n)
                if i == 0:
                    loc1 = tuple(nodes[n1])
                    loc2 = (nodes[n1][0] * (1 - alpha2) + nodes[n2][0] * alpha2,
                            nodes[n1][1] * (1 - alpha2) + nodes[n2][1] * alpha2)
                elif i == n - 1:
                    loc1 = (nodes[n1][0] * (1 - alpha1) + nodes[n2][0] * alpha1,
                            nodes[n1][1] * (1 - alpha1) + nodes[n2][1] * alpha1)
                    loc2 = tuple(nodes[n2])
                else:
                    loc1 = (nodes[n1][0] * (1 - alpha1) + nodes[n2][0] * alpha1,
                            nodes[n1][1] * (1 - alpha1) + nodes[n2][1] * alpha1)
                    loc2 = (nodes[n1][0] * (1 - alpha2) + nodes[n2][0] * alpha2,
                            nodes[n1][1] * (1 - alpha2) + nodes[n2][1] * alpha2)
                ng.add_edge(loc1, loc2)
        else:
            ng.add_edge(tuple(nodes[n1]), tuple(nodes[n2]))
    return ng


def _rtree_nearest(prop_nodes, q, k):
    """rtreego NearestNeighbors(k, q) stand-in (main.go:350-373): candidates
    ordered by minimum Euclidean distance IN RAW lat/lon DEGREES from q to
    the tol-rectangle centered on each node (gpsnode.Bounds, main.go:102-107).
    Node index breaks exact ties deterministically (rtreego's own tie order
    is insertion-dependent)."""
    cand = []
    for i, loc in enumerate(prop_nodes):
        dx = max(0.0, abs(q[0] - loc[0]) - TOL)
        dy = max(0.0, abs(q[1] - loc[1]) - TOL)
        cand.append((dx * dx + dy * dy, i))
    cand.sort()
    return [i for _, i in cand[:k]]


def apls_one_way(graph_gt, graph_prop, params, snap_order="insertion"):
    """(main.go:253-541). `snap_order` fixes the Go's random map-iteration
    order in the snapping loop (main.go:370): "insertion" = the order
    control points were discovered, "sorted" = ascending gt node id. Each
    is one valid execution of the reference."""
    interval_1 = params["interval_1"]
    interval_2 = params["interval_2"]
    min_distance_filter = params["min_distance_filter"]
    prop_step = params["prop_step"]

    visited = {}
    lockeys = {}
    control_point_gt = {}
    # Go: map[int]bool preloaded with all gt ids false; propagate can add
    # arbitrary extra keys (main.go:261-264, 312-314)
    node_cover_map_gt = {nid: False for nid in range(len(graph_gt.nodes))}

    def mark_gt(n):
        node_cover_map_gt[n] = True

    for nid in range(len(graph_gt.nodes)):
        if len(graph_gt.neighbors.get(nid, {})) != 2:
            for next_nid in graph_gt.neighbors.get(nid, {}):
                if next_nid in visited:
                    continue
                chain = [nid, next_nid]
                last_nid = nid
                current_nid = next_nid
                while len(graph_gt.neighbors.get(current_nid, {})) == 2:
                    s = 0
                    for k in graph_gt.neighbors[current_nid]:
                        s = s + k
                    current_nid, last_nid = s - last_nid, current_nid
                    chain.append(current_nid)

                if len(chain) > interval_1:
                    n = int(float(len(chain)) / interval_2) + 1
                    for i in range(1, n):
                        idx = int(float(len(chain)) * float(i) / float(n))
                        if (gps_in_bound(graph_gt.nodes[chain[idx]], params)
                                and node_cover_map_gt.get(chain[idx], False)
                                is False):
                            lk = lockey(graph_gt.nodes[chain[idx]], 2.0)
                            if lk not in lockeys:
                                lockeys[lk] = True
                                control_point_gt[chain[idx]] = -1
                                # reference bug: propagate on the PROP graph
                                # with a GT node id, hop budget hardcoded 4
                                # (main.go:312-314)
                                graph_prop.propagate(chain[idx], 4, mark_gt)
                for cnid in chain:
                    visited[cnid] = True

            if gps_in_bound(graph_gt.nodes[nid], params) and (
                node_cover_map_gt.get(nid, False) is False
                or len(graph_gt.neighbors.get(nid, {})) == 1
            ):
                lk = lockey(graph_gt.nodes[nid], 2.0)
                if lk not in lockeys:
                    lockeys[lk] = True
                    control_point_gt[nid] = -1
                    graph_prop.propagate(nid, 4, mark_gt)

    # --- snap to proposal map (main.go:348-394) ---
    node_cover_map = {nid: False for nid in range(len(graph_prop.nodes))}

    snap_ids = list(control_point_gt.keys())
    if snap_order == "sorted":
        snap_ids.sort()
    for nid1 in snap_ids:
        q = graph_gt.nodes[nid1]
        for cand in _rtree_nearest(graph_prop.nodes, q, 10):
            if node_cover_map[cand] is True:
                continue
            if gps_distance(graph_prop.nodes[cand], q) < 10.0:
                control_point_gt[nid1] = cand

                def mark_prop(n):
                    node_cover_map[n] = True

                graph_prop.propagate(cand, prop_step, mark_prop)
                break

    # --- shortest paths between control points (main.go:402-488) ---
    control_point_prop_list = []
    control_point_prop_map = {}
    control_point_gt_list = []
    for cp1_gt, cp1_prop in control_point_gt.items():
        if cp1_prop < 0:
            continue
        control_point_gt_list.append(cp1_gt)
        if cp1_prop not in control_point_prop_map:
            control_point_prop_map[cp1_prop] = True
            control_point_prop_list.append(cp1_prop)

    shortest_paths_prop = {
        cp: graph_prop.shortest_paths(cp, control_point_prop_list)
        for cp in control_point_prop_list
    }
    shortest_paths_gt = {
        cp: graph_gt.shortest_paths(cp, control_point_gt_list)
        for cp in control_point_gt_list
    }

    # --- pair scoring (main.go:491-541) ---
    cc = 0.0
    total = 0.0
    for cp1_gt, cp1_prop in control_point_gt.items():
        for cp2_gt, cp2_prop in control_point_gt.items():
            if cp2_gt <= cp1_gt:
                continue
            # Go reads d1 before the -1 check; missing map keys read 0.0
            d1 = shortest_paths_gt.get(cp1_gt, {}).get(cp2_gt, 0.0)
            if cp1_prop == -1 or cp2_prop == -1:
                cc += 1.0
                total += 1.0
                continue
            if d1 > min_distance_filter:
                d2 = shortest_paths_prop[cp1_prop][cp2_prop]
                if d2 < 0:
                    d2 = 0
                s = abs(d1 - d2) / d1
                if s > 1.0:
                    s = 1.0
                cc += 1.0
                total += s
    if cc == 0.0:
        return float("nan")  # Go's 0/0 (main.go:541)
    return 1.0 - total / cc


def apls(gt_json, prop_json, spacenet=False, snap_order="insertion"):
    """Symmetric APLS (main.go:697-738). gt_json/prop_json are the
    [nodes, edges] JSON arrays the Go loads. Returns
    (apls_gt, apls_prop, mean)."""
    params = GO_SPACENET if spacenet else GO_CITY
    gt_dense = graph_densify(gt_json[0], gt_json[1])
    prop_dense = graph_densify(prop_json[0], prop_json[1])
    a = apls_one_way(gt_dense, prop_dense, params, snap_order=snap_order)
    b = apls_one_way(prop_dense, gt_dense, params, snap_order=snap_order)
    return a, b, (a + b) / 2.0
