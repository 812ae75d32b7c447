// Native TOPO-metric kernels: the TOPOWalk marble/hole BFS, the bounded
// location-to-location graph distance used by TOPO121, and the marble/hole
// matching (gates + Hopcroft-Karp).
//
// Exact behavioral ports of sam_road_tpu/metrics/topo_graph.py (itself a
// port of reference topo/graph.py:313-683) and topo.py::_match_count
// (reference topo/topo.py:770-896). The Python implementations remain the
// spec and the fallback; tests assert bit-identical marble streams and
// equal match counts. Compile with -ffp-contract=off so a*b+c never fuses
// into fma (Python/numpy doubles don't).
//
// Build: g++ -O2 -ffp-contract=off -shared -fPIC -std=c++17 -o libsamroad_topo.so topo.cc

#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <tuple>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr double kDegToRad = M_PI / 180.0;  // matches CPython math.radians

// distance(p1, p2) from metrics/latlon.py:23-27 — cos scaled by p1's lat.
inline double dist_deg(double lat1, double lon1, double lat2, double lon2) {
  double a = lat1 - lat2;
  double b = (lon1 - lon2) * std::cos(lat1 * kDegToRad);
  return std::sqrt(a * a + b * b);
}

struct Graph {
  int64_t n = 0;
  std::vector<double> lat, lon;
  std::vector<int64_t> fwd_off, fwd_adj;  // nodeLink, insertion order
  std::vector<int64_t> rev_off, rev_adj;  // nodeLinkReverse, insertion order
  std::unordered_set<int64_t> edges;      // a*n+b for every nodeLink edge

  bool has_edge(int64_t a, int64_t b) const {
    return edges.count(a * n + b) != 0;
  }
};

// Marble tuple with Python-tuple equality semantics (values, with 0.0/-0.0
// normalized to one key — Python's -0.0 == 0.0).
struct MarbleKey {
  uint64_t a, b, c, d;
  bool operator==(const MarbleKey& o) const {
    return a == o.a && b == o.b && c == o.c && d == o.d;
  }
};
inline uint64_t norm_bits(double v) {
  if (v == 0.0) v = 0.0;  // collapses -0.0
  uint64_t u;
  std::memcpy(&u, &v, sizeof(u));
  return u;
}
struct MarbleHash {
  size_t operator()(const MarbleKey& k) const {
    uint64_t h = 1469598103934665603ull;
    for (uint64_t v : {k.a, k.b, k.c, k.d}) {
      h ^= v;
      h *= 1099511628211ull;
    }
    return static_cast<size_t>(h);
  }
};

struct PairHash {
  size_t operator()(const std::pair<int64_t, int64_t>& p) const {
    return std::hash<int64_t>()(p.first * 0x9e3779b97f4a7c15ll + p.second);
  }
};

}  // namespace

extern "C" {

void* topo_graph_create(int64_t n, const double* latlon,
                        const int64_t* fwd_off, const int64_t* fwd_adj,
                        const int64_t* rev_off, const int64_t* rev_adj) {
  auto* g = new Graph();
  g->n = n;
  g->lat.resize(n);
  g->lon.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    g->lat[i] = latlon[2 * i];
    g->lon[i] = latlon[2 * i + 1];
  }
  g->fwd_off.assign(fwd_off, fwd_off + n + 1);
  g->fwd_adj.assign(fwd_adj, fwd_adj + fwd_off[n]);
  g->rev_off.assign(rev_off, rev_off + n + 1);
  g->rev_adj.assign(rev_adj, rev_adj + rev_off[n]);
  g->edges.reserve(static_cast<size_t>(g->fwd_adj.size() * 2));
  for (int64_t u = 0; u < n; ++u)
    for (int64_t k = fwd_off[u]; k < fwd_off[u + 1]; ++k)
      g->edges.insert(u * n + fwd_adj[k]);
  return g;
}

void topo_graph_free(void* h) { delete static_cast<Graph*>(h); }

// TOPOWalk (topo_graph.py:62-170). Writes marbles (lat, lon, dlat, dlon)
// into out (capacity cap rows); always returns the TOTAL marble count —
// if it exceeds cap the caller must retry with a bigger buffer (rows past
// cap are counted but not written).
int64_t topo_walk(void* h, int64_t nodeid, double step, double r,
                  int direction, int newstyle, int64_t nid1, int64_t nid2,
                  double dist1, double dist2, int bidirection,
                  double* out, int64_t cap) {
  const Graph& g = *static_cast<Graph*>(h);
  std::unordered_map<int64_t, double> localNodeDistance;
  std::unordered_set<MarbleKey, MarbleHash> mables_set;
  std::unordered_map<std::pair<int64_t, int64_t>, double, PairHash> edge_covered;
  int64_t count = 0;

  auto emit = [&](double la, double lo, double dla, double dlo) {
    if (count < cap) {
      out[4 * count] = la;
      out[4 * count + 1] = lo;
      out[4 * count + 2] = dla;
      out[4 * count + 3] = dlo;
    }
    ++count;
  };

  std::deque<std::tuple<int64_t, int64_t, double>> Queue;
  if (!newstyle) {
    Queue.emplace_back(nodeid, -1, 0.0);
  } else {
    Queue.emplace_back(nid1, -1, dist1);
    Queue.emplace_back(nid2, -1, dist2);
  }

  // Seed marbles between nid1 and nid2 (topo_graph.py:84-108).
  {
    double lat1 = g.lat[nid1], lon1 = g.lon[nid1];
    double lat2 = g.lat[nid2], lon2 = g.lon[nid2];
    double l = dist_deg(lat2, lon2, lat1, lon1);
    if (l > 0) {
      double alpha = 0.0;
      while (true) {
        double latI = lat1 * alpha + lat2 * (1 - alpha);
        double lonI = lon1 * alpha + lon2 * (1 - alpha);
        double d1 = dist_deg(latI, lonI, lat1, lon1);
        double d2 = dist_deg(latI, lonI, lat2, lon2);
        if (dist1 - d1 < r || dist2 - d2 < r) {
          MarbleKey mk{norm_bits(latI), norm_bits(lonI),
                       norm_bits(lat2 - lat1), norm_bits(lon2 - lon1)};
          if (!mables_set.count(mk)) {
            mables_set.insert(mk);
            emit(latI, lonI, lat2 - lat1, lon2 - lon1);
            if (bidirection && g.has_edge(nid2, nid1) && g.has_edge(nid1, nid2))
              emit(latI + 0.00001, lonI + 0.00001, lat2 - lat1, lon2 - lon1);
          }
        }
        alpha += step / l;
        if (alpha > 1.0) break;
      }
    }
  }

  std::vector<int64_t> visited_next_node;
  while (!Queue.empty()) {
    auto [node_cur, node_prev, dist] = Queue.front();
    Queue.pop_front();
    double old_node_dist = 1.0;
    auto it = localNodeDistance.find(node_cur);
    if (it != localNodeDistance.end()) {
      old_node_dist = it->second;
      if (it->second <= dist) continue;
    }
    if (dist > r) continue;
    localNodeDistance[node_cur] = dist;

    visited_next_node.clear();
    int64_t fb = g.fwd_off[node_cur], fe = g.fwd_off[node_cur + 1];
    int64_t rb = direction ? 0 : g.rev_off[node_cur];
    int64_t re = direction ? 0 : g.rev_off[node_cur + 1];
    int64_t total = (fe - fb) + (re - rb);
    for (int64_t k = 0; k < total; ++k) {
      int64_t next_node =
          k < fe - fb ? g.fwd_adj[fb + k] : g.rev_adj[rb + (k - (fe - fb))];
      if (next_node == node_prev || next_node == node_cur ||
          next_node == nid1 || next_node == nid2)
        continue;
      bool seen = false;
      for (int64_t v : visited_next_node)
        if (v == next_node) { seen = true; break; }
      if (seen) continue;
      visited_next_node.push_back(next_node);

      double lat1 = g.lat[node_cur], lon1 = g.lon[node_cur];
      double lat2 = g.lat[next_node], lon2 = g.lon[next_node];
      double l = dist_deg(lat2, lon2, lat1, lon1);
      double bias = step * std::ceil(dist / step) - dist;
      double cur = bias;

      if (old_node_dist + l < r) {
        Queue.emplace_back(next_node, node_cur, dist + l);
      } else {
        auto sc = edge_covered.find({node_cur, next_node});
        double start_limitation = sc == edge_covered.end() ? 0.0 : sc->second;
        auto ec = edge_covered.find({next_node, node_cur});
        double end_limitation = l - (ec == edge_covered.end() ? 0.0 : ec->second);
        while (cur < l) {
          double alpha = cur / l;
          if (dist + l * alpha > r) break;
          if (l * alpha < start_limitation) {
            cur += step;
            continue;
          }
          if (l * alpha > end_limitation) break;
          double latI = lat2 * alpha + lat1 * (1 - alpha);
          double lonI = lon2 * alpha + lon1 * (1 - alpha);
          MarbleKey mk{norm_bits(latI), norm_bits(lonI),
                       norm_bits(lat2 - lat1), norm_bits(lon2 - lon1)};
          if (!mables_set.count(mk)) {
            mables_set.insert(mk);
            emit(latI, lonI, lat2 - lat1, lon2 - lon1);
            if (bidirection && g.has_edge(node_cur, next_node) &&
                g.has_edge(next_node, node_cur))
              emit(latI + 0.00001, lonI + 0.00001, lat2 - lat1, lon2 - lon1);
          }
          cur += step;
        }
        edge_covered[{node_cur, next_node}] = cur - step;
        Queue.emplace_back(next_node, node_cur, dist + l);
      }
    }
  }
  return count;
}

// distanceBetweenTwoLocation (topo_graph.py:172-206), locs are
// (n1, n2, d1, d2) mid-edge positions.
double topo_loc_distance(void* h, int64_t a1, int64_t a2, double ad1,
                         double ad2, int64_t b1, int64_t b2, double bd1,
                         double bd2, double max_distance) {
  const Graph& g = *static_cast<Graph*>(h);
  if (a1 == b1 && a2 == b2) return std::fabs(ad1 - bd1);
  if (a1 == b2 && a2 == b1) return std::fabs(ad1 - bd2);

  double ans_dist = 100000.0;
  std::unordered_map<int64_t, double> localNodeDistance;
  std::deque<std::tuple<int64_t, int64_t, double>> Queue;
  // reference quirk preserved: BOTH seeds use ad1 (loc1[2])
  Queue.emplace_back(a1, -1, ad1);
  Queue.emplace_back(a2, -1, ad1);
  std::vector<int64_t> visited_next_node;
  while (!Queue.empty()) {
    auto [node_cur, node_prev, dist] = Queue.front();
    Queue.pop_front();
    auto it = localNodeDistance.find(node_cur);
    if (it != localNodeDistance.end() && it->second <= dist) continue;
    if (dist > max_distance) continue;
    localNodeDistance[node_cur] = dist;

    visited_next_node.clear();
    int64_t fb = g.fwd_off[node_cur], fe = g.fwd_off[node_cur + 1];
    int64_t rb = g.rev_off[node_cur], re = g.rev_off[node_cur + 1];
    int64_t total = (fe - fb) + (re - rb);
    for (int64_t k = 0; k < total; ++k) {
      int64_t next_node =
          k < fe - fb ? g.fwd_adj[fb + k] : g.rev_adj[rb + (k - (fe - fb))];
      if (next_node == node_prev || next_node == node_cur ||
          next_node == a1 || next_node == a2)
        continue;
      bool seen = false;
      for (int64_t v : visited_next_node)
        if (v == next_node) { seen = true; break; }
      if (seen) continue;
      visited_next_node.push_back(next_node);

      double lat1 = g.lat[node_cur], lon1 = g.lon[node_cur];
      double lat2 = g.lat[next_node], lon2 = g.lon[next_node];
      if (node_cur == b1 && next_node == b2)
        ans_dist = std::min(ans_dist, dist + bd1);
      else if (node_cur == b2 && next_node == b1)
        ans_dist = std::min(ans_dist, dist + bd2);
      double l = dist_deg(lat2, lon2, lat1, lon1);
      Queue.emplace_back(next_node, node_cur, dist + l);
    }
  }
  return ans_dist;
}

// _match_count (topo.py:176-229): distance + 45-degree angle gates over a
// Chebyshev-box candidate set, then (optionally) Hopcroft-Karp.
int64_t topo_match(const double* src, int64_t ns, const double* tgt,
                   int64_t nt, double threshold, int one2one) {
  if (ns == 0 || nt == 0) return 0;
  const double rr = threshold * 1.8 + 0.00001;
  const double c40 = std::cos(40.0 * kDegToRad);

  // grid-bucket targets by Chebyshev cell rr
  std::unordered_map<int64_t, std::vector<int32_t>> buckets;
  buckets.reserve(static_cast<size_t>(nt));
  auto cell = [&](double v) {
    return static_cast<int64_t>(std::floor(v / rr));
  };
  for (int64_t t = 0; t < nt; ++t) {
    int64_t key = cell(tgt[4 * t]) * 2000003 + cell(tgt[4 * t + 1]);
    buckets[key].push_back(static_cast<int32_t>(t));
  }

  std::vector<int32_t> si, ti;
  for (int64_t s = 0; s < ns; ++s) {
    const double* sp = src + 4 * s;
    double coslat = std::cos(sp[0] * kDegToRad);
    double n1a = 0, n1b = 0;
    {
      double a = sp[2], b = sp[3] * c40;
      double l = std::sqrt(a * a + b * b);
      n1a = a / l;
      n1b = b / l;
    }
    bool s_directed = sp[2] != sp[3];
    int64_t cr = cell(sp[0]), cc = cell(sp[1]);
    for (int64_t dr = -1; dr <= 1; ++dr)
      for (int64_t dc = -1; dc <= 1; ++dc) {
        auto it = buckets.find((cr + dr) * 2000003 + (cc + dc));
        if (it == buckets.end()) continue;
        for (int32_t t : it->second) {
          const double* tp = tgt + 4 * t;
          // Chebyshev prefilter identical in effect to query_ball_point
          // (superset; exact gates below decide)
          if (std::fabs(sp[0] - tp[0]) > rr || std::fabs(sp[1] - tp[1]) > rr)
            continue;
          double dlat = sp[0] - tp[0];
          double dlon = (sp[1] - tp[1]) * coslat;
          double ddd = std::sqrt(dlat * dlat + dlon * dlon);
          if (!(ddd < threshold)) continue;
          double angle_d = 0.0;
          if (s_directed && tp[2] != tp[3]) {
            double a = tp[2], b = tp[3] * c40;
            double l = std::sqrt(a * a + b * b);
            angle_d = 1.0 - std::fabs(n1a * (a / l) + n1b * (b / l));
          }
          if (!(angle_d < 0.29)) continue;
          si.push_back(static_cast<int32_t>(s));
          ti.push_back(t);
        }
      }
  }
  if (si.empty()) return 0;
  if (!one2one) return static_cast<int64_t>(si.size());

  // compact both sides, then Hopcroft-Karp (matching.py:53-93); max
  // matching size is unique so edge order doesn't matter
  std::unordered_map<int32_t, int32_t> lmap, rmap;
  std::vector<std::vector<int32_t>> adj;
  for (size_t i = 0; i < si.size(); ++i) {
    auto [lit, lnew] = lmap.try_emplace(si[i], static_cast<int32_t>(lmap.size()));
    if (lnew) adj.emplace_back();
    auto [rit, rnew] = rmap.try_emplace(ti[i], static_cast<int32_t>(rmap.size()));
    adj[lit->second].push_back(rit->second);
  }
  int32_t n_left = static_cast<int32_t>(lmap.size());
  int32_t n_right = static_cast<int32_t>(rmap.size());
  std::vector<int32_t> match_l(n_left, -1), match_r(n_right, -1);
  std::vector<int32_t> dist(n_left, 0);
  const int32_t INF = INT32_MAX;

  auto bfs = [&]() {
    std::deque<int32_t> q;
    for (int32_t u = 0; u < n_left; ++u) {
      if (match_l[u] == -1) {
        dist[u] = 0;
        q.push_back(u);
      } else {
        dist[u] = INF;
      }
    }
    bool found = false;
    while (!q.empty()) {
      int32_t u = q.front();
      q.pop_front();
      for (int32_t v : adj[u]) {
        int32_t w = match_r[v];
        if (w == -1)
          found = true;
        else if (dist[w] == INF) {
          dist[w] = dist[u] + 1;
          q.push_back(w);
        }
      }
    }
    return found;
  };

  // iterative DFS (matches matching.py's recursive dfs; avoids deep C stacks
  // on long augmenting paths)
  auto try_augment = [&](int32_t root) -> bool {
    struct Frame { int32_t u; size_t i; };
    std::vector<Frame> st;
    st.push_back({root, 0});
    std::vector<std::pair<int32_t, int32_t>> path;  // (u, v) tentative
    while (!st.empty()) {
      Frame& f = st.back();
      if (f.i < adj[f.u].size()) {
        int32_t v = adj[f.u][f.i++];
        int32_t w = match_r[v];
        if (w == -1) {
          // augment along the path
          path.push_back({f.u, v});
          for (auto& [pu, pv] : path) {
            match_l[pu] = pv;
            match_r[pv] = pu;
          }
          return true;
        }
        if (dist[w] == dist[f.u] + 1) {
          path.push_back({f.u, v});
          st.push_back({w, 0});
        }
      } else {
        dist[f.u] = INF;
        st.pop_back();
        if (!path.empty()) path.pop_back();
      }
    }
    return false;
  };

  int64_t matching = 0;
  while (bfs()) {
    for (int32_t u = 0; u < n_left; ++u)
      if (match_l[u] == -1 && try_augment(u)) ++matching;
  }
  return matching;
}

}  // extern "C"
