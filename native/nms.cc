// Greedy score-ordered point NMS — native hot path for vertex extraction.
//
// Exact semantics of the reference nms_points (reference:
// graph_utils.py:572-591) and of the framework's numpy implementation
// (sam_road_tpu/graph/nms.py): visit points in descending score order
// (stable ascending sort reversed, matching np.argsort(scores)[::-1]); a
// still-kept point suppresses every neighbor within `radius` except those
// with score > 1.0; the point itself stays kept.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Grid {
  double cell;
  int64_t nx = 0, ny = 0, xmin = 0, ymin = 0;
  std::vector<int32_t> counts;   // per-cell count -> offsets
  std::vector<int32_t> offsets;  // nx*ny+1
  std::vector<int32_t> items;    // point indices (sorted-order space)
};

}  // namespace

extern "C" {

// pts: [n, 2] float64 (already score-sorted descending!), scores: [n]
// kept_out: [n] uint8 output (1 = kept)
// Returns number of kept points.
int64_t samroad_nms(const double* pts, const double* scores, int64_t n,
                    double radius, uint8_t* kept_out) {
  if (n <= 0) return 0;
  const double cell = radius > 0 ? radius : 1.0;
  const double r2 = radius * radius;

  // Build a uniform grid over the sorted points.
  Grid g;
  g.cell = cell;
  std::vector<int64_t> cx(n), cy(n);
  int64_t xmin = INT64_MAX, ymin = INT64_MAX, xmax = INT64_MIN, ymax = INT64_MIN;
  for (int64_t i = 0; i < n; i++) {
    cx[i] = static_cast<int64_t>(std::floor(pts[2 * i] / cell));
    cy[i] = static_cast<int64_t>(std::floor(pts[2 * i + 1] / cell));
    xmin = std::min(xmin, cx[i]);
    xmax = std::max(xmax, cx[i]);
    ymin = std::min(ymin, cy[i]);
    ymax = std::max(ymax, cy[i]);
  }
  g.xmin = xmin;
  g.ymin = ymin;
  g.nx = xmax - xmin + 1;
  g.ny = ymax - ymin + 1;
  const int64_t ncells = g.nx * g.ny;
  g.offsets.assign(ncells + 1, 0);
  for (int64_t i = 0; i < n; i++) {
    int64_t key = (cx[i] - xmin) * g.ny + (cy[i] - ymin);
    g.offsets[key + 1]++;
  }
  for (int64_t c = 0; c < ncells; c++) g.offsets[c + 1] += g.offsets[c];
  g.items.resize(n);
  std::vector<int32_t> cursor(g.offsets.begin(), g.offsets.end() - 1);
  for (int64_t i = 0; i < n; i++) {
    int64_t key = (cx[i] - xmin) * g.ny + (cy[i] - ymin);
    g.items[cursor[key]++] = static_cast<int32_t>(i);
  }

  std::fill(kept_out, kept_out + n, 1);
  for (int64_t i = 0; i < n; i++) {
    if (!kept_out[i]) continue;
    const double px = pts[2 * i], py = pts[2 * i + 1];
    const int64_t gx = cx[i] - xmin, gy = cy[i] - ymin;
    for (int64_t dx = -1; dx <= 1; dx++) {
      const int64_t x = gx + dx;
      if (x < 0 || x >= g.nx) continue;
      for (int64_t dy = -1; dy <= 1; dy++) {
        const int64_t y = gy + dy;
        if (y < 0 || y >= g.ny) continue;
        const int64_t key = x * g.ny + y;
        for (int32_t s = g.offsets[key]; s < g.offsets[key + 1]; s++) {
          const int32_t j = g.items[s];
          const double ddx = pts[2 * j] - px;
          const double ddy = pts[2 * j + 1] - py;
          if (ddx * ddx + ddy * ddy <= r2) {
            kept_out[j] = scores[j] > 1.0 ? 1 : 0;
          }
        }
      }
    }
    kept_out[i] = 1;
  }
  // Count at the end: a later immune point can retroactively suppress an
  // earlier-kept neighbor (reference semantics, graph_utils.py:586-587).
  int64_t n_kept = 0;
  for (int64_t i = 0; i < n; i++) n_kept += kept_out[i];
  return n_kept;
}

}  // extern "C"
