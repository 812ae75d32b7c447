// Phase-2 pair building for tiled inference: per patch, gather the graph
// vertices inside the patch box and connect each to its nearest neighbors
// within `radius` (reference: inferencer.py:148-176 does this with rtree +
// scipy cKDTree per patch; the per-patch KD-tree construction dominated the
// host half of phase 2 at ~0.3 s/region).
//
// Semantics: inclusive box membership; neighbor candidates strictly inside
// the radius (d < r, matching scipy's distance_upper_bound behavior);
// nearest-first with deterministic (distance, index) tie-break; self
// excluded. Patch-local coordinates are float32 (cast-then-subtract like the
// host code it replaces). Invalid slots carry tgt == src and valid = 0.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -o libsamroad_pairs.so pairs.cc

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Returns the max per-patch point count seen. If it exceeds cap, outputs for
// overflowing patches are truncated — the caller must retry with larger cap.
int64_t samroad_build_pairs(
    const double* points, int64_t n,
    const double* boxes, int64_t nb,  // [nb, 4] x0, y0, x1, y1
    int64_t max_nbr, double radius, int64_t cap,
    int32_t* counts,   // [nb]
    int64_t* pidx,     // [nb, cap]
    float* pts,        // [nb, cap, 2]
    int32_t* pairs,    // [nb, cap, max_nbr, 2]
    uint8_t* valid) {  // [nb, cap, max_nbr]
  // bucket points on a uniform grid (cell = radius) once
  double cell = radius > 0 ? radius : 1.0;
  double minx = 0, miny = 0, maxx = 0, maxy = 0;
  if (n > 0) {
    minx = maxx = points[0];
    miny = maxy = points[1];
    for (int64_t i = 1; i < n; ++i) {
      minx = std::min(minx, points[2 * i]);
      maxx = std::max(maxx, points[2 * i]);
      miny = std::min(miny, points[2 * i + 1]);
      maxy = std::max(maxy, points[2 * i + 1]);
    }
  }
  // The cell size only accelerates bucketing (the r^2 distance check is
  // exact), so clamp it to keep the grid allocation bounded: a radius far
  // below the point extent would otherwise size nx*ny ~ (extent/radius)^2
  // (e.g. radius 1e-3 over 2048 px -> 4e12 cells -> bad_alloc).
  double extent = std::max(maxx - minx, maxy - miny);
  if (extent > 0) {
    cell = std::max(cell, extent / 4096.0);
    // Additionally bound the grid by point count: with few points a
    // radius-sized cell over a huge extent would still allocate up to
    // 4096x4096 offsets (~134 MB per call). sqrt(n)+1 cells per axis keeps
    // the grid O(n) while preserving the exact r^2 membership check.
    cell = std::max(
        cell, extent / (std::sqrt((double)std::max<int64_t>(n, 1)) + 1.0));
  }
  auto cx = [&](double x) { return (int64_t)std::floor((x - minx) / cell); };
  auto cy = [&](double y) { return (int64_t)std::floor((y - miny) / cell); };
  int64_t nx = 1, ny = 1;
  for (int64_t i = 0; i < n; ++i) {
    nx = std::max(nx, cx(points[2 * i]) + 1);
    ny = std::max(ny, cy(points[2 * i + 1]) + 1);
  }
  std::vector<int64_t> bucket_of(n), order(n), offsets(nx * ny + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    bucket_of[i] = cx(points[2 * i]) * ny + cy(points[2 * i + 1]);
    offsets[bucket_of[i] + 1]++;
  }
  for (size_t b = 1; b < offsets.size(); ++b) offsets[b] += offsets[b - 1];
  {
    std::vector<int64_t> cursor(offsets.begin(), offsets.end() - 1);
    for (int64_t i = 0; i < n; ++i) order[cursor[bucket_of[i]]++] = i;
  }

  const double r2 = radius * radius;
  int64_t max_count = 0;
  std::vector<int64_t> local;                 // global ids in this patch
  std::vector<std::pair<double, int32_t>> cand;
  for (int64_t b = 0; b < nb; ++b) {
    double x0 = boxes[4 * b], y0 = boxes[4 * b + 1];
    double x1 = boxes[4 * b + 2], y1 = boxes[4 * b + 3];
    local.clear();
    if (n > 0 && x1 >= x0 && y1 >= y0) {
      int64_t cx0 = std::max<int64_t>(cx(x0), 0);
      int64_t cy0 = std::max<int64_t>(cy(y0), 0);
      int64_t cx1 = std::min<int64_t>(cx(x1), nx - 1);
      int64_t cy1 = std::min<int64_t>(cy(y1), ny - 1);
      for (int64_t gx = cx0; gx <= cx1; ++gx)
        for (int64_t gy = cy0; gy <= cy1; ++gy) {
          int64_t bb = gx * ny + gy;
          for (int64_t k = offsets[bb]; k < offsets[bb + 1]; ++k) {
            int64_t i = order[k];
            double px = points[2 * i], py = points[2 * i + 1];
            if (px >= x0 && px <= x1 && py >= y0 && py <= y1)
              local.push_back(i);
          }
        }
      std::sort(local.begin(), local.end());  // deterministic patch order
    }
    int64_t m = (int64_t)local.size();
    max_count = std::max(max_count, m);
    counts[b] = (int32_t)std::min(m, cap);
    int64_t mm = counts[b];
    // patch-local f32 coords (cast global to f32, then subtract in f32)
    for (int64_t i = 0; i < mm; ++i) {
      pidx[b * cap + i] = local[i];
      float lx = (float)points[2 * local[i]] - (float)x0;
      float ly = (float)points[2 * local[i] + 1] - (float)y0;
      pts[(b * cap + i) * 2] = lx;
      pts[(b * cap + i) * 2 + 1] = ly;
    }
    for (int64_t i = 0; i < mm; ++i) {
      double ix = pts[(b * cap + i) * 2], iy = pts[(b * cap + i) * 2 + 1];
      cand.clear();
      for (int64_t j = 0; j < mm; ++j) {
        if (j == i) continue;
        double dx = pts[(b * cap + j) * 2] - ix;
        double dy = pts[(b * cap + j) * 2 + 1] - iy;
        double d2 = dx * dx + dy * dy;
        if (d2 < r2) cand.emplace_back(d2, (int32_t)j);
      }
      std::sort(cand.begin(), cand.end());
      int64_t base = ((b * cap + i) * max_nbr);
      for (int64_t s = 0; s < max_nbr; ++s) {
        if (s < (int64_t)cand.size()) {
          pairs[(base + s) * 2] = (int32_t)i;
          pairs[(base + s) * 2 + 1] = cand[s].second;
          valid[base + s] = 1;
        } else {
          pairs[(base + s) * 2] = (int32_t)i;
          pairs[(base + s) * 2 + 1] = (int32_t)i;
          valid[base + s] = 0;
        }
      }
    }
  }
  return max_count;
}

}  // extern "C"
