// Native host-side ops for the TPU adversarial-patch framework.
//
// The TPU owns the compute path (XLA/MXU); these are the *host* hot
// loops that sit between device steps in the eval pipeline, where the
// reference used per-element Python:
//   - greedy NMS over detection candidates (utils.py:93-112 semantics)
//   - pairwise xywh IoU (utils.py:27-90 union-box formulation)
//   - the eval-time interference/occupancy map with the reference's
//     early-termination layer rules (load_data.py:1322-1430)
//   - whitespace-float parsing for YOLO label files (np.loadtxt is the
//     bottleneck when scanning thousands of label files)
//
// Build: make -C native   (g++ -O3 -shared -fPIC)
// Python binding: ctypes (utils/native.py), with numpy fallbacks.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Pairwise IoU of center-format boxes a[n,4] x b[m,4] -> out[n,m].
// Union-box formulation incl. its behavior on degenerate boxes.
void iou_xywh_matrix(const float* a, int64_t n, const float* b, int64_t m,
                     float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const float ax = a[i * 4], ay = a[i * 4 + 1];
    const float aw = a[i * 4 + 2], ah = a[i * 4 + 3];
    const float ax1 = ax - aw / 2, ax2 = ax + aw / 2;
    const float ay1 = ay - ah / 2, ay2 = ay + ah / 2;
    const float aarea = aw * ah;
    for (int64_t j = 0; j < m; ++j) {
      const float bx = b[j * 4], by = b[j * 4 + 1];
      const float bw = b[j * 4 + 2], bh = b[j * 4 + 3];
      const float uw = std::max(ax2, bx + bw / 2) - std::min(ax1, bx - bw / 2);
      const float uh = std::max(ay2, by + bh / 2) - std::min(ay1, by - bh / 2);
      const float cw = aw + bw - uw;
      const float ch = ah + bh - uh;
      const float carea = (cw <= 0 || ch <= 0) ? 0.0f : cw * ch;
      out[i * m + j] = carea / (aarea + bw * bh - carea);
    }
  }
}

// Greedy NMS: stable sort by descending score, suppress IoU > thresh.
// Returns the number of kept indices written to keep_out (capacity n).
int64_t greedy_nms(const float* boxes, const float* scores, int64_t n,
                   float iou_thresh, int64_t* keep_out) {
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int64_t x, int64_t y) {
    return scores[x] > scores[y];
  });
  std::vector<uint8_t> alive(n, 1);
  int64_t kept = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!alive[i]) continue;
    const int64_t bi = order[i];
    keep_out[kept++] = bi;
    const float* p = boxes + bi * 4;
    const float px1 = p[0] - p[2] / 2, px2 = p[0] + p[2] / 2;
    const float py1 = p[1] - p[3] / 2, py2 = p[1] + p[3] / 2;
    const float parea = p[2] * p[3];
    for (int64_t j = i + 1; j < n; ++j) {
      if (!alive[j]) continue;
      const float* q = boxes + order[j] * 4;
      const float uw = std::max(px2, q[0] + q[2] / 2)
                     - std::min(px1, q[0] - q[2] / 2);
      const float uh = std::max(py2, q[1] + q[3] / 2)
                     - std::min(py1, q[1] - q[3] / 2);
      const float cw = p[2] + q[2] - uw;
      const float ch = p[3] + q[3] - uh;
      const float carea = (cw <= 0 || ch <= 0) ? 0.0f : cw * ch;
      const float iou = carea / (parea + q[2] * q[3] - carea);
      if (iou > iou_thresh) alive[j] = 0;
    }
  }
  return kept;
}

// Interference/occupancy map (load_data.py:1322-1430 semantics incl.
// quirks: rows indexed by the label x-center, cols by y; early
// termination drops the last filled layer; the final all-occupied case
// drops the last layer too). labels: [n, 7] normalized rows.
// out: [img_size * img_size] floats.
void interference_map(const float* labels, int64_t n, float semi_edge,
                      int64_t img_size, float* out) {
  const int64_t s = img_size;
  const int64_t se = static_cast<int64_t>(semi_edge);
  // border mask shared by every layer; track per-layer box fills so any
  // prefix sum can be reconstructed without materializing n canvases.
  std::vector<float> border(s * s, 0.0f);
  if (se > 0) {
    for (int64_t r = 0; r < s; ++r)
      for (int64_t c = 0; c < s; ++c)
        if (r < se || r >= s - se || c < se || c >= s - se)
          border[r * s + c] = 1.0f;
  }
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int64_t x, int64_t y) {
    return labels[x * 7 + 2] * labels[x * 7 + 3]
         < labels[y * 7 + 2] * labels[y * 7 + 3];
  });

  struct Rect { int64_t r0, r1, c0, c1; };
  std::vector<Rect> fills;
  auto compose = [&](int64_t n_layers, int64_t n_fills) {
    // sum of n_layers border layers + the first n_fills box fills
    const float bscale = static_cast<float>(n_layers);
    for (int64_t k = 0; k < s * s; ++k) out[k] = border[k] * bscale;
    for (int64_t f = 0; f < n_fills && f < (int64_t)fills.size(); ++f) {
      // a layer is border|fill (set, not add): only count the fill where
      // the layer's border isn't already 1
      const Rect& rc = fills[f];
      for (int64_t r = rc.r0; r < rc.r1; ++r)
        for (int64_t c = rc.c0; c < rc.c1; ++c)
          if (border[r * s + c] == 0.0f) out[r * s + c] += 1.0f;
    }
  };
  auto has_zero = [&]() {
    for (int64_t k = 0; k < s * s; ++k)
      if (out[k] == 0.0f) return true;
    return false;
  };

  for (int64_t i = 0; i < n; ++i) {
    compose(n, i);                 // current total: all n layers' borders
    if (!has_zero()) {
      // reference: sum(temp_lab[0:i-1]) — layers 0..i-2 (python slice;
      // i==0 -> all but the last layer)
      const int64_t nl = (i == 0) ? std::max<int64_t>(n - 1, 0) : i - 1;
      compose(nl, std::max<int64_t>(nl, 0) < i ? nl : i);
      return;
    }
    const float cx = labels[order[i] * 7 + 0] * s;
    const float cy = labels[order[i] * 7 + 1] * s;
    const float w = labels[order[i] * 7 + 2] * s;
    const float h = labels[order[i] * 7 + 3] * s;
    Rect rc;
    rc.r0 = std::max<int64_t>((int64_t)(cx - w / 2 - se), 0);
    rc.r1 = std::min<int64_t>(std::max<int64_t>((int64_t)(cx + w / 2 + se), 0), s);
    rc.c0 = std::max<int64_t>((int64_t)(cy - h / 2 - se), 0);
    rc.c1 = std::min<int64_t>(std::max<int64_t>((int64_t)(cy + h / 2 + se), 0), s);
    fills.push_back(rc);
  }
  compose(n, n);
  if (!has_zero()) compose(n - 1, n - 1);
}

// Parse whitespace-separated floats from text. Returns the count parsed
// (capped at max_out). Orders of magnitude faster than np.loadtxt for
// directory-scale label scans.
int64_t parse_floats(const char* text, int64_t len, float* out,
                     int64_t max_out) {
  int64_t count = 0;
  const char* p = text;
  const char* end = text + len;
  while (p < end && count < max_out) {
    while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
      ++p;
    if (p >= end) break;
    char* next = nullptr;
    const float v = std::strtof(p, &next);
    if (next == p) break;  // unparseable tail
    out[count++] = v;
    p = next;
  }
  return count;
}

}  // extern "C"
