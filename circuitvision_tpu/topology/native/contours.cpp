// First-party outer-contour tracer with OpenCV-equivalent semantics.
//
// Reproduces exactly what the reference pipeline consumes from
// cv2.findContours(RETR_EXTERNAL, CHAIN_APPROX_SIMPLE) + contourArea +
// moments + boundingRect (reference get_contours / get_node_connections,
// src/circuit_analyzer.py:388-459, 1380-1446):
//
//   * only TOP-LEVEL outer borders (components nested inside another
//     component's hole are skipped, like RETR_EXTERNAL's hierarchy cut);
//   * enumeration order = reverse raster discovery order (bottom-most
//     component first — cv2 builds its output list by prepending);
//   * per contour: the CHAIN_APPROX_SIMPLE vertex set (direction-change
//     points of the cyclic border chain — straight-run interiors drop
//     out), polygon area and first moments via Green's theorem over the
//     border polygon (NOT pixel counts: for a ring the polygon area
//     includes the hole, which pixel counting misses entirely), and the
//     chain bounding rect.
//
// The traced chain may start/orient differently from cv2's Suzuki-Abe
// walk; every consumed quantity is invariant to that (vertex SET, |area|,
// moment ratios, rect) — pinned against the real cv2 by
// tests/test_native_contours.py.
//
// Build: python -m circuitvision_tpu.topology.build_native
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Pt {
  int32_t x, y;
};

// Clockwise 8-neighborhood starting East.
static const int DX[8] = {1, 1, 0, -1, -1, -1, 0, 1};
static const int DY[8] = {0, 1, 1, 1, 0, -1, -1, -1};

}  // namespace

extern "C" {

// Returns the number of top-level contours (<= max_contours), or -1 on
// vertex-buffer overflow / contour-count overflow.
//
// Outputs:
//   vert_xy  : int32 pairs, vertices of contour k at
//              [offsets[k], offsets[k+1]) (x, y interleaved)
//   offsets  : int32[max_contours + 1]
//   stats    : double[max_contours * 9] =
//              {area, m00, m10, m01, minx, miny, maxx, maxy, root} per
//              contour (root = raster-first linear pixel index)
//              (area = |polygon area| like cv2.contourArea; m00/m10/m01
//               signed Green's-theorem moments like cv2.moments)
//   scratch  : int32[h * w] workspace (component labels)
int cv_trace_contours(const uint8_t* fg, int h, int w, int32_t* vert_xy,
                      int32_t vert_cap, int32_t* offsets, double* stats,
                      int32_t max_contours, int32_t* scratch) {
  const int64_t hw = (int64_t)h * w;
  int32_t* lab = scratch;
  std::memset(lab, 0, hw * sizeof(int32_t));

  // 1. 8-connected component labels in raster discovery order.
  std::vector<int64_t> first_pixel;  // per comp (1-based ids)
  std::vector<int64_t> stack;
  int32_t n_comp = 0;
  for (int64_t p = 0; p < hw; ++p) {
    if (!fg[p] || lab[p]) continue;
    ++n_comp;
    first_pixel.push_back(p);
    lab[p] = n_comp;
    stack.clear();
    stack.push_back(p);
    while (!stack.empty()) {
      const int64_t q = stack.back();
      stack.pop_back();
      const int y = (int)(q / w), x = (int)(q % w);
      for (int d = 0; d < 8; ++d) {
        const int nx = x + DX[d], ny = y + DY[d];
        if (nx < 0 || ny < 0 || nx >= w || ny >= h) continue;
        const int64_t nq = (int64_t)ny * w + nx;
        if (fg[nq] && !lab[nq]) {
          lab[nq] = n_comp;
          stack.push_back(nq);
        }
      }
    }
  }
  if (n_comp == 0) {
    offsets[0] = 0;
    return 0;
  }

  // 2. Outer background flood fill (4-connected from the frame),
  //    marked -1 in lab. Foreground is 8-connected, so its complement
  //    uses 4-connectivity (Suzuki duality).
  stack.clear();
  for (int x = 0; x < w; ++x) {
    for (int y : {0, h - 1}) {
      const int64_t p = (int64_t)y * w + x;
      if (!fg[p] && lab[p] == 0) {
        lab[p] = -1;
        stack.push_back(p);
      }
    }
  }
  for (int y = 0; y < h; ++y) {
    for (int x : {0, w - 1}) {
      const int64_t p = (int64_t)y * w + x;
      if (!fg[p] && lab[p] == 0) {
        lab[p] = -1;
        stack.push_back(p);
      }
    }
  }
  while (!stack.empty()) {
    const int64_t q = stack.back();
    stack.pop_back();
    const int y = (int)(q / w), x = (int)(q % w);
    const int nx4[4] = {x + 1, x - 1, x, x};
    const int ny4[4] = {y, y, y + 1, y - 1};
    for (int d = 0; d < 4; ++d) {
      if (nx4[d] < 0 || ny4[d] < 0 || nx4[d] >= w || ny4[d] >= h) continue;
      const int64_t nq = (int64_t)ny4[d] * w + nx4[d];
      if (!fg[nq] && lab[nq] == 0) {
        lab[nq] = -1;
        stack.push_back(nq);
      }
    }
  }

  // 3. Top-level components: touch the frame or the outer background
  //    (4-adjacency).
  std::vector<uint8_t> top(n_comp + 1, 0);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int64_t p = (int64_t)y * w + x;
      if (!fg[p]) continue;
      const int32_t c = lab[p];
      if (top[c]) continue;
      if (x == 0 || y == 0 || x == w - 1 || y == h - 1) {
        top[c] = 1;
        continue;
      }
      if (lab[p - 1] == -1 || lab[p + 1] == -1 || lab[p - w] == -1 ||
          lab[p + w] == -1) {
        top[c] = 1;
      }
    }
  }

  // 4. Trace each top-level component's outer border, highest component
  //    id first (reverse raster discovery = cv2 output order).
  int32_t n_out = 0;
  int32_t vtop = 0;
  std::vector<Pt> chain;
  for (int32_t c = n_comp; c >= 1; --c) {
    if (!top[c]) continue;
    if (n_out >= max_contours) return -1;

    const int64_t p0 = first_pixel[c - 1];
    const int y0 = (int)(p0 / w), x0 = (int)(p0 % w);
    chain.clear();

    // Moore-neighbor trace (clockwise search from the backtrack
    // direction). Start pixel is the component's raster-first pixel, so
    // its W and N neighbors are not part of the component.
    //
    // Termination: the walk is deterministic in the state
    // (pixel, backtrack). The artificial initial backtrack (W) may never
    // recur, so we stop when the state of the FIRST MOVE's landing pixel
    // recurs — at that point exactly one full border cycle has been
    // appended (ending with the start pixel).
    auto find_dir = [&](int px, int py, int back) -> int {
      for (int d = 1; d <= 8; ++d) {
        const int cand = (back + d) & 7;
        const int nx = px + DX[cand], ny = py + DY[cand];
        if (nx < 0 || ny < 0 || nx >= w || ny >= h) continue;
        if (lab[(int64_t)ny * w + nx] == c) return cand;
      }
      return -1;
    };
    const int dir0 = find_dir(x0, y0, 4);
    if (dir0 < 0) {
      chain.push_back({x0, y0});  // isolated pixel
    } else {
      const int x1 = x0 + DX[dir0], y1 = y0 + DY[dir0];
      const int back1 = (dir0 + 4) & 7;
      int cx = x1, cy = y1, back = back1;
      int guard = 8 * (int)hw + 16;
      while (true) {
        chain.push_back({cx, cy});
        const int dir = find_dir(cx, cy, back);
        cx += DX[dir];
        cy += DY[dir];
        back = (dir + 4) & 7;
        if (cx == x1 && cy == y1 && back == back1) break;
        if (--guard <= 0) break;  // safety net; should be unreachable
      }
    }

    // 5. CHAIN_APPROX_SIMPLE vertex set: cyclic direction-change points.
    const int m = (int)chain.size();
    const int32_t voff = vtop;
    if (m == 1) {
      if (vtop + 1 > vert_cap / 2) return -1;
      vert_xy[2 * vtop] = chain[0].x;
      vert_xy[2 * vtop + 1] = chain[0].y;
      ++vtop;
    } else {
      for (int i = 0; i < m; ++i) {
        const Pt& prev = chain[(i + m - 1) % m];
        const Pt& cur = chain[i];
        const Pt& nxt = chain[(i + 1) % m];
        const int din_x = cur.x - prev.x, din_y = cur.y - prev.y;
        const int dout_x = nxt.x - cur.x, dout_y = nxt.y - cur.y;
        if (din_x != dout_x || din_y != dout_y) {
          if (vtop + 1 > vert_cap / 2) return -1;
          vert_xy[2 * vtop] = cur.x;
          vert_xy[2 * vtop + 1] = cur.y;
          ++vtop;
        }
      }
    }

    // 6. Polygon stats over the FULL chain (identical integrals to the
    //    vertex polygon; collinear points change nothing).
    double a2 = 0.0, m10x6 = 0.0, m01x6 = 0.0;
    double minx = chain[0].x, maxx = chain[0].x;
    double miny = chain[0].y, maxy = chain[0].y;
    for (int i = 0; i < m; ++i) {
      const Pt& p = chain[i];
      const Pt& q = chain[(i + 1) % m];
      const double cross =
          (double)p.x * (double)q.y - (double)q.x * (double)p.y;
      a2 += cross;
      m10x6 += cross * (p.x + q.x);
      m01x6 += cross * (p.y + q.y);
      if (p.x < minx) minx = p.x;
      if (p.x > maxx) maxx = p.x;
      if (p.y < miny) miny = p.y;
      if (p.y > maxy) maxy = p.y;
    }
    double* s = stats + (int64_t)n_out * 9;
    s[0] = (a2 < 0 ? -a2 : a2) / 2.0;  // cv2.contourArea
    s[1] = a2 / 2.0;                   // m00 (signed)
    s[2] = m10x6 / 6.0;                // m10
    s[3] = m01x6 / 6.0;                // m01
    s[4] = minx;
    s[5] = miny;
    s[6] = maxx;
    s[7] = maxy;
    s[8] = (double)p0;
    offsets[n_out] = voff;
    ++n_out;
  }
  offsets[n_out] = vtop;
  // shift offsets so offsets[k] is the start of contour k
  // (they were written as start offsets already; final entry = total)
  return n_out;
}

}  // extern "C"
