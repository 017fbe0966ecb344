// Native host-side kernels for detjax (SURVEY.md §2a).
//
// The reference's host-side native substrate is pycocotools' C/Cython
// evaluation core and cv2/libjpeg image ops; these are their detjax
// equivalents, exposed through a plain C ABI consumed via ctypes
// (detjax/native/__init__.py). Each function has a numpy twin in
// detjax/evaluation/coco_map.py / detjax/data/transforms.py that serves as
// the correctness oracle — results must match exactly (matching) or to
// rounding (resize).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC (driven by detjax.native._build).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Pairwise IoU, COCO semantics: crowd GT divides by det area only
// (mirror of coco_map._iou_xyxy; pycocotools maskApi `iou`).
void detjax_iou_xyxy(const double* det, int64_t d_n,
                     const double* gt, int64_t g_n,
                     const uint8_t* iscrowd, double* out) {
  for (int64_t i = 0; i < d_n; ++i) {
    const double dx1 = det[i * 4 + 0], dy1 = det[i * 4 + 1];
    const double dx2 = det[i * 4 + 2], dy2 = det[i * 4 + 3];
    const double da =
        std::max(dx2 - dx1, 0.0) * std::max(dy2 - dy1, 0.0);
    for (int64_t j = 0; j < g_n; ++j) {
      const double gx1 = gt[j * 4 + 0], gy1 = gt[j * 4 + 1];
      const double gx2 = gt[j * 4 + 2], gy2 = gt[j * 4 + 3];
      const double iw = std::min(dx2, gx2) - std::max(dx1, gx1);
      const double ih = std::min(dy2, gy2) - std::max(dy1, gy1);
      const double inter = std::max(iw, 0.0) * std::max(ih, 0.0);
      const double ga =
          std::max(gx2 - gx1, 0.0) * std::max(gy2 - gy1, 0.0);
      const double denom = iscrowd[j] ? da : (da + ga - inter);
      out[i * g_n + j] = inter / std::max(denom, 1e-12);
    }
  }
}

// COCOeval.evaluateImg greedy matching over all IoU thresholds — exact
// mirror of coco_map._evaluate_img's triple loop, including the
// ignored-GT early break and the tie rule (equal IoU prefers later GT).
// Inputs are already GT-sorted (non-ignored first).
//   ious:   [d_n * g_n] row-major
//   dtm:    out [t_n * d_n], 1 + matched gt slot, 0 = unmatched
//   dt_ig:  out [t_n * d_n] detection-ignored flags
void detjax_match_image(const double* ious, const uint8_t* gt_ig,
                        const uint8_t* g_crowd, const double* det_areas,
                        double area_lo, double area_hi,
                        const double* iou_thrs, int64_t t_n,
                        int64_t d_n, int64_t g_n,
                        int64_t* dtm, uint8_t* dt_ig) {
  std::vector<int64_t> gtm(static_cast<size_t>(g_n));
  for (int64_t t = 0; t < t_n; ++t) {
    std::fill(gtm.begin(), gtm.end(), 0);
    for (int64_t d = 0; d < d_n; ++d) {
      double best = std::min(iou_thrs[t], 1.0 - 1e-10);
      int64_t m = -1;
      for (int64_t g = 0; g < g_n; ++g) {
        if (gtm[static_cast<size_t>(g)] > 0 && !g_crowd[g]) continue;
        if (m > -1 && !gt_ig[m] && gt_ig[g]) break;
        const double v = ious[d * g_n + g];
        if (v < best) continue;
        best = v;
        m = g;
      }
      const bool out_rng = det_areas[d] < area_lo || det_areas[d] > area_hi;
      if (m == -1) {
        dtm[t * d_n + d] = 0;
        dt_ig[t * d_n + d] = out_rng ? 1 : 0;
        continue;
      }
      dtm[t * d_n + d] = m + 1;
      dt_ig[t * d_n + d] = gt_ig[m] ? 1 : 0;
      if (!g_crowd[m]) gtm[static_cast<size_t>(m)] = d + 1;
    }
  }
}

// Bilinear resize for uint8 HWC images (half-pixel centers, no antialias).
// Native replacement for the data loader's PIL resize hot path.
void detjax_resize_bilinear_u8(const uint8_t* src, int64_t sh, int64_t sw,
                               int64_t c, uint8_t* dst, int64_t dh,
                               int64_t dw) {
  const double ry = static_cast<double>(sh) / static_cast<double>(dh);
  const double rx = static_cast<double>(sw) / static_cast<double>(dw);
  std::vector<int64_t> x0s(static_cast<size_t>(dw)), x1s(static_cast<size_t>(dw));
  std::vector<double> wxs(static_cast<size_t>(dw));
  for (int64_t x = 0; x < dw; ++x) {
    double fx = (static_cast<double>(x) + 0.5) * rx - 0.5;
    fx = std::max(fx, 0.0);
    int64_t x0 = static_cast<int64_t>(fx);
    x0 = std::min(x0, sw - 1);
    x0s[static_cast<size_t>(x)] = x0;
    x1s[static_cast<size_t>(x)] = std::min(x0 + 1, sw - 1);
    wxs[static_cast<size_t>(x)] = fx - static_cast<double>(x0);
  }
  for (int64_t y = 0; y < dh; ++y) {
    double fy = (static_cast<double>(y) + 0.5) * ry - 0.5;
    fy = std::max(fy, 0.0);
    int64_t y0 = static_cast<int64_t>(fy);
    y0 = std::min(y0, sh - 1);
    const int64_t y1 = std::min(y0 + 1, sh - 1);
    const double wy = fy - static_cast<double>(y0);
    const uint8_t* row0 = src + y0 * sw * c;
    const uint8_t* row1 = src + y1 * sw * c;
    uint8_t* out_row = dst + y * dw * c;
    for (int64_t x = 0; x < dw; ++x) {
      const int64_t x0 = x0s[static_cast<size_t>(x)] * c;
      const int64_t x1 = x1s[static_cast<size_t>(x)] * c;
      const double wx = wxs[static_cast<size_t>(x)];
      for (int64_t k = 0; k < c; ++k) {
        const double top = row0[x0 + k] * (1.0 - wx) + row0[x1 + k] * wx;
        const double bot = row1[x0 + k] * (1.0 - wx) + row1[x1 + k] * wx;
        const double v = top * (1.0 - wy) + bot * wy;
        out_row[x * c + k] = static_cast<uint8_t>(v + 0.5);
      }
    }
  }
}

}  // extern "C"
