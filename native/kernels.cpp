// Native kernels for frlw_evd_tpu (C ABI, loaded via ctypes).
//
// 1. Box IoU kernels — native equivalents of the reference's Cython
//    extension (core/Others/seqnms/compute_overlap.pyx): used by the
//    host-side seq-NMS tube linker and as a parity oracle for the jitted
//    XLA IoU ops.
// 2. event_queue_tensor — sequential per-pixel event-queue reference
//    (data/event_representation_tool/src/event_queue_tensor.cpp behavior):
//    per (x, y, polarity) deque of (activity, bin) pairs drained into a dense
//    tensor; the parity oracle for the vectorised TAF queue kernel.
//
// Build: make (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

extern "C" {

// areas[i] = (x2-x1)*(y2-y1)
void compute_area(const double* boxes, int64_t n, double* areas) {
  for (int64_t i = 0; i < n; ++i) {
    const double* b = boxes + 4 * i;
    areas[i] = (b[2] - b[0]) * (b[3] - b[1]);
  }
}

// overlaps[n, k] = IoU(boxes[n], query[k]); zero when no positive overlap
void compute_overlap(const double* boxes, int64_t n, const double* query,
                     int64_t k, double* overlaps) {
  for (int64_t j = 0; j < k; ++j) {
    const double* q = query + 4 * j;
    const double q_area = (q[2] - q[0]) * (q[3] - q[1]);
    for (int64_t i = 0; i < n; ++i) {
      const double* b = boxes + 4 * i;
      const double iw = std::min(b[2], q[2]) - std::max(b[0], q[0]);
      double out = 0.0;
      if (iw > 0) {
        const double ih = std::min(b[3], q[3]) - std::max(b[1], q[1]);
        if (ih > 0) {
          const double ua =
              (b[2] - b[0]) * (b[3] - b[1]) + q_area - iw * ih;
          out = iw * ih / ua;
        }
      }
      overlaps[i * k + j] = out;
    }
  }
}

// Sequential TAF event-queue tensor.
//
// events: (n, 6) float64 rows [b, x, y, t, p, z] where z is the micro-bin
// index and t is the in-bin normalised timestamp.
// For every bin in order: per (b, x, y, p) accumulate count and sum(t - 1);
// after the bin, for every pixel that received events, push mean onto its
// K-deep queue (dropping the oldest); pixels without new events age by -1
// unless the whole bin was empty (matching generate_taf.py:40-51).
//
// out: (batch, H, W, 2, K) float32, initialised by the caller (e.g. -6000).
void event_queue_tensor(const double* events, int64_t n_events, int64_t batch,
                        int64_t height, int64_t width, int64_t K,
                        int64_t n_bins, float* out) {
  const int64_t cells = batch * height * width * 2;
  std::vector<float> cnt(cells), tsum(cells);
  int64_t cursor = 0;
  for (int64_t bin = 0; bin < n_bins; ++bin) {
    std::fill(cnt.begin(), cnt.end(), 0.f);
    std::fill(tsum.begin(), tsum.end(), 0.f);
    bool any = false;
    while (cursor < n_events &&
           static_cast<int64_t>(events[cursor * 6 + 5]) == bin) {
      const double* e = events + cursor * 6;
      const int64_t b = static_cast<int64_t>(e[0]);
      const int64_t x = static_cast<int64_t>(e[1]);
      const int64_t y = static_cast<int64_t>(e[2]);
      const int64_t p = static_cast<int64_t>(e[4]);
      if (b >= 0 && b < batch && x >= 0 && x < width && y >= 0 && y < height &&
          p >= 0 && p < 2) {
        const int64_t idx = ((b * height + y) * width + x) * 2 + p;
        cnt[idx] += 1.f;
        tsum[idx] += static_cast<float>(e[3] - 1.0);
        any = true;
      }
      ++cursor;
    }
    if (!any) continue;  // empty bin freezes the whole state
    for (int64_t c = 0; c < cells; ++c) {
      float* q = out + c * K;
      if (cnt[c] > 0.f) {
        const float mean = tsum[c] / (cnt[c] + 1e-8f);
        for (int64_t s = 0; s + 1 < K; ++s) q[s] = q[s + 1] - 1.f;
        q[K - 1] = mean;
      } else {
        for (int64_t s = 0; s < K; ++s) q[s] -= 1.f;
      }
    }
  }
}

// COCO greedy matching for ONE category across all images, IoU thresholds
// and area ranges in a single call (the hot loop of COCOeval.evaluateImg,
// reference evaluate/src/metrics/coco_eval.py:89-113 via pycocotools).
//
// dt_boxes (D_total, 4) xywh, pre-sorted per image by descending score and
// pre-truncated to maxDets; gt_boxes (G_total, 4) xywh. dt_off / gt_off are
// (n_img + 1) row offsets. iou_thrs (T); area_rngs (A, 2) [lo, hi].
//
// codes out (A, T, D_total) int8: 1 = TP, 0 = FP, 2 = ignored.
// npig out (A) int64: non-ignored gt count per area range.
//
// IoU is computed once per image and reused across all A x T matchings;
// tie-breaks replicate pycocotools exactly (strict '<' skip, so an equal
// IoU later in gt order takes the match; ignored gts sorted after real
// ones with a stable partition; the scan breaks at the first ignored gt
// once a real gt is matched).
void coco_match(const double* dt_boxes, const int64_t* dt_off,
                const double* gt_boxes, const int64_t* gt_off,
                int64_t n_img, const double* iou_thrs, int64_t T,
                const double* area_rngs, int64_t A, int8_t* codes,
                int64_t* npig) {
  const int64_t d_total = dt_off[n_img];
  for (int64_t a = 0; a < A; ++a) npig[a] = 0;

  std::vector<double> iou;       // D x G for the current image
  std::vector<double> gt_area, dt_area;
  std::vector<int64_t> order;    // gt order: non-ignored first (stable)
  std::vector<unsigned char> gig;
  std::vector<int64_t> gtm;

  for (int64_t img = 0; img < n_img; ++img) {
    const int64_t d0 = dt_off[img], d1 = dt_off[img + 1];
    const int64_t g0 = gt_off[img], g1 = gt_off[img + 1];
    const int64_t D = d1 - d0, G = g1 - g0;
    if (D == 0 && G == 0) continue;

    gt_area.resize(G);
    for (int64_t g = 0; g < G; ++g) {
      const double* b = gt_boxes + 4 * (g0 + g);
      gt_area[g] = b[2] * b[3];
    }
    dt_area.resize(D);
    for (int64_t d = 0; d < D; ++d) {
      const double* b = dt_boxes + 4 * (d0 + d);
      dt_area[d] = b[2] * b[3];
    }
    iou.resize(D * G);
    for (int64_t d = 0; d < D; ++d) {
      const double* db = dt_boxes + 4 * (d0 + d);
      const double dx1 = db[0], dy1 = db[1];
      const double dx2 = db[0] + db[2], dy2 = db[1] + db[3];
      for (int64_t g = 0; g < G; ++g) {
        const double* gb = gt_boxes + 4 * (g0 + g);
        const double iw =
            std::min(dx2, gb[0] + gb[2]) - std::max(dx1, gb[0]);
        const double ih =
            std::min(dy2, gb[1] + gb[3]) - std::max(dy1, gb[1]);
        double v = 0.0;
        if (iw > 0 && ih > 0) {
          const double ua = dt_area[d] + gt_area[g] - iw * ih;
          if (ua > 0) v = iw * ih / ua;
        }
        iou[d * G + g] = v;
      }
    }

    for (int64_t a = 0; a < A; ++a) {
      const double lo = area_rngs[2 * a], hi = area_rngs[2 * a + 1];
      gig.resize(G);
      order.clear();
      for (int64_t g = 0; g < G; ++g)
        if (gt_area[g] >= lo && gt_area[g] <= hi) order.push_back(g);
      const int64_t n_real = static_cast<int64_t>(order.size());
      npig[a] += n_real;
      for (int64_t g = 0; g < G; ++g)
        if (gt_area[g] < lo || gt_area[g] > hi) order.push_back(g);
      for (int64_t i = 0; i < G; ++i) gig[i] = (i >= n_real);

      for (int64_t t = 0; t < T; ++t) {
        int8_t* code_row = codes + (a * T + t) * d_total + d0;
        gtm.assign(G, -1);
        for (int64_t d = 0; d < D; ++d) {
          double best = std::min(iou_thrs[t], 1.0 - 1e-10);
          int64_t m = -1;
          for (int64_t oi = 0; oi < G; ++oi) {
            if (gtm[oi] >= 0) continue;
            // m and oi are positions in `order` (real gts first), so the
            // ignore flag is position-indexed
            if (m > -1 && !gig[m] && gig[oi]) break;
            const double v = iou[d * G + order[oi]];
            if (v < best) continue;
            best = v;
            m = oi;
          }
          if (m == -1) {
            // unmatched: FP unless area out of range
            code_row[d] =
                (dt_area[d] < lo || dt_area[d] > hi) ? int8_t{2} : int8_t{0};
            continue;
          }
          gtm[m] = d;
          code_row[d] = gig[m] ? int8_t{2} : int8_t{1};
        }
      }
    }
  }
}

}  // extern "C"
