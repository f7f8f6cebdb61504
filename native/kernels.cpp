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

}  // extern "C"
