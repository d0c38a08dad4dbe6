// Native Gaussian Soft-NMS over 1-D intervals (host eval path).
//
// Same selection semantics as the Python oracle
// (repurpose_tpu/ops/softnms.py, itself parity-locked to the reference's
// models/softnms.py:3-38) including the behavioral quirks: pre-swap
// threshold test, position-indexed stale lengths, break-before-decay, and
// post-swap-order keep truncation. ~30x the numpy oracle's speed on
// 1000-candidate inputs. Production decode runs Soft-NMS ON DEVICE
// (ops/decode.py uses soft_nms_tpu); this kernel is the fast HOST
// alternative for external pipelines that consume the library without a
// TPU, and is parity-tested against the oracle + reference goldens
// (tests/test_native.py).
//
// C ABI: soft_nms_f32(scores, segments, n, sigma, thresh, max_seg_num,
//                     keep_out) -> number of kept candidates; keep_out gets
//                     original candidate indices in output order.

#include <cmath>
#include <cstdint>
#include <utility>
#include <vector>

extern "C" {

int64_t soft_nms_f32(const float* scores_in, const float* segments_in,
                     int64_t n, float sigma, float thresh,
                     int64_t max_seg_num, int64_t* keep_out) {
  if (n <= 0) return 0;
  // float (not double) throughout: the reference's decay loop runs on
  // float32 numpy arrays, and near-threshold comparisons are precision-bound
  std::vector<float> s(n), b(n), e(n), len0(n);
  std::vector<int64_t> idx(n);
  for (int64_t i = 0; i < n; ++i) {
    s[i] = scores_in[i];
    b[i] = segments_in[2 * i];
    e[i] = segments_in[2 * i + 1];
    len0[i] = e[i] - b[i];  // position-indexed; never swapped (quirk)
    idx[i] = i;
  }
  int64_t max_segments = max_seg_num < n ? max_seg_num : n;
  int64_t selected = 0;
  for (int64_t i = 0; i < n; ++i) {
    float tscore = s[i];  // pre-swap (quirk)
    if (i != n - 1) {
      int64_t maxpos = i + 1;
      for (int64_t j = i + 2; j < n; ++j)
        if (s[j] > s[maxpos]) maxpos = j;
      if (tscore < s[maxpos]) {
        std::swap(s[i], s[maxpos]);
        std::swap(b[i], b[maxpos]);
        std::swap(e[i], e[maxpos]);
        std::swap(idx[i], idx[maxpos]);
      }
    }
    if (tscore > thresh) {
      if (++selected >= max_segments) break;  // break BEFORE decay (quirk)
    }
    for (int64_t j = i + 1; j < n; ++j) {
      float ov = std::min(e[i], e[j]) - std::max(b[i], b[j]);
      if (ov < 0) ov = 0;
      float total = len0[i] + len0[j] - ov;  // stale lengths (quirk)
      if (total != 0.0f) {
        // reference semantics: total < 0 decays with a FINITE weight
        // (negative ratio, positive square)
        float ratio = ov / total;
        float w = std::exp(-(ratio * ratio) / sigma);
        // oracle: np.where(np.isnan(weight), 0, weight) — NaN segment
        // coordinates (ov or total NaN) must zero the score, not poison it
        if (std::isnan(w)) w = 0.0f;
        s[j] *= w;
      } else {
        // ov > 0: reference ratio is inf -> weight exactly 0.
        // ov == 0 (0/0): reference NaN-poisons; drop NaN-free (PARITY.md)
        s[j] = 0.0f;
      }
    }
  }
  int64_t n_keep = 0;
  for (int64_t i = 0; i < n && n_keep < max_segments; ++i)
    if (s[i] > thresh) keep_out[n_keep++] = idx[i];
  return n_keep;
}

}  // extern "C"
