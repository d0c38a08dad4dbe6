// Monotonic DTW for Whisper word-timestamp alignment (host path).
//
// The reference gets word timestamps from WhisperX's wav2vec2 forced aligner
// (preprocessing/text_feature_extractor.py:129-160). The TPU-native pipeline
// instead aligns with the ASR model's own cross-attention (the method of
// openai-whisper's timing module): the TPU emits a [tokens, frames] alignment
// cost matrix, and this routine finds the minimum-cost monotonic path with
// steps down / right / diagonal. O(N*M) fill + backtrace; N<=448, M<=1500 per
// 30 s chunk, so the fill is ~0.7M cells — microseconds in C++ where the
// pure-Python fallback (repurpose_tpu/native.py) takes milliseconds.
//
// Returns the path as (token_index, frame_index) pairs, ordered start->end.

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {
constexpr float kInf = 1e30f;
}

extern "C" {

// cost: [n, m] row-major. out_ti/out_tj: caller-allocated, capacity n + m.
// Returns path length (always in [max(n, m), n + m - 1]) or -1 on bad input.
int repurpose_dtw(const float* cost, int n, int m, int32_t* out_ti,
                  int32_t* out_tj) {
  if (n <= 0 || m <= 0 || cost == nullptr) return -1;
  // bad_alloc from the DP buffers must not escape the C ABI (ctypes would
  // std::terminate); -1 sends the caller to the numpy fallback
  try {
  // DP over an (n+1) x (m+1) grid with an inf border; trace records the
  // predecessor move: 0 = diagonal, 1 = up (advance token), 2 = left
  // (advance frame).
  std::vector<float> prev(m + 1, kInf), cur(m + 1, kInf);
  std::vector<int8_t> trace(static_cast<size_t>(n + 1) * (m + 1), 0);
  prev[0] = 0.0f;
  for (int i = 1; i <= n; ++i) {
    cur[0] = kInf;
    const float* row = cost + static_cast<size_t>(i - 1) * m;
    int8_t* trow = trace.data() + static_cast<size_t>(i) * (m + 1);
    for (int j = 1; j <= m; ++j) {
      float c0 = prev[j - 1];  // diagonal
      float c1 = prev[j];      // up
      float c2 = cur[j - 1];   // left
      float c;
      int8_t t;
      if (c0 < c1 && c0 < c2) {
        c = c0;
        t = 0;
      } else if (c1 < c0 && c1 < c2) {
        c = c1;
        t = 1;
      } else {
        c = c2;
        t = 2;
      }
      cur[j] = row[j - 1] + c;
      trow[j] = t;
    }
    std::swap(prev, cur);
  }
  // Backtrace from (n, m); the inf border guarantees the path reaches (1, 1)
  // and exits through the diagonal move to (0, 0).
  int i = n, j = m, len = 0;
  std::vector<int32_t> ti(n + m), tj(n + m);
  while (i > 0 || j > 0) {
    if (len >= n + m) return -1;  // cannot happen; guards corrupt input
    ti[len] = i - 1;
    tj[len] = j - 1;
    ++len;
    int8_t t = (i > 0 && j > 0)
                   ? trace[static_cast<size_t>(i) * (m + 1) + j]
                   : (i > 0 ? int8_t{1} : int8_t{2});
    if (t == 0) {
      --i;
      --j;
    } else if (t == 1) {
      --i;
    } else {
      --j;
    }
  }
  for (int k = 0; k < len; ++k) {
    out_ti[k] = ti[len - 1 - k];
    out_tj[k] = tj[len - 1 - k];
  }
  return len;
  } catch (...) {
    return -1;
  }
}

}  // extern "C"
