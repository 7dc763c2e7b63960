// Native Levenshtein edit distance for WER/CER scoring.
//
// The reference scores WER/CER through the `editdistance` C++ pip package
// (SURVEY.md section 2.2 #N4). That dependency is not available here, so this
// is a first-party equivalent: a batched, two-row DP over int32 token ids,
// exposed via a plain C ABI and loaded from Python with ctypes
// (metaasr_tpu/train/metrics.py). Host-side only — never on the TPU path.
//
// Build: make -C native  (produces libmetaasr_native.so)

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Edit distance between two int32 id sequences.
int64_t metaasr_edit_distance(const int32_t* a, int64_t la,
                              const int32_t* b, int64_t lb) {
  if (la == 0) return lb;
  if (lb == 0) return la;
  // Ensure the inner row is the shorter sequence.
  if (lb > la) {
    std::swap(a, b);
    std::swap(la, lb);
  }
  std::vector<int64_t> row(static_cast<size_t>(lb) + 1);
  for (int64_t j = 0; j <= lb; ++j) row[j] = j;
  for (int64_t i = 1; i <= la; ++i) {
    int64_t prev_diag = row[0];  // row[i-1][j-1]
    row[0] = i;
    for (int64_t j = 1; j <= lb; ++j) {
      int64_t up = row[j];  // row[i-1][j]
      int64_t cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
      row[j] = std::min({row[j - 1] + 1, up + 1, prev_diag + cost});
      prev_diag = up;
    }
  }
  return row[lb];
}

// Batched variant: sequences are packed flat with per-sequence lengths.
// Writes one distance per pair into `out`.
void metaasr_edit_distance_batch(const int32_t* a_flat, const int64_t* a_lens,
                                 const int32_t* b_flat, const int64_t* b_lens,
                                 int64_t n, int64_t* out) {
  int64_t a_off = 0, b_off = 0;
  for (int64_t i = 0; i < n; ++i) {
    out[i] = metaasr_edit_distance(a_flat + a_off, a_lens[i],
                                   b_flat + b_off, b_lens[i]);
    a_off += a_lens[i];
    b_off += b_lens[i];
  }
}

}  // extern "C"
