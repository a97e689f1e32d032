// Native runtime pieces for the TPU ASR framework.
//
// The reference (Alexander-H-Liu/End-to-end-ASR-Pytorch) has no native code
// of its own but delegates hot host-side work to C++ dependencies
// (editdistance for WER scoring, sox/torchaudio for audio decode,
// sentencepiece for tokenization — SURVEY.md section 2 preamble). This
// library supplies those capabilities natively; Python binds via ctypes
// (end_to_end_asr_pytorch_tpu/utils/native.py).
//
// edit_distance: two-row Levenshtein over int32 token sequences.
// edit_distance_batch: scores many hypothesis/reference pairs in one call
// (amortizes the ctypes crossing for whole-dev-set WER computation).

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

int32_t edit_distance(const int32_t* a, int32_t la,
                      const int32_t* b, int32_t lb) {
  if (la < lb) {
    std::swap(a, b);
    std::swap(la, lb);
  }
  if (lb == 0) return la;
  std::vector<int32_t> prev(lb + 1), cur(lb + 1);
  for (int32_t j = 0; j <= lb; ++j) prev[j] = j;
  for (int32_t i = 1; i <= la; ++i) {
    cur[0] = i;
    const int32_t ca = a[i - 1];
    for (int32_t j = 1; j <= lb; ++j) {
      const int32_t sub = prev[j - 1] + (ca != b[j - 1]);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

// Flattened batch: tokens_a holds all hypothesis sequences back to back with
// lengths in len_a (size n); likewise tokens_b/len_b. Results in out (size n).
void edit_distance_batch(const int32_t* tokens_a, const int32_t* len_a,
                         const int32_t* tokens_b, const int32_t* len_b,
                         int32_t n, int32_t* out) {
  int64_t off_a = 0, off_b = 0;
  for (int32_t i = 0; i < n; ++i) {
    out[i] = edit_distance(tokens_a + off_a, len_a[i], tokens_b + off_b,
                           len_b[i]);
    off_a += len_a[i];
    off_b += len_b[i];
  }
}

}  // extern "C"
