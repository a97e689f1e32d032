// Native BPE encoder: greedy lowest-rank merge tokenization.
//
// The reference tokenizes subwords through sentencepiece (a C++ dependency,
// SURVEY.md 2.9); this supplies the native-speed encode path for our
// self-contained BPE models (utils/text.py SubwordTextEncoder holds the
// Python reference implementation and fallback). Handle-based C API bound
// via ctypes.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr const char* kBoundary = "\xE2\x96\x81";  // U+2581

struct BpeModel {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::string, int32_t> merge_rank;  // "a\x01b" -> rank
  int32_t unk;
};

std::string pair_key(const std::string& a, const std::string& b) {
  std::string k = a;
  k.push_back('\x01');
  k += b;
  return k;
}

// split a UTF-8 string into codepoint-wise pieces
std::vector<std::string> utf8_chars(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    unsigned char c = s[i];
    size_t n = c < 0x80 ? 1 : (c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : 4;
    out.push_back(s.substr(i, n));
    i += n;
  }
  return out;
}

}  // namespace

extern "C" {

void* bpe_create(const char** vocab, int32_t n_vocab, const char** merge_a,
                 const char** merge_b, int32_t n_merges, int32_t unk_id) {
  auto* m = new BpeModel();
  for (int32_t i = 0; i < n_vocab; ++i) m->vocab[vocab[i]] = i;
  for (int32_t i = 0; i < n_merges; ++i)
    m->merge_rank[pair_key(merge_a[i], merge_b[i])] = i;
  m->unk = unk_id;
  return m;
}

void bpe_destroy(void* h) { delete static_cast<BpeModel*>(h); }

// Encode whitespace-tokenized text; writes ids (no eos), returns count
// (or -needed if max_out too small).
int32_t bpe_encode(void* h, const char* text, int32_t* out,
                   int32_t max_out) {
  auto* m = static_cast<BpeModel*>(h);
  std::string s(text);
  std::vector<int32_t> ids;
  size_t pos = 0;
  while (pos < s.size()) {
    while (pos < s.size() && s[pos] == ' ') ++pos;
    size_t end = s.find(' ', pos);
    if (end == std::string::npos) end = s.size();
    if (end == pos) break;
    std::string word = s.substr(pos, end - pos);
    pos = end;

    std::vector<std::string> pieces = utf8_chars(word);
    if (!pieces.empty()) pieces[0] = std::string(kBoundary) + pieces[0];
    // greedy lowest-rank merge
    while (pieces.size() > 1) {
      int best = -1;
      int32_t best_rank = INT32_MAX;
      for (size_t i = 0; i + 1 < pieces.size(); ++i) {
        auto it = m->merge_rank.find(pair_key(pieces[i], pieces[i + 1]));
        if (it != m->merge_rank.end() && it->second < best_rank) {
          best = (int)i;
          best_rank = it->second;
        }
      }
      if (best < 0) break;
      pieces[best] += pieces[best + 1];
      pieces.erase(pieces.begin() + best + 1);
    }
    for (auto& piece : pieces) {
      auto it = m->vocab.find(piece);
      ids.push_back(it == m->vocab.end() ? m->unk : it->second);
    }
  }
  if ((int32_t)ids.size() > max_out) return -(int32_t)ids.size();
  std::memcpy(out, ids.data(), ids.size() * sizeof(int32_t));
  return (int32_t)ids.size();
}

}  // extern "C"
