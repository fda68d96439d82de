// Native n-gram language model with Katz backoff — the TPU-framework
// equivalent of the reference's KenLM dependency (used via pyctcdecode at
// networks/transducer.py:22-24,168-213 and loaded at inference.py:29).
//
// Loads standard ARPA files; scoring follows the usual backoff recursion
//   P(w | ctx) = P(ctx+w)                     if the full n-gram exists
//              = backoff(ctx) + P(w | ctx[1:]) otherwise
// in log10 space (ARPA convention, same as KenLM). Exposed through a C ABI
// consumed by ctypes (rnntransducer_tpu/decode/ngram_lm.py).
//
// Build: g++ -O2 -shared -fPIC -o libngram_lm.so ngram_lm.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr float KLogZero = -99.0f;  // ARPA convention for "no probability"

struct Entry {
  float prob = KLogZero;     // log10 P
  float backoff = 0.0f;      // log10 backoff weight
};

// 64-bit FNV-1a over the id sequence; ids are dense so collisions across
// distinct n-grams are negligible for LM sizes this targets, and we keep
// per-order maps so length is implicitly part of the key.
uint64_t HashIds(const int32_t* ids, int len) {
  uint64_t h = 1469598103934665603ull;
  for (int i = 0; i < len; ++i) {
    uint64_t v = static_cast<uint64_t>(static_cast<uint32_t>(ids[i]));
    for (int b = 0; b < 4; ++b) {
      h ^= (v >> (8 * b)) & 0xff;
      h *= 1099511628211ull;
    }
  }
  return h;
}

struct NGramLM {
  int order = 0;
  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::string> sorted_words;              // for prefix queries
  std::vector<std::unordered_map<uint64_t, Entry>> tables;  // [n-1] -> grams

  int32_t WordId(const std::string& w) const {
    auto it = vocab.find(w);
    return it == vocab.end() ? -1 : it->second;
  }

  const Entry* Find(const int32_t* ids, int len) const {
    if (len <= 0 || len > order) return nullptr;
    const auto& t = tables[len - 1];
    auto it = t.find(HashIds(ids, len));
    return it == t.end() ? nullptr : &it->second;
  }

  // log10 P(word | context) with backoff.
  float Score(const int32_t* ctx, int ctx_len, int32_t word) const {
    std::vector<int32_t> ids(ctx, ctx + ctx_len);
    ids.push_back(word);
    // longest usable context is order-1
    int start = std::max(0, static_cast<int>(ids.size()) - order);
    return ScoreRec(ids.data() + start, static_cast<int>(ids.size()) - start);
  }

  float ScoreRec(const int32_t* ids, int len) const {
    const Entry* e = Find(ids, len);
    if (e != nullptr && e->prob > KLogZero + 1.0f) return e->prob;
    if (len == 1) return e != nullptr ? e->prob : KLogZero;
    float bo = 0.0f;
    const Entry* ctx = Find(ids, len - 1);
    if (ctx != nullptr) bo = ctx->backoff;
    return bo + ScoreRec(ids + 1, len - 1);
  }

  bool HasPrefix(const std::string& prefix) const {
    auto it = std::lower_bound(sorted_words.begin(), sorted_words.end(), prefix);
    return it != sorted_words.end() &&
           it->compare(0, prefix.size(), prefix) == 0;
  }
};

NGramLM* LoadArpa(const char* path) {
  std::ifstream in(path);
  if (!in.is_open()) return nullptr;
  auto lm = new NGramLM();
  std::string line;
  // \data\ header: ngram N=count lines set the order
  while (std::getline(in, line)) {
    if (line.rfind("ngram ", 0) == 0) {
      int n = std::atoi(line.c_str() + 6);
      lm->order = std::max(lm->order, n);
    }
    if (line.find("-grams:") != std::string::npos) break;
  }
  if (lm->order == 0) { delete lm; return nullptr; }
  lm->tables.resize(lm->order);

  int cur_n = 0;
  // first "\N-grams:" line was already consumed above
  {
    size_t p = line.find("-grams:");
    if (p != std::string::npos && p >= 2) cur_n = std::atoi(line.c_str() + 1);
    if (cur_n < 0 || cur_n > lm->order) cur_n = 0;
  }
  std::vector<int32_t> ids;
  while (std::getline(in, line)) {
    if (line.empty() || line == "\r") continue;
    if (line[0] == '\\') {
      size_t p = line.find("-grams:");
      if (p != std::string::npos) {
        cur_n = std::atoi(line.c_str() + 1);
        // sections beyond the header-declared order would write out of
        // bounds (inconsistent/truncated ARPA); skip them
        if (cur_n < 1 || cur_n > lm->order) cur_n = 0;
      }
      continue;  // also skips the end marker
    }
    if (cur_n == 0) continue;
    std::istringstream ss(line);
    float prob, backoff = 0.0f;
    if (!(ss >> prob)) continue;
    ids.clear();
    std::string w;
    for (int i = 0; i < cur_n; ++i) {
      if (!(ss >> w)) break;
      auto it = lm->vocab.find(w);
      int32_t id;
      if (it == lm->vocab.end()) {
        id = static_cast<int32_t>(lm->vocab.size());
        lm->vocab.emplace(w, id);
      } else {
        id = it->second;
      }
      ids.push_back(id);
    }
    if (static_cast<int>(ids.size()) != cur_n) continue;
    if (!(ss >> backoff)) backoff = 0.0f;
    Entry e{prob, backoff};
    lm->tables[cur_n - 1][HashIds(ids.data(), cur_n)] = e;
  }
  lm->sorted_words.reserve(lm->vocab.size());
  for (const auto& kv : lm->vocab) lm->sorted_words.push_back(kv.first);
  std::sort(lm->sorted_words.begin(), lm->sorted_words.end());
  return lm;
}

}  // namespace

extern "C" {

void* ngram_load(const char* path) { return LoadArpa(path); }

void ngram_free(void* lm) { delete static_cast<NGramLM*>(lm); }

int ngram_order(void* lm) { return static_cast<NGramLM*>(lm)->order; }

int ngram_vocab_size(void* lm) {
  return static_cast<int>(static_cast<NGramLM*>(lm)->vocab.size());
}

int ngram_word_id(void* lm, const char* word) {
  return static_cast<NGramLM*>(lm)->WordId(word);
}

float ngram_score(void* lm, const int32_t* ctx, int ctx_len, int32_t word) {
  return static_cast<NGramLM*>(lm)->Score(ctx, ctx_len, word);
}

int ngram_has_prefix(void* lm, const char* prefix) {
  return static_cast<NGramLM*>(lm)->HasPrefix(prefix) ? 1 : 0;
}

}  // extern "C"
