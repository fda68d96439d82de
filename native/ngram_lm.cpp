// Native n-gram language model with Katz backoff — the TPU-framework
// equivalent of the reference's KenLM dependency (used via pyctcdecode at
// networks/transducer.py:22-24,168-213 and loaded at inference.py:29).
//
// Loads standard ARPA files AND kenlm "format version 5" binaries in both
// PROBING (the default `build_binary` output), unquantized TRIE
// (`build_binary trie`), and quantized TRIE (`build_binary -q N -b M
// trie`) layouts, with trailing vocabulary strings;
// scoring follows the usual backoff recursion
//   P(w | ctx) = P(ctx+w)                     if the full n-gram exists
//              = backoff(ctx) + P(w | ctx[1:]) otherwise
// in log10 space (ARPA convention, same as KenLM). Exposed through a C ABI
// consumed by ctypes (rnntransducer_tpu/decode/ngram_lm.py).
//
// The probing loader targets the probing-model layout (sanity header, fixed
// params, per-order counts, murmur-hashed vocab table, unigram ProbBackoff
// array, chained-hash middle/longest probing tables, '\0'-joined trailing
// vocab strings); the trie loader walks the reversed bit-packed trie (see
// its block comment below). Quantized/array-trie variants and files without
// trailing vocabulary are refused with distinct error codes so the Python
// side can print a rebuild/ARPA hint; loaded tables are sanity-sampled
// (log10 probs must look like log-probs) so a layout mismatch fails loudly
// at load rather than silently mis-scoring.
//
// Build: g++ -O2 -shared -fPIC -o libngram_lm.so ngram_lm.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <functional>
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

uint64_t ChainHash(const int32_t* ids, int len);  // kenlm n-gram key (below)

struct NGramLM {
  int order = 0;
  bool kenlm_hashed = false;  // tables keyed by kenlm ChainHash, not HashIds
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
    uint64_t key = kenlm_hashed ? ChainHash(ids, len) : HashIds(ids, len);
    auto it = t.find(key);
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

// --------------------------------------------------------------------------
// kenlm binary (format version 5, PROBING) reader.
//
// Layout (lm/binary_format.cc, lm/vocab.cc, lm/search_hashed.hh as of the
// kenlm tree the reference's pyctcdecode wheel bundles):
//   Sanity        { char magic[ALIGN8(53)]; float 0.0f; double 1.0;
//                   uint64 SIZE_MAX }                           (80 bytes)
//   FixedWidth    { u8 order; f32 probing_multiplier; i32 model_type;
//                   u8 has_vocabulary; u32 search_version }     (20 bytes)
//   uint64 counts[order]
//   pad to 8
//   VocabHeader   { uint64 bound }                              (8 bytes)
//   VocabTable    buckets(counts[0]) x { uint64 murmur64a(word); u32 id; pad }
//   Unigrams      (counts[0] + 1) x { f32 prob; f32 backoff }
//   Middle[n=2..order-1]  buckets(counts[n-1]) x { uint64 chain; f32 p; f32 b }
//   Longest       buckets(counts[order-1]) x { uint64 chain; f32 p; pad }
//   Vocab strings '\0'-joined words in id order (iff has_vocabulary)
// where buckets(e) = max(e+1, (uint64)(probing_multiplier * e)), invalid
// table slots hold key 0, and chain(w1..wn) folds right-to-left:
//   h = wn; h = (h * 8978948897894561157) ^ ((1+w) * 17894857484156487943).

constexpr uint64_t kChainMulA = 8978948897894561157ull;
constexpr uint64_t kChainMulB = 17894857484156487943ull;

uint64_t ChainCombine(uint64_t current, uint32_t next_word) {
  return (current * kChainMulA) ^
         ((static_cast<uint64_t>(next_word) + 1) * kChainMulB);
}

uint64_t ChainHash(const int32_t* ids, int len) {
  uint64_t h = static_cast<uint64_t>(static_cast<uint32_t>(ids[len - 1]));
  for (int i = len - 2; i >= 0; --i)
    h = ChainCombine(h, static_cast<uint32_t>(ids[i]));
  return h;
}

const char kKenlmMagic[] = "mmap lm http://kheafield.com/code format version 5\n";
int g_kenlm_error = 0;  // 0 ok; see kKenlmErrors in ngram_lm.py

NGramLM* LoadKenlmTrie(const std::vector<uint8_t>& data);  // below

uint64_t KenlmBuckets(uint64_t entries, float multiplier) {
  uint64_t scaled = static_cast<uint64_t>(multiplier * static_cast<float>(entries));
  return std::max(entries + 1, scaled);
}

template <typename T>
bool ReadPod(std::ifstream& in, T* out) {
  in.read(reinterpret_cast<char*>(out), sizeof(T));
  return bool(in);
}

NGramLM* LoadKenlmProbing(const char* path) {
  g_kenlm_error = 0;
  std::ifstream in(path, std::ios::binary);
  if (!in.is_open()) { g_kenlm_error = 1; return nullptr; }

  char magic[56];
  if (!in.read(magic, sizeof(magic))) { g_kenlm_error = 2; return nullptr; }
  if (std::memcmp(magic, kKenlmMagic, sizeof(kKenlmMagic) - 1) != 0) {
    g_kenlm_error = 2;  // not a version-5 kenlm binary
    return nullptr;
  }
  float zero_f; double one_d; uint64_t max_sz;
  char pad4[4];
  if (!ReadPod(in, &zero_f) || !in.read(pad4, 4) || !ReadPod(in, &one_d) ||
      !ReadPod(in, &max_sz) || zero_f != 0.0f || one_d != 1.0 ||
      max_sz != UINT64_MAX) {
    g_kenlm_error = 3;  // sanity block mismatch (32-bit build / endianness)
    return nullptr;
  }
  unsigned char order_u8; char pad3[3];
  float multiplier; int32_t model_type; unsigned char has_vocab;
  uint32_t search_version;
  if (!ReadPod(in, &order_u8) || !in.read(pad3, 3) ||
      !ReadPod(in, &multiplier) || !ReadPod(in, &model_type) ||
      !ReadPod(in, &has_vocab) || !in.read(pad3, 3) ||
      !ReadPod(in, &search_version)) {
    g_kenlm_error = 3;
    return nullptr;
  }
  if (model_type == 2 || model_type == 3) {
    // TRIE / QUANT_TRIE: slurp + hand off to the trie reader
    if (!has_vocab) { g_kenlm_error = 5; return nullptr; }
    in.seekg(0, std::ios::beg);
    std::vector<uint8_t> data((std::istreambuf_iterator<char>(in)),
                              std::istreambuf_iterator<char>());
    return LoadKenlmTrie(data);
  }
  if (model_type == 4 || model_type == 5) {
    g_kenlm_error = 7;  // bhiksha-array tries: unsupported variants
    return nullptr;
  }
  if (model_type != 0) { g_kenlm_error = 4; return nullptr; }
  if (!has_vocab) { g_kenlm_error = 5; return nullptr; }
  int order = order_u8;
  if (order < 1 || order > 12 || !(multiplier >= 1.0f)) {
    g_kenlm_error = 3;
    return nullptr;
  }
  // upper-bound counts by what the file could physically hold (16-byte
  // table entries): a corrupt header must fail here, not as a bad_alloc
  in.seekg(0, std::ios::end);
  uint64_t file_size = static_cast<uint64_t>(in.tellg());
  in.seekg(80 + 20, std::ios::beg);
  std::vector<uint64_t> counts(order);
  uint64_t payload = 0;
  for (int n = 0; n < order; ++n) {
    if (!ReadPod(in, &counts[n]) || counts[n] == 0 ||
        counts[n] > file_size / 8) {
      g_kenlm_error = 3;
      return nullptr;
    }
    payload += KenlmBuckets(counts[n], multiplier) * 16;  // lower bound
  }
  if (payload > file_size) { g_kenlm_error = 3; return nullptr; }
  // header is padded to 8 bytes: 80 + 20 + 8*order -> skip 4
  uint64_t header = 80 + 20 + 8 * static_cast<uint64_t>(order);
  if (header % 8) in.seekg((8 - header % 8), std::ios::cur);

  auto lm = new NGramLM();
  lm->order = order;
  lm->kenlm_hashed = true;
  lm->tables.resize(order);

  // vocab probing table: skip (ids are recovered from the trailing strings,
  // which are authoritative and also give us prefix queries)
  uint64_t vocab_bound;
  if (!ReadPod(in, &vocab_bound)) { g_kenlm_error = 3; delete lm; return nullptr; }
  uint64_t vbuckets = KenlmBuckets(counts[0], multiplier);
  in.seekg(static_cast<std::streamoff>(vbuckets * 16), std::ios::cur);

  // unigrams, indexed by word id
  std::vector<Entry> unigrams(counts[0] + 1);
  for (uint64_t i = 0; i < counts[0] + 1; ++i) {
    float pb[2];
    if (!ReadPod(in, &pb)) { g_kenlm_error = 3; delete lm; return nullptr; }
    unigrams[i] = Entry{pb[0], pb[1]};
  }

  // middle + longest probing tables -> per-order chain-hash maps
  for (int n = 2; n <= order; ++n) {
    bool longest = (n == order);
    uint64_t buckets = KenlmBuckets(counts[n - 1], multiplier);
    auto& table = lm->tables[n - 1];
    table.reserve(counts[n - 1] * 2);
    for (uint64_t b = 0; b < buckets; ++b) {
      uint64_t key; float prob, backoff = 0.0f;
      if (!ReadPod(in, &key) || !ReadPod(in, &prob) ||
          (!longest && !ReadPod(in, &backoff)) ||
          (longest && !in.read(pad4, 4))) {
        g_kenlm_error = 3; delete lm; return nullptr;
      }
      if (key == 0) continue;  // empty slot
      table.emplace(key, Entry{prob, backoff});
    }
    if (table.size() != counts[n - 1]) {
      g_kenlm_error = 6;  // slot count mismatch -> layout drift
      delete lm; return nullptr;
    }
  }

  // trailing vocabulary strings, '\0'-joined, id order, starting with <unk>
  std::string words((std::istreambuf_iterator<char>(in)),
                    std::istreambuf_iterator<char>());
  size_t pos = 0;
  int32_t id = 0;
  while (pos < words.size() && id < static_cast<int32_t>(counts[0])) {
    size_t nul = words.find('\0', pos);
    if (nul == std::string::npos) nul = words.size();
    lm->vocab.emplace(words.substr(pos, nul - pos), id++);
    pos = nul + 1;
  }
  if (lm->vocab.size() != counts[0] ||
      lm->vocab.count("<unk>") == 0 || lm->vocab.at("<unk>") != 0) {
    g_kenlm_error = 5;  // vocab strings missing/truncated
    delete lm; return nullptr;
  }

  // unigram array -> tables[0] keyed the same way Find() will query
  for (const auto& kv : lm->vocab) {
    int32_t wid = kv.second;
    lm->tables[0][static_cast<uint64_t>(static_cast<uint32_t>(wid))] =
        unigrams[wid];
  }

  // layout-drift tripwire: sampled probs must look like log10-probs
  int sampled = 0, plausible = 0;
  for (int n = 0; n < order; ++n)
    for (const auto& kv : lm->tables[n]) {
      float p = kv.second.prob;
      ++sampled;
      if (std::isfinite(p) && p > -100.0f && p < 1.0f) ++plausible;
      if (sampled >= 4096) break;
    }
  if (plausible < sampled * 9 / 10) {
    g_kenlm_error = 6;
    delete lm; return nullptr;
  }

  lm->sorted_words.reserve(lm->vocab.size());
  for (const auto& kv : lm->vocab) lm->sorted_words.push_back(kv.first);
  std::sort(lm->sorted_words.begin(), lm->sorted_words.end());
  return lm;
}

// --------------------------------------------------------------------------
// kenlm TRIE binaries, non-bhiksha: model_type 2 (unquantized, the
// default `build_binary trie` output) and model_type 3 (QUANT_TRIE,
// `build_binary -q N -b M trie` — SeparatelyQuantize bin tables between
// the vocab hashes and the unigram; middle/longest probs+backoffs store
// bin indices).  Layout per lm/{trie,search_trie,vocab,quantize}.hh
// (spec mirrored by the writer in rnntransducer_tpu/utils/kenlm_binary.py):
//
//   header (as probing, model_type=2)
//   SortedVocab  uint64 n_hashes + sorted murmur hashes (skipped here: the
//                trailing strings are authoritative; the section size is
//                PROBED against the unigram invariants below, so a layout
//                variant fails loudly instead of mis-reading)
//   Unigram      (counts[0]+2) x { f32 prob; f32 backoff; u64 next }
//   Middle[k]    8-byte DontBhiksha block (probed: 8 then 0), then
//                (counts[k-1]+1) bit-packed records of
//                word(RequiredBits(counts[0])) | prob31 | backoff32 |
//                next(RequiredBits(counts[k])), LSB-first, + 8 guard bytes
//   Longest      (counts[order-1]+1) x word | prob31 + 8 guard bytes
//   strings      '\0'-joined words in id order
//
// The trie is REVERSED (kenlm extend-left): the path for n-gram (w1..wn)
// is [wn, .., w1].  We DFS it once into the same per-order chain-hash
// tables the probing loader fills, so scoring/backoff/prefix machinery is
// shared.  prob31 = float bits with the always-set sign bit dropped.

uint8_t RequiredBits(uint64_t max_value) {
  if (!max_value) return 0;
  uint8_t ret = 1;
  while (max_value >>= 1) ++ret;
  return ret;
}

uint64_t ReadBitsLE(const uint8_t* base, uint64_t bit_off, uint8_t bits) {
  uint64_t word;
  std::memcpy(&word, base + (bit_off >> 3), 8);
  uint64_t mask = (bits >= 64) ? ~0ull : ((1ull << bits) - 1ull);
  return (word >> (bit_off & 7)) & mask;
}

float Prob31ToFloat(uint32_t bits31) {
  uint32_t u = bits31 | 0x80000000u;  // probs are <= 0: sign bit restored
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

float Bits32ToFloat(uint32_t b) {
  float f;
  std::memcpy(&f, &b, 4);
  return f;
}

struct TrieLevel {
  std::vector<uint32_t> word;
  std::vector<float> prob;
  std::vector<float> backoff;
  std::vector<uint64_t> next;
};

bool PlausibleLogProb(float p) {
  return std::isfinite(p) && p > -100.0f && p < 1.0f;
}

NGramLM* LoadKenlmTrie(const std::vector<uint8_t>& data) {
  if (data.size() < 120) { g_kenlm_error = 3; return nullptr; }
  int order = data[80];
  int32_t model_type;
  std::memcpy(&model_type, data.data() + 88, 4);
  const bool quantized = model_type == 3;
  uint64_t file_size = data.size();
  if (order < 2 || order > 12) { g_kenlm_error = 3; return nullptr; }
  std::vector<uint64_t> counts(order);
  std::memcpy(counts.data(), data.data() + 100, 8 * order);
  for (int n = 0; n < order; ++n)
    if (counts[n] == 0 || counts[n] > file_size) {
      g_kenlm_error = 3;
      return nullptr;
    }
  uint64_t header = 100 + 8 * static_cast<uint64_t>(order);
  header += (8 - header % 8) % 8;
  uint64_t c0 = counts[0];

  // probe the SortedVocab section size: validate the unigram block that
  // must follow it (monotone next pointers ending exactly at counts[1],
  // plausible log-probs).  QUANT_TRIE interposes its quantization tables
  // { version, prob_bits, backoff_bits, 5 pad } + per-order float tables
  // between the hashes and the unigram; the bit widths are read from the
  // probed position and validated the same way, so a layout deviation
  // fails loudly (error 6) instead of mis-scoring.
  const uint64_t cand[] = {8 + 8 * (c0 - 1), 8 + 8 * c0, 8 * c0,
                           8 * (c0 + 1), 8 * (c0 - 1)};
  uint64_t uni_off = 0, quant_off = 0;
  uint8_t q_prob_bits = 0, q_backoff_bits = 0;
  bool found = false;
  for (uint64_t vs : cand) {
    uint64_t off = header + vs;
    uint64_t qoff = 0;
    uint8_t pbits = 0, bbits = 0;
    if (quantized) {
      qoff = off;
      if (qoff + 8 > file_size) continue;
      uint8_t ver = data[qoff];
      pbits = data[qoff + 1];
      bbits = data[qoff + 2];
      if (ver != 2 || pbits < 1 || pbits > 25 || bbits < 2 || bbits > 25)
        continue;
      uint64_t tables = (static_cast<uint64_t>(order) - 2) *
                            ((1ull << pbits) + (1ull << bbits)) +
                        (1ull << pbits);
      off = qoff + 8 + 4 * tables;
    }
    if (off + (c0 + 2) * 16 > file_size) continue;
    bool ok = true;
    uint64_t prev = 0;
    for (uint64_t i = 0; i <= c0 && ok; ++i) {
      float pb[2];
      uint64_t nx;
      std::memcpy(pb, data.data() + off + 16 * i, 8);
      std::memcpy(&nx, data.data() + off + 16 * i + 8, 8);
      if (i == 0 && nx != 0) ok = false;
      if (nx < prev || nx > counts[1]) ok = false;
      if (i < c0 && !(PlausibleLogProb(pb[0]) || pb[0] <= -99.0f)) ok = false;
      prev = nx;
    }
    uint64_t fin;
    std::memcpy(&fin, data.data() + off + 16 * c0 + 8, 8);
    if (ok && fin == counts[1]) {
      uni_off = off;
      quant_off = qoff;
      q_prob_bits = pbits;
      q_backoff_bits = bbits;
      found = true;
      break;
    }
  }
  if (!found) { g_kenlm_error = quantized ? 8 : 6; return nullptr; }

  // quantization bin tables: per middle order a prob table (2^pb floats)
  // + backoff table (2^bb), then the longest order's prob table
  std::vector<std::vector<float>> q_prob(order + 1), q_backoff(order + 1);
  if (quantized) {
    uint64_t t = quant_off + 8;
    for (int k = 2; k <= order; ++k) {
      q_prob[k].resize(1ull << q_prob_bits);
      std::memcpy(q_prob[k].data(), data.data() + t, 4 * q_prob[k].size());
      t += 4 * q_prob[k].size();
      if (k < order) {
        q_backoff[k].resize(1ull << q_backoff_bits);
        std::memcpy(q_backoff[k].data(), data.data() + t,
                    4 * q_backoff[k].size());
        t += 4 * q_backoff[k].size();
      }
    }
  }

  auto lm = new NGramLM();
  lm->order = order;
  lm->kenlm_hashed = true;
  lm->tables.resize(order);

  std::vector<float> uni_prob(c0), uni_backoff(c0);
  std::vector<uint64_t> uni_next(c0 + 1);
  for (uint64_t i = 0; i < c0; ++i) {
    float pb[2];
    std::memcpy(pb, data.data() + uni_off + 16 * i, 8);
    uni_prob[i] = pb[0];
    uni_backoff[i] = pb[1];
    std::memcpy(&uni_next[i], data.data() + uni_off + 16 * i + 8, 8);
  }
  std::memcpy(&uni_next[c0], data.data() + uni_off + 16 * c0 + 8, 8);

  uint64_t off = uni_off + (c0 + 2) * 16;
  uint8_t word_bits = RequiredBits(c0);
  std::vector<TrieLevel> levels(order + 1);  // levels[2..order]
  for (int k = 2; k <= order; ++k) {
    bool longest = (k == order);
    uint64_t entries = counts[k - 1];
    uint8_t next_bits = longest ? 0 : RequiredBits(counts[k]);
    // quantized middle record: word | backoff_idx | prob_idx | next
    // (backoff in the LOW bits of the quant field); longest: word |
    // prob_idx.  Unquantized: word | prob31 | backoff32 | next.
    uint8_t prob_field = quantized ? q_prob_bits : 31;
    uint8_t backoff_field = longest ? 0 : (quantized ? q_backoff_bits : 32);
    uint8_t total_bits = longest
                             ? word_bits + prob_field
                             : word_bits + backoff_field + prob_field +
                                   next_bits;
    uint64_t rec_bytes = ((entries + 1) * total_bits + 7) / 8 + 8;
    uint64_t level_off = 0;
    bool ok = false;
    if (longest) {
      // Longest has no next pointers, hence no bhiksha block
      ok = off + rec_bytes <= file_size;
      level_off = off;
    } else {
      // DontBhiksha writes an 8-byte block before the records; probe 8
      // then 0 so a variant without it still loads (validated by the
      // final next pointer)
      for (uint64_t skip : {8ull, 0ull}) {
        uint64_t o = off + skip;
        if (o + rec_bytes > file_size) continue;
        uint64_t fin = ReadBitsLE(
            data.data() + o,
            entries * total_bits + total_bits - next_bits, next_bits);
        if (fin != counts[k]) continue;
        level_off = o;
        ok = true;
        break;
      }
    }
    if (!ok) { g_kenlm_error = quantized ? 8 : 6; delete lm; return nullptr; }
    TrieLevel& L = levels[k];
    L.word.resize(entries);
    L.prob.resize(entries);
    if (!longest) {
      L.backoff.resize(entries);
      L.next.resize(entries);
    }
    const uint8_t* base = data.data() + level_off;
    for (uint64_t i = 0; i < entries; ++i) {
      uint64_t b = i * total_bits;
      uint64_t w = ReadBitsLE(base, b, word_bits);
      if (w >= c0) { g_kenlm_error = 6; delete lm; return nullptr; }
      L.word[i] = static_cast<uint32_t>(w);
      if (quantized) {
        if (longest) {
          L.prob[i] = q_prob[k][ReadBitsLE(base, b + word_bits,
                                           q_prob_bits)];
        } else {
          L.backoff[i] = q_backoff[k][ReadBitsLE(base, b + word_bits,
                                                 q_backoff_bits)];
          L.prob[i] = q_prob[k][ReadBitsLE(
              base, b + word_bits + q_backoff_bits, q_prob_bits)];
          L.next[i] = ReadBitsLE(
              base, b + word_bits + q_backoff_bits + q_prob_bits,
              next_bits);
        }
      } else {
        L.prob[i] = Prob31ToFloat(
            static_cast<uint32_t>(ReadBitsLE(base, b + word_bits, 31)));
        if (!longest) {
          L.backoff[i] = Bits32ToFloat(static_cast<uint32_t>(
              ReadBitsLE(base, b + word_bits + 31, 32)));
          L.next[i] = ReadBitsLE(base, b + word_bits + 63, next_bits);
        }
      }
    }
    off = level_off + rec_bytes;
  }

  // trailing vocabulary strings, '\0'-joined, id order, <unk> first
  std::string words(reinterpret_cast<const char*>(data.data() + off),
                    data.size() - off);
  size_t pos = 0;
  int32_t id = 0;
  while (pos < words.size() && id < static_cast<int32_t>(c0)) {
    size_t nul = words.find('\0', pos);
    if (nul == std::string::npos) nul = words.size();
    lm->vocab.emplace(words.substr(pos, nul - pos), id++);
    pos = nul + 1;
  }
  if (lm->vocab.size() != c0 || lm->vocab.count("<unk>") == 0 ||
      lm->vocab.at("<unk>") != 0) {
    g_kenlm_error = 5;
    delete lm;
    return nullptr;
  }

  // DFS the reversed trie into the per-order chain-hash tables
  for (uint64_t w = 0; w < c0; ++w) {
    int32_t id1 = static_cast<int32_t>(w);
    lm->tables[0][ChainHash(&id1, 1)] = Entry{uni_prob[w], uni_backoff[w]};
  }

  std::vector<int32_t> rev;  // trie path, predicted word first
  std::function<void(int, uint64_t, uint64_t)> walk =
      [&](int level, uint64_t begin, uint64_t end) {
        const TrieLevel& L = levels[level];
        for (uint64_t i = begin; i < end; ++i) {
          rev.push_back(static_cast<int32_t>(L.word[i]));
          std::vector<int32_t> nat(rev.rbegin(), rev.rend());
          float bo = (level < order) ? L.backoff[i] : 0.0f;
          lm->tables[level - 1][ChainHash(
              nat.data(), static_cast<int>(nat.size()))] =
              Entry{L.prob[i], bo};
          if (level < order) {
            uint64_t e = (i + 1 < counts[level - 1])
                             ? levels[level].next[i + 1]
                             : counts[level];
            walk(level + 1, L.next[i], e);
          }
          rev.pop_back();
        }
      };
  for (uint64_t w = 0; w < c0; ++w) {
    rev.clear();
    rev.push_back(static_cast<int32_t>(w));
    walk(2, uni_next[w], uni_next[w + 1]);
  }

  // layout-drift tripwire (same as the probing loader)
  int sampled = 0, plausible = 0;
  for (int n = 0; n < order; ++n)
    for (const auto& kv : lm->tables[n]) {
      ++sampled;
      if (PlausibleLogProb(kv.second.prob) || kv.second.prob <= -99.0f)
        ++plausible;
      if (sampled >= 4096) break;
    }
  if (plausible < sampled * 9 / 10) {
    g_kenlm_error = 6;
    delete lm;
    return nullptr;
  }

  lm->sorted_words.reserve(lm->vocab.size());
  for (const auto& kv : lm->vocab) lm->sorted_words.push_back(kv.first);
  std::sort(lm->sorted_words.begin(), lm->sorted_words.end());
  return lm;
}

bool IsKenlmBinary(const char* path) {
  std::ifstream in(path, std::ios::binary);
  char buf[8] = {0};
  if (!in.read(buf, 8)) return false;
  return std::memcmp(buf, "mmap lm ", 8) == 0;
}

}  // namespace

extern "C" {

void* ngram_load(const char* path) {
  if (IsKenlmBinary(path)) return LoadKenlmProbing(path);
  return LoadArpa(path);
}

int ngram_kenlm_error() { return g_kenlm_error; }

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
