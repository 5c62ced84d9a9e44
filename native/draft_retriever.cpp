// DraftRetriever — suffix-array retrieval store for REST-style drafting.
//
// C++ re-design of the reference's Rust/pyo3 DraftRetriever
// (reference: src/model/rest/DraftRetriever/src/lib.rs: Writer appends
// token sequences and builds a suffix array; Reader binary-searches the
// longest query-suffix match and emits ranked continuation drafts) and its
// vendored libsais SA construction (reference:
// src/model/rest/DraftRetriever/src/libsais/libsais.c).
//
// This implementation is written from scratch: suffix-array construction
// uses prefix-doubling with radix-style sorting (O(n log n) passes via
// std::sort on rank pairs — simpler than SA-IS, fast enough for datastores
// of tens of millions of tokens), and retrieval returns the top-N most
// frequent continuations of the longest matching query suffix.
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

constexpr uint64_t kMagic = 0x44524654524C4942ULL;  // "DRFTRLIB"
constexpr int32_t kSeparator = -1;  // never matches real tokens

// Prefix-doubling suffix array over int32 tokens.
std::vector<int32_t> build_suffix_array(const std::vector<int32_t>& s) {
  const int64_t n = static_cast<int64_t>(s.size());
  std::vector<int32_t> sa(n), rank(n), tmp(n);
  for (int64_t i = 0; i < n; i++) sa[i] = static_cast<int32_t>(i);
  // initial ranks: compress token values
  {
    std::vector<int32_t> order(n);
    for (int64_t i = 0; i < n; i++) order[i] = static_cast<int32_t>(i);
    std::sort(order.begin(), order.end(),
              [&](int32_t a, int32_t b) { return s[a] < s[b]; });
    int32_t r = 0;
    for (int64_t i = 0; i < n; i++) {
      if (i > 0 && s[order[i]] != s[order[i - 1]]) r++;
      rank[order[i]] = r;
    }
  }
  for (int64_t k = 1; k < n; k <<= 1) {
    auto cmp = [&](int32_t a, int32_t b) {
      if (rank[a] != rank[b]) return rank[a] < rank[b];
      int32_t ra = a + k < n ? rank[a + k] : -1;
      int32_t rb = b + k < n ? rank[b + k] : -1;
      return ra < rb;
    };
    std::sort(sa.begin(), sa.end(), cmp);
    tmp[sa[0]] = 0;
    for (int64_t i = 1; i < n; i++)
      tmp[sa[i]] = tmp[sa[i - 1]] + (cmp(sa[i - 1], sa[i]) ? 1 : 0);
    rank = tmp;
    if (rank[sa[n - 1]] == n - 1) break;
  }
  return sa;
}

struct Store {
  std::vector<int32_t> tokens;
  std::vector<int32_t> sa;
};

// lexicographic compare of store suffix at sa-position `pos` with pattern
int compare_at(const Store& st, int64_t pos, const int32_t* pat, int64_t m) {
  const int64_t n = static_cast<int64_t>(st.tokens.size());
  for (int64_t i = 0; i < m; i++) {
    if (pos + i >= n) return -1;  // store suffix shorter -> smaller
    int32_t c = st.tokens[pos + i];
    if (c < pat[i]) return -1;
    if (c > pat[i]) return 1;
  }
  return 0;  // pattern is a prefix of the suffix
}

// [lo, hi) SA range whose suffixes start with pat
std::pair<int64_t, int64_t> equal_range(const Store& st, const int32_t* pat,
                                        int64_t m) {
  const int64_t n = static_cast<int64_t>(st.sa.size());
  int64_t lo = 0, hi = n;
  // lower bound
  {
    int64_t a = 0, b = n;
    while (a < b) {
      int64_t mid = (a + b) / 2;
      if (compare_at(st, st.sa[mid], pat, m) < 0) a = mid + 1;
      else b = mid;
    }
    lo = a;
  }
  // upper bound
  {
    int64_t a = lo, b = n;
    while (a < b) {
      int64_t mid = (a + b) / 2;
      if (compare_at(st, st.sa[mid], pat, m) <= 0) a = mid + 1;
      else b = mid;
    }
    hi = a;
  }
  return {lo, hi};
}

}  // namespace

extern "C" {

struct DRWriter {
  std::vector<int32_t> tokens;
};

void* dr_writer_create() { return new DRWriter(); }

void dr_writer_append(void* w, const int32_t* tokens, int64_t n) {
  auto* wr = static_cast<DRWriter*>(w);
  wr->tokens.insert(wr->tokens.end(), tokens, tokens + n);
  wr->tokens.push_back(kSeparator);
}

int dr_writer_finalize_and_save(void* w, const char* path) {
  auto* wr = static_cast<DRWriter*>(w);
  Store st;
  st.tokens = wr->tokens;
  st.sa = build_suffix_array(st.tokens);
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint64_t magic = kMagic;
  uint64_t n = st.tokens.size();
  std::fwrite(&magic, 8, 1, f);
  std::fwrite(&n, 8, 1, f);
  std::fwrite(st.tokens.data(), 4, n, f);
  std::fwrite(st.sa.data(), 4, n, f);
  std::fclose(f);
  return 0;
}

void dr_writer_free(void* w) { delete static_cast<DRWriter*>(w); }

void* dr_reader_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  uint64_t magic = 0, n = 0;
  if (std::fread(&magic, 8, 1, f) != 1 || magic != kMagic) {
    std::fclose(f);
    return nullptr;
  }
  if (std::fread(&n, 8, 1, f) != 1) {
    std::fclose(f);
    return nullptr;
  }
  auto* st = new Store();
  st->tokens.resize(n);
  st->sa.resize(n);
  size_t r1 = std::fread(st->tokens.data(), 4, n, f);
  size_t r2 = std::fread(st->sa.data(), 4, n, f);
  std::fclose(f);
  if (r1 != n || r2 != n) {
    delete st;
    return nullptr;
  }
  return st;
}

void dr_reader_free(void* r) { delete static_cast<Store*>(r); }

int64_t dr_reader_size(void* r) {
  return static_cast<int64_t>(static_cast<Store*>(r)->tokens.size());
}

// Search: longest suffix (up to max_suffix) of `query` present in the
// store; collect continuations of length draft_len after each occurrence;
// return up to top_n continuations ranked by frequency.
// out_tokens: [top_n * draft_len]; out_lens: [top_n] actual lengths.
// Returns the number of continuations found (0 if no match).
int dr_reader_search(void* r, const int32_t* query, int64_t qlen,
                     int32_t max_suffix, int32_t draft_len, int32_t top_n,
                     int32_t* out_tokens, int32_t* out_lens,
                     int64_t* out_freqs, int32_t* out_match_len) {
  const Store& st = *static_cast<Store*>(r);
  const int64_t n = static_cast<int64_t>(st.tokens.size());
  if (n == 0 || qlen == 0) return 0;
  int64_t max_m = std::min<int64_t>(qlen, max_suffix);

  for (int64_t m = max_m; m >= 1; m--) {
    const int32_t* pat = query + (qlen - m);
    auto [lo, hi] = equal_range(st, pat, m);
    if (lo >= hi) continue;
    // collect continuations (cap scanned occurrences for worst cases)
    std::map<std::vector<int32_t>, int64_t> counts;
    const int64_t kMaxOcc = 4096;
    for (int64_t i = lo; i < hi && i - lo < kMaxOcc; i++) {
      int64_t start = st.sa[i] + m;
      std::vector<int32_t> cont;
      for (int64_t j = 0; j < draft_len && start + j < n; j++) {
        int32_t tok = st.tokens[start + j];
        if (tok == kSeparator) break;
        cont.push_back(tok);
      }
      if (!cont.empty()) counts[cont]++;
    }
    if (counts.empty()) continue;
    // rank by (frequency desc, length desc)
    std::vector<std::pair<std::vector<int32_t>, int64_t>> ranked(counts.begin(),
                                                                 counts.end());
    std::sort(ranked.begin(), ranked.end(), [](const auto& a, const auto& b) {
      if (a.second != b.second) return a.second > b.second;
      return a.first.size() > b.first.size();
    });
    int32_t emitted = 0;
    for (auto& [cont, freq] : ranked) {
      if (emitted >= top_n) break;
      out_lens[emitted] = static_cast<int32_t>(cont.size());
      out_freqs[emitted] = freq;
      std::memset(out_tokens + emitted * draft_len, 0, draft_len * 4);
      std::memcpy(out_tokens + emitted * draft_len, cont.data(),
                  cont.size() * 4);
      emitted++;
    }
    if (out_match_len) *out_match_len = static_cast<int32_t>(m);
    return emitted;
  }
  return 0;
}

}  // extern "C"
