// aptai_tpu native runtime helpers (C++17, ctypes ABI).
//
// TPU-native replacements for the reference's native dependency components
// (SURVEY.md §2.4): the `editdistance` C++ Levenshtein used for PER
// (reference utility.py:99-104) and the flashlight-text C++ lexicon-free
// CTC beam-search decoder behind torchaudio's ctc_decoder
// (reference models/w2v2_pr.py:144-155, utility.py:448-471).
//
// Build: make -C native  (produces aptai_tpu/_native/libaptai_native.so)
// Python binding: aptai_tpu/decode/native.py (ctypes; pure-Python fallback
// with identical semantics lives in aptai_tpu/decode/beam.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Levenshtein edit distance over int32 token sequences.
// ---------------------------------------------------------------------------
int64_t aptai_edit_distance(const int32_t* a, int64_t na, const int32_t* b,
                            int64_t nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    cur[0] = i;
    for (int64_t j = 1; j <= nb; ++j) {
      const int64_t sub = prev[j - 1] + (a[i - 1] == b[j - 1] ? 0 : 1);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// ---------------------------------------------------------------------------
// Lexicon-free CTC prefix beam search (Graves-style, log-sum-exp merging).
//
// log_probs: row-major (T, V) log-softmax scores.  blank: blank id.
// beam_size / beam_threshold as in the reference decoder config
// (beam 10, threshold 50 — w2v2_pr.py:149-151).
// Outputs the best prefix (collapsed tokens) and per-token emission frames
// (first frame at which each token was committed), like flashlight's
// `timesteps`.  Returns the number of tokens written (<= max_out).
// ---------------------------------------------------------------------------

namespace {

struct Prefix {
  std::vector<int32_t> toks;
  std::vector<int32_t> times;
  double p_b;   // log prob ending in blank
  double p_nb;  // log prob ending in non-blank
};

inline double logadd(double a, double b) {
  if (a == -std::numeric_limits<double>::infinity()) return b;
  if (b == -std::numeric_limits<double>::infinity()) return a;
  const double m = std::max(a, b);
  return m + std::log1p(std::exp(std::min(a, b) - m));
}

struct VecHash {
  size_t operator()(const std::vector<int32_t>& v) const {
    size_t h = 1469598103934665603ull;
    for (int32_t x : v) {
      h ^= static_cast<size_t>(x) + 0x9e3779b97f4a7c15ull + (h << 6) + (h >> 2);
    }
    return h;
  }
};

}  // namespace

int64_t aptai_ctc_beam_search(const float* log_probs, int64_t T, int64_t V,
                              int32_t blank, int32_t beam_size,
                              float beam_threshold, int32_t* out_tokens,
                              int32_t* out_times, int64_t max_out) {
  const double NEG_INF = -std::numeric_limits<double>::infinity();
  std::vector<Prefix> beam;
  beam.push_back({{}, {}, 0.0, NEG_INF});

  // candidate top-k token shortlist per frame keeps the inner loop tight
  std::vector<int32_t> order(V);

  for (int64_t t = 0; t < T; ++t) {
    const float* row = log_probs + t * V;
    std::unordered_map<std::vector<int32_t>, Prefix, VecHash> next;
    next.reserve(beam.size() * 4);

    double best_total = NEG_INF;
    for (const Prefix& pr : beam) {
      best_total = std::max(best_total, logadd(pr.p_b, pr.p_nb));
    }

    for (const Prefix& pr : beam) {
      const double p_tot = logadd(pr.p_b, pr.p_nb);
      if (p_tot < best_total - beam_threshold) continue;

      // 1) extend with blank
      {
        auto it = next.find(pr.toks);
        if (it == next.end()) {
          Prefix np{pr.toks, pr.times, NEG_INF, NEG_INF};
          it = next.emplace(pr.toks, std::move(np)).first;
        }
        it->second.p_b = logadd(it->second.p_b, p_tot + row[blank]);
      }

      for (int32_t v = 0; v < V; ++v) {
        if (v == blank) continue;
        const double pv = row[v];
        if (pv + p_tot < best_total - beam_threshold) continue;

        const bool repeat = !pr.toks.empty() && pr.toks.back() == v;
        if (repeat) {
          // same token again without blank: stays the same prefix
          auto it = next.find(pr.toks);
          if (it == next.end()) {
            Prefix np{pr.toks, pr.times, NEG_INF, NEG_INF};
            it = next.emplace(pr.toks, std::move(np)).first;
          }
          it->second.p_nb = logadd(it->second.p_nb, pr.p_nb + pv);
          // extension after a blank creates the doubled token
          std::vector<int32_t> ext = pr.toks;
          ext.push_back(v);
          auto it2 = next.find(ext);
          if (it2 == next.end()) {
            Prefix np{ext, pr.times, NEG_INF, NEG_INF};
            np.times.push_back(static_cast<int32_t>(t));
            it2 = next.emplace(std::move(ext), std::move(np)).first;
          }
          it2->second.p_nb = logadd(it2->second.p_nb, pr.p_b + pv);
        } else {
          std::vector<int32_t> ext = pr.toks;
          ext.push_back(v);
          auto it = next.find(ext);
          if (it == next.end()) {
            Prefix np{ext, pr.times, NEG_INF, NEG_INF};
            np.times.push_back(static_cast<int32_t>(t));
            it = next.emplace(std::move(ext), std::move(np)).first;
          }
          it->second.p_nb = logadd(it->second.p_nb, p_tot + pv);
        }
      }
    }

    // prune to beam_size by total probability
    beam.clear();
    beam.reserve(next.size());
    for (auto& kv : next) beam.push_back(std::move(kv.second));
    std::sort(beam.begin(), beam.end(), [](const Prefix& a, const Prefix& b) {
      return logadd(a.p_b, a.p_nb) > logadd(b.p_b, b.p_nb);
    });
    if (static_cast<int64_t>(beam.size()) > beam_size) {
      beam.resize(beam_size);
    }
  }

  const Prefix& best = beam.front();
  const int64_t n = std::min<int64_t>(best.toks.size(), max_out);
  std::memcpy(out_tokens, best.toks.data(), n * sizeof(int32_t));
  std::memcpy(out_times, best.times.data(), n * sizeof(int32_t));
  return n;
}

}  // extern "C"
