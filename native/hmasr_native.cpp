// Native host-runtime kernels for hnet_mamba_asr_tpu.
//
// The reference leans on external C/C++ packages for its host-side hot loops
// (editdistance for validation WER, torchaudio's C++ resampler for speed
// perturbation — reference: src/dcasr/training/trainer.py:29,
// src/dcasr/data/librispeech.py:40). This library is the in-repo equivalent:
// plain C ABI, loaded via ctypes (no pybind11 in the image), with pure-Python
// fallbacks on the importing side so the framework runs anywhere.
//
// Build: make -C native      (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Plain Levenshtein distance over int64 symbol sequences (two-row DP).
int64_t hmasr_edit_distance(const int64_t* a, int64_t na,
                            const int64_t* b, int64_t nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    cur[0] = i;
    const int64_t ai = a[i - 1];
    for (int64_t j = 1; j <= nb; ++j) {
      const int64_t sub = prev[j - 1] + (ai != b[j - 1]);
      const int64_t del = prev[j] + 1;
      const int64_t ins = cur[j - 1] + 1;
      cur[j] = std::min(sub, std::min(del, ins));
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// Aligned (sub, del, ins, cor) via full DP + backtrace. The backtrace
// preference order is match > substitution > deletion > insertion, matching
// the Python scorer so S/D/I splits are identical.
void hmasr_levenshtein_counts(const int64_t* ref, int64_t nr,
                              const int64_t* hyp, int64_t nh,
                              int64_t* out4) {
  std::vector<int64_t> dp((nr + 1) * (nh + 1));
  const int64_t W = nh + 1;
  for (int64_t i = 0; i <= nr; ++i) dp[i * W] = i;
  for (int64_t j = 0; j <= nh; ++j) dp[j] = j;
  for (int64_t i = 1; i <= nr; ++i) {
    const int64_t ri = ref[i - 1];
    for (int64_t j = 1; j <= nh; ++j) {
      const int64_t sub = dp[(i - 1) * W + (j - 1)] + (ri != hyp[j - 1]);
      const int64_t del = dp[(i - 1) * W + j] + 1;
      const int64_t ins = dp[i * W + (j - 1)] + 1;
      dp[i * W + j] = std::min(sub, std::min(del, ins));
    }
  }
  int64_t i = nr, j = nh, sub = 0, del = 0, ins = 0, cor = 0;
  while (i > 0 || j > 0) {
    if (i > 0 && j > 0 && ref[i - 1] == hyp[j - 1] &&
        dp[i * W + j] == dp[(i - 1) * W + (j - 1)]) {
      ++cor; --i; --j;
    } else if (i > 0 && j > 0 && dp[i * W + j] == dp[(i - 1) * W + (j - 1)] + 1) {
      ++sub; --i; --j;
    } else if (i > 0 && dp[i * W + j] == dp[(i - 1) * W + j] + 1) {
      ++del; --i;
    } else {
      ++ins; --j;
    }
  }
  out4[0] = sub; out4[1] = del; out4[2] = ins; out4[3] = cor;
}

// Polyphase resampling: out[j] = conv(zero_stuffed(x, up), kern)[j*down + pad]
// computed sparsely (only the non-zero taps). Bit-matches the numpy
// implementation in data/audio.py (same kernel, same indexing).
void hmasr_resample_poly(const double* x, int64_t n, const double* kern,
                         int64_t nk, int64_t up, int64_t down,
                         double* out, int64_t n_out) {
  const int64_t pad = nk / 2;
  for (int64_t j = 0; j < n_out; ++j) {
    const int64_t t = j * down + pad;  // index into the full convolution
    // kernel index k must satisfy 0 <= k < nk and (t - k) % up == 0 with
    // 0 <= (t - k) / up < n
    int64_t s_lo = (t - (nk - 1) + up - 1) / up;  // ceil((t - nk + 1) / up)
    if (t - (nk - 1) <= 0) s_lo = 0;
    int64_t s_hi = t / up;                         // floor(t / up)
    if (s_hi > n - 1) s_hi = n - 1;
    double acc = 0.0;
    for (int64_t s = std::max<int64_t>(0, s_lo); s <= s_hi; ++s) {
      const int64_t k = t - s * up;
      if (k >= 0 && k < nk) acc += x[s] * kern[k];
    }
    out[j] = acc;
  }
}

// Greedy BPE word segmentation: repeatedly merge the lowest-rank adjacent
// pair. Symbols are ids in an EXTENDED table (vocab pieces + merge-result
// strings that fell outside the vocab, so intermediate merges still apply —
// exact parity with the string-based Python algorithm). The pair table is
// passed as parallel arrays sorted by key = a * mult + b for binary search.
// Negative symbols (unknown characters) never merge. Returns the output
// length; `out` must hold n elements.
int64_t hmasr_bpe_segment(const int64_t* syms_in, int64_t n,
                          const int64_t* keys, const int64_t* ranks,
                          const int64_t* merged, int64_t n_pairs,
                          int64_t mult, int64_t* out) {
  std::vector<int64_t> s(syms_in, syms_in + n);
  auto find = [&](int64_t a, int64_t b) -> int64_t {
    if (a < 0 || b < 0) return -1;
    const int64_t key = a * mult + b;
    const int64_t* it = std::lower_bound(keys, keys + n_pairs, key);
    return (it != keys + n_pairs && *it == key) ? (it - keys) : -1;
  };
  while (s.size() > 1) {
    int64_t best_rank = INT64_MAX;
    int64_t best_i = -1, best_slot = -1;
    for (size_t i = 0; i + 1 < s.size(); ++i) {
      const int64_t slot = find(s[i], s[i + 1]);
      if (slot >= 0 && ranks[slot] < best_rank) {
        best_rank = ranks[slot];
        best_i = static_cast<int64_t>(i);
        best_slot = slot;
      }
    }
    if (best_i < 0) break;
    s[best_i] = merged[best_slot];
    s.erase(s.begin() + best_i + 1);
  }
  std::copy(s.begin(), s.end(), out);
  return static_cast<int64_t>(s.size());
}

}  // extern "C"
