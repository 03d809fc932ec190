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
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <unordered_set>
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

// CTC prefix scoring (Graves forward recursion over the blank/label lattice)
// for C candidate extensions of one prefix — the inner loop of the joint
// CTC+AED beam (behavioral spec: decoders/joint.py CTCPrefixScorer.score,
// itself mirroring reference src/dcasr/decoders/joint.py). The T-step
// recursion is a Python-level loop in the oracle; at decode scale (T ~ 400,
// C ~ 20 per live hypothesis per step) it dominates joint_beam wall time, so
// this C++ twin reproduces it with numpy-logaddexp-compatible arithmetic
// (same max + log1p(exp(-|a-b|)) form, same a == b shortcut).
//
// logp: [T, W] row-major log-probs (W = vocab + 1, blank included);
// r_prev: [T, 2]; cand: [C] ids (clamped to W-1 for lookup; eos scores the
// prefix itself); out: log_psi [C] and r_new [C, T, 2].
static inline double lae(double a, double b) {
  if (a == b) return a + 0.6931471805599453094172321214581766;  // ln 2
  const double m = a > b ? a : b;
  const double d = a > b ? b - a : a - b;
  return m + log1p(exp(d));
}

void hmasr_ctc_prefix_score(const double* logp, int64_t T, int64_t W,
                            int64_t blank, int64_t eos, int64_t last,
                            int64_t out_len, const double* r_prev,
                            const int64_t* cand, int64_t C,
                            double* log_psi, double* r_new) {
  const double LOG_ZERO = -1e10;
  std::vector<double> r_sum(T);
  for (int64_t t = 0; t < T; ++t)
    r_sum[t] = lae(r_prev[t * 2 + 0], r_prev[t * 2 + 1]);
  const int64_t start = out_len > 1 ? out_len : 1;
  for (int64_t j = 0; j < C; ++j) {
    const int64_t c = cand[j] < W - 1 ? cand[j] : W - 1;
    const bool same = out_len > 0 && cand[j] == last;
    double* r = r_new + j * T * 2;               // [T, 2] for this candidate
    for (int64_t t = 0; t < T; ++t) {
      r[t * 2 + 0] = LOG_ZERO;
      r[t * 2 + 1] = LOG_ZERO;
    }
    if (out_len == 0) r[0] = logp[c];            // label may start at frame 0
    double psi = r[(start - 1) * 2 + 0];
    for (int64_t t = start; t < T; ++t) {
      const double phi_prev =
          same ? r_prev[(t - 1) * 2 + 1] : r_sum[t - 1];
      const double x_t = logp[t * W + c];
      r[t * 2 + 0] = lae(r[(t - 1) * 2 + 0], phi_prev) + x_t;
      r[t * 2 + 1] = lae(r[(t - 1) * 2 + 0], r[(t - 1) * 2 + 1])
                     + logp[t * W + blank];
      psi = lae(psi, phi_prev + x_t);
    }
    log_psi[j] = (cand[j] == eos) ? r_sum[T - 1] : psi;
  }
}

// Greedy BPE TRAINING over pre-segmented words (the reference trains its
// vocabulary with sentencepiece's C++ trainer — reference scripts/
// build_tokenizer.py; this is the in-repo equivalent for LM-corpus scale).
// Inputs: each unique word as a sequence of alphabet ids (syms_flat +
// offsets), its corpus frequency, and the alphabet strings (UTF-8, for the
// deterministic tie-break). Repeatedly merges the most frequent adjacent
// pair — ties broken by the lexicographically LARGEST (a, b) strings, byte
// order == code-point order under UTF-8 — until `budget` merges or the best
// pair count drops below 2. Merge k creates symbol id n_alpha + k. Writes
// (a, b) id pairs to out_pairs[2k], out_pairs[2k+1]; returns merge count.
// Exact-equivalence with the Python train_bpe is fuzz-tested.
int64_t hmasr_bpe_train(const int64_t* syms_flat, const int64_t* offsets,
                        const int64_t* freqs, int64_t n_words,
                        const uint8_t* alpha_buf, const int64_t* alpha_off,
                        int64_t n_alpha, int64_t budget, int64_t* out_pairs) {
  std::vector<std::string> syms;
  syms.reserve(n_alpha + (size_t)budget);
  syms.resize(n_alpha);
  for (int64_t i = 0; i < n_alpha; ++i)
    syms[i].assign((const char*)alpha_buf + alpha_off[i],
                   alpha_off[i + 1] - alpha_off[i]);
  std::vector<std::vector<int32_t>> words(n_words);
  for (int64_t w = 0; w < n_words; ++w) {
    words[w].assign(syms_flat + offsets[w], syms_flat + offsets[w + 1]);
  }

  auto key_of = [](int32_t a, int32_t b) -> uint64_t {
    return ((uint64_t)(uint32_t)a << 32) | (uint32_t)b;
  };
  std::unordered_map<uint64_t, int64_t> cnt;
  std::unordered_map<uint64_t, std::unordered_set<int32_t>> where;
  for (int64_t w = 0; w < n_words; ++w) {
    const auto& s = words[w];
    for (size_t i = 0; i + 1 < s.size(); ++i) {
      uint64_t k = key_of(s[i], s[i + 1]);
      cnt[k] += freqs[w];
      where[k].insert((int32_t)w);
    }
  }

  struct Entry { int64_t count; int32_t a, b; };
  auto less = [&syms](const Entry& x, const Entry& y) {
    if (x.count != y.count) return x.count < y.count;
    int c = syms[x.a].compare(syms[y.a]);
    if (c != 0) return c < 0;
    return syms[x.b].compare(syms[y.b]) < 0;
  };
  std::priority_queue<Entry, std::vector<Entry>, decltype(less)> heap(less);
  for (const auto& kv : cnt)
    heap.push({kv.second, (int32_t)(kv.first >> 32), (int32_t)kv.first});

  int64_t n_merges = 0;
  std::vector<uint64_t> touched;
  while (n_merges < budget && !heap.empty()) {
    Entry top = heap.top();
    heap.pop();
    uint64_t bk = key_of(top.a, top.b);
    auto it = cnt.find(bk);
    if (it == cnt.end() || it->second != top.count) continue;   // stale
    if (top.count < 2) break;                  // singleton merges add no value
    const int32_t A = top.a, B = top.b;
    const int32_t merged_id = (int32_t)(n_alpha + n_merges);
    out_pairs[2 * n_merges] = A;
    out_pairs[2 * n_merges + 1] = B;
    syms.push_back(syms[A] + syms[B]);
    ++n_merges;

    touched.clear();
    auto wit = where.find(bk);
    if (wit == where.end()) continue;
    std::vector<int32_t> affected(wit->second.begin(), wit->second.end());
    for (int32_t w : affected) {
      auto& s = words[w];
      const int64_t f = freqs[w];
      for (size_t i = 0; i + 1 < s.size(); ++i) {   // remove old pair counts
        uint64_t k = key_of(s[i], s[i + 1]);
        auto ci = cnt.find(k);
        if (ci != cnt.end() && (ci->second -= f) <= 0) cnt.erase(ci);
        auto pw = where.find(k);
        if (pw != where.end()) pw->second.erase(w);
        touched.push_back(k);
      }
      std::vector<int32_t> out;                      // apply merge in the word
      out.reserve(s.size());
      for (size_t i = 0; i < s.size();) {
        if (i + 1 < s.size() && s[i] == A && s[i + 1] == B) {
          out.push_back(merged_id);
          i += 2;
        } else {
          out.push_back(s[i]);
          ++i;
        }
      }
      s.swap(out);
      for (size_t i = 0; i + 1 < s.size(); ++i) {    // add new pair counts
        uint64_t k = key_of(s[i], s[i + 1]);
        cnt[k] += f;
        where[k].insert(w);
        touched.push_back(k);
      }
    }
    std::sort(touched.begin(), touched.end());       // push each once, settled
    touched.erase(std::unique(touched.begin(), touched.end()), touched.end());
    for (uint64_t k : touched) {
      auto ci = cnt.find(k);
      if (ci != cnt.end())
        heap.push({ci->second, (int32_t)(k >> 32), (int32_t)k});
    }
  }
  return n_merges;
}

}  // extern "C"

// ── FLAC decoder ─────────────────────────────────────────────────────────────
// Production-speed decoder for the FLAC subset (RFC 9639): constant /
// verbatim / fixed / LPC subframes, rice + rice2 residuals with escape
// partitions, all stereo decorrelation modes, wasted bits, CRC-8/16 verify.
// The pure-Python oracle in data/flac.py is the behavioral spec; fuzz parity
// between the two is tested in tests/test_flac.py. (The reference reads FLAC
// through soundfile's C library — reference src/dcasr/data/librispeech.py:35.)

namespace {

struct BitReader {
  const uint8_t* buf;
  int64_t nbytes;
  int64_t bitpos = 0;
  bool ok = true;

  uint64_t read(int n) {
    int64_t end = bitpos + n;
    if (((end + 7) >> 3) > nbytes) { ok = false; return 0; }
    uint64_t v = 0;
    int64_t pos = bitpos;
    int need = n;
    while (need > 0) {
      int rem = 8 - (pos & 7);
      int take = need < rem ? need : rem;
      uint8_t byte = buf[pos >> 3];
      uint8_t chunk = (byte >> (rem - take)) & ((1u << take) - 1);
      v = (v << take) | chunk;
      pos += take;
      need -= take;
    }
    bitpos = end;
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read(n);
    if (n > 0 && (v & (1ull << (n - 1)))) return (int64_t)v - (1ll << n);
    return (int64_t)v;
  }

  int64_t read_unary() {
    int64_t q = 0;
    while (ok) {
      if ((bitpos >> 3) >= nbytes) { ok = false; return 0; }
      int rem = 8 - (bitpos & 7);
      uint8_t window = buf[bitpos >> 3] & ((1u << rem) - 1);
      if (window) {
        // zeros before the leading 1: rem - bit_length(window)
        int lead = rem - (32 - __builtin_clz((unsigned)window));
        bitpos += lead + 1;
        return q + lead;
      }
      q += rem;
      bitpos += rem;
    }
    return 0;
  }

  void align() { bitpos = (bitpos + 7) & ~7ll; }
  int64_t byte_pos() const { return bitpos >> 3; }
};

uint8_t kCrc8Tab[256];
uint16_t kCrc16Tab[256];
bool kTabsInit = [] {
  for (int i = 0; i < 256; ++i) {
    uint32_t r8 = i;
    for (int b = 0; b < 8; ++b) r8 = (r8 & 0x80) ? ((r8 << 1) ^ 0x07) : (r8 << 1);
    kCrc8Tab[i] = (uint8_t)r8;
    uint32_t r16 = (uint32_t)i << 8;
    for (int b = 0; b < 8; ++b)
      r16 = (r16 & 0x8000) ? ((r16 << 1) ^ 0x8005) : (r16 << 1);
    kCrc16Tab[i] = (uint16_t)r16;
  }
  return true;
}();

uint8_t crc8(const uint8_t* p, int64_t n) {
  uint8_t c = 0;
  for (int64_t i = 0; i < n; ++i) c = kCrc8Tab[c ^ p[i]];
  return c;
}

uint16_t crc16(const uint8_t* p, int64_t n) {
  uint16_t c = 0;
  for (int64_t i = 0; i < n; ++i)
    c = kCrc16Tab[((c >> 8) ^ p[i]) & 0xFF] ^ (uint16_t)(c << 8);
  return c;
}

bool read_coded_number(BitReader& br, uint64_t* out) {
  uint64_t b0 = br.read(8);
  if (b0 < 0x80) { *out = b0; return br.ok; }
  int n_more = 0;
  uint64_t mask = 0x40;
  while (b0 & mask) { ++n_more; mask >>= 1; }
  if (n_more < 1 || n_more > 6) return false;
  uint64_t v = b0 & (mask - 1);
  for (int i = 0; i < n_more; ++i) {
    uint64_t b = br.read(8);
    if ((b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return br.ok;
}

bool decode_residual(BitReader& br, int64_t blocksize, int order,
                     int64_t* res) {
  int method = (int)br.read(2);
  if (method > 1) return false;
  int pbits = 4 + method;
  uint64_t escape = (1ull << pbits) - 1;
  int po = (int)br.read(4);
  int64_t n_part = 1ll << po;
  if (blocksize % n_part) return false;
  int64_t w = 0;
  for (int64_t p = 0; p < n_part; ++p) {
    int64_t cnt = (blocksize >> po) - (p == 0 ? order : 0);
    if (cnt < 0) return false;
    uint64_t param = br.read(pbits);
    if (param == escape) {
      int raw = (int)br.read(5);
      for (int64_t i = 0; i < cnt; ++i)
        res[w + i] = raw ? br.read_signed(raw) : 0;
    } else {
      for (int64_t i = 0; i < cnt; ++i) {
        int64_t q = br.read_unary();
        uint64_t u = ((uint64_t)q << param) | br.read((int)param);
        res[w + i] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
      }
    }
    w += cnt;
  }
  return br.ok;
}

const int kFixedCoefs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_subframe(BitReader& br, int64_t blocksize, int bps, int64_t* s,
                     std::vector<int64_t>& scratch) {
  if (br.read(1)) return false;
  int stype = (int)br.read(6);
  int wasted = 0;
  if (br.read(1)) wasted = 1 + (int)br.read_unary();
  int eff = bps - wasted;
  if (eff <= 0 || !br.ok) return false;
  if (stype == 0) {
    int64_t v = br.read_signed(eff);
    for (int64_t i = 0; i < blocksize; ++i) s[i] = v;
  } else if (stype == 1) {
    for (int64_t i = 0; i < blocksize; ++i) s[i] = br.read_signed(eff);
  } else if (stype >= 8 && stype <= 12) {
    int order = stype - 8;
    if (blocksize < order) return false;
    for (int i = 0; i < order; ++i) s[i] = br.read_signed(eff);
    scratch.resize(blocksize - order);
    if (!decode_residual(br, blocksize, order, scratch.data())) return false;
    const int* c = kFixedCoefs[order];
    for (int64_t i = order; i < blocksize; ++i) {
      int64_t acc = scratch[i - order];
      for (int j = 0; j < order; ++j) acc += (int64_t)c[j] * s[i - 1 - j];
      s[i] = acc;
    }
  } else if (stype >= 32) {
    int order = (stype & 31) + 1;
    if (blocksize < order) return false;
    for (int i = 0; i < order; ++i) s[i] = br.read_signed(eff);
    int prec = (int)br.read(4) + 1;
    if (prec == 16) return false;
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    int64_t coefs[32];
    for (int i = 0; i < order; ++i) coefs[i] = br.read_signed(prec);
    scratch.resize(blocksize - order);
    if (!decode_residual(br, blocksize, order, scratch.data())) return false;
    for (int64_t i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coefs[j] * s[i - 1 - j];
      s[i] = scratch[i - order] + (acc >> shift);
    }
  } else {
    return false;
  }
  if (wasted)
    for (int64_t i = 0; i < blocksize; ++i) s[i] <<= wasted;
  return br.ok;
}

}  // namespace

extern "C" {

// FLAC byte stream -> interleaved int32 samples. Returns samples per channel
// (>= 0) or a negative error: -1 bad magic / no STREAMINFO, -2 truncated,
// -3 unsupported/corrupt frame, -4 capacity exceeded, -5 CRC mismatch.
// info4 out: {channels, sample_rate, bps, total_samples (STREAMINFO)}.
int64_t hmasr_flac_decode(const uint8_t* data, int64_t nbytes, int32_t* out,
                          int64_t capacity, int64_t* info4) {
  if (nbytes < 42 || data[0] != 'f' || data[1] != 'L' || data[2] != 'a' ||
      data[3] != 'C')
    return -1;
  int64_t pos = 4;
  int si_channels = 0, si_bps = 0;
  int64_t si_sr = 0, si_total = 0;
  bool have_si = false;
  while (pos + 4 <= nbytes) {
    uint8_t hdr = data[pos];
    int64_t length = ((int64_t)data[pos + 1] << 16) |
                     ((int64_t)data[pos + 2] << 8) | data[pos + 3];
    if ((hdr & 0x7F) == 0 && length >= 34 && pos + 4 + 34 <= nbytes) {
      BitReader br{data + pos + 4, length};
      br.read(16); br.read(16); br.read(24); br.read(24);
      si_sr = (int64_t)br.read(20);
      si_channels = (int)br.read(3) + 1;
      si_bps = (int)br.read(5) + 1;
      si_total = (int64_t)br.read(36);
      have_si = true;
    }
    pos += 4 + length;
    if (hdr & 0x80) break;
  }
  if (!have_si || pos > nbytes) return -1;
  info4[0] = si_channels; info4[1] = si_sr; info4[2] = si_bps;
  info4[3] = si_total;

  std::vector<int64_t> ch0, ch1, scratch;
  int64_t written = 0;
  while (pos + 2 < nbytes && (si_total == 0 || written < si_total)) {
    BitReader br{data, nbytes};
    br.bitpos = pos * 8;
    if (br.read(14) != 0x3FFE) return -3;
    br.read(2);
    int bs_code = (int)br.read(4);
    int sr_code = (int)br.read(4);
    int chan = (int)br.read(4);
    int ss_code = (int)br.read(3);
    br.read(1);
    uint64_t num;
    if (!read_coded_number(br, &num)) return -3;
    int64_t blocksize;
    if (bs_code == 0) return -3;
    else if (bs_code == 1) blocksize = 192;
    else if (bs_code <= 5) blocksize = 576ll << (bs_code - 2);
    else if (bs_code == 6) blocksize = (int64_t)br.read(8) + 1;
    else if (bs_code == 7) blocksize = (int64_t)br.read(16) + 1;
    else blocksize = 256ll << (bs_code - 8);
    if (sr_code == 12) br.read(8);
    else if (sr_code == 13 || sr_code == 14) br.read(16);
    else if (sr_code == 15) return -3;
    int bps;
    switch (ss_code) {
      case 0: bps = si_bps; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -3;
    }
    if (!br.ok) return -2;
    int64_t hdr_end = br.byte_pos();
    uint64_t c8 = br.read(8);
    if (crc8(data + pos, hdr_end - pos) != c8) return -5;

    int n_ch = si_channels;
    ch0.resize(blocksize);
    ch1.resize(blocksize);
    if (chan <= 7) {
      if (chan + 1 != n_ch) return -3;
      if (!decode_subframe(br, blocksize, bps, ch0.data(), scratch)) return -3;
      for (int c = 1; c < n_ch; ++c) {
        // >2 channels: decode each into ch1 and interleave immediately below
        if (c == 1) {
          if (!decode_subframe(br, blocksize, bps, ch1.data(), scratch))
            return -3;
        } else {
          return -3;  // >2 channels unsupported (LibriSpeech is mono/stereo)
        }
      }
    } else if (chan == 8) {                 // left/side
      if (n_ch != 2) return -3;
      if (!decode_subframe(br, blocksize, bps, ch0.data(), scratch)) return -3;
      if (!decode_subframe(br, blocksize, bps + 1, ch1.data(), scratch))
        return -3;
      for (int64_t i = 0; i < blocksize; ++i) ch1[i] = ch0[i] - ch1[i];
    } else if (chan == 9) {                 // right/side
      if (n_ch != 2) return -3;
      if (!decode_subframe(br, blocksize, bps + 1, ch0.data(), scratch))
        return -3;
      if (!decode_subframe(br, blocksize, bps, ch1.data(), scratch)) return -3;
      for (int64_t i = 0; i < blocksize; ++i) ch0[i] = ch1[i] + ch0[i];
    } else if (chan == 10) {                // mid/side
      if (n_ch != 2) return -3;
      if (!decode_subframe(br, blocksize, bps, ch0.data(), scratch)) return -3;
      if (!decode_subframe(br, blocksize, bps + 1, ch1.data(), scratch))
        return -3;
      for (int64_t i = 0; i < blocksize; ++i) {
        int64_t m = (ch0[i] << 1) | (ch1[i] & 1);
        int64_t s = ch1[i];
        ch0[i] = (m + s) >> 1;
        ch1[i] = (m - s) >> 1;
      }
    } else {
      return -3;
    }
    br.align();
    int64_t crc_end = br.byte_pos();
    uint64_t c16 = br.read(16);
    if (!br.ok) return -2;
    if (crc16(data + pos, crc_end - pos) != c16) return -5;

    int64_t take = blocksize;
    if (si_total && written + take > si_total) take = si_total - written;
    if ((written + take) * n_ch > capacity) return -4;
    for (int64_t i = 0; i < take; ++i) {
      out[(written + i) * n_ch] = (int32_t)ch0[i];
      if (n_ch == 2) out[(written + i) * n_ch + 1] = (int32_t)ch1[i];
    }
    written += take;
    pos = br.byte_pos();
  }
  return written;
}

}  // extern "C"
