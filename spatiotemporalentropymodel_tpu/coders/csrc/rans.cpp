// Native rANS entropy coder for the TPU-native STEM framework.
//
// Independent implementation of the wire format used by the reference coder
// (compressai/cpp_exts/rans/rans_interface.cpp + third_party/ryg_rans/rans64.h
// are the behavioral spec; spatiotemporalentropymodel_tpu/coders/_numpy_rans.py
// is the executable Python spec this file is cross-checked against):
//
//   * 64-bit-state rANS, normalization interval lower bound L = 2^31,
//     renormalizes by emitting 32-bit little-endian words; the encoder
//     consumes symbols in reverse and the stream is laid out
//     [state_lo, state_hi, words...] front-to-back.
//   * 16-bit probability precision. Out-of-range symbols escape into the last
//     CDF bucket, then the raw magnitude is coded in 4-bit bypass chunks:
//     a 15-capped unary-ish nibble count followed by the nibbles.
//
// Exposed as a plain C ABI (loaded via ctypes — no pybind11 dependency):
// batched array in/out, zero Python-list marshalling. Also provides an
// interleaved multi-lane container (round-robin symbol assignment, one rANS
// stream per lane) so decode parallelizes across host cores.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kPrecision = 16;
constexpr uint32_t kBypassBits = 4;
constexpr int32_t kMaxBypassVal = (1 << kBypassBits) - 1;
constexpr uint64_t kRansL = 1ull << 31;

class BackwardBuf {
 public:
  void put(uint32_t w) { words_.push_back(w); }
  // Final stream = words in reverse emission order.
  size_t nbytes() const { return words_.size() * 4; }
  void copy_reversed(uint8_t* dst) const {
    for (size_t i = 0; i < words_.size(); ++i) {
      uint32_t w = words_[words_.size() - 1 - i];
      std::memcpy(dst + 4 * i, &w, 4);
    }
  }

 private:
  std::vector<uint32_t> words_;
};

inline void enc_put(uint64_t& x, BackwardBuf& out, uint32_t start,
                    uint32_t freq) {
  const uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
  if (x >= x_max) {
    out.put(static_cast<uint32_t>(x));
    x >>= 32;
  }
  x = ((x / freq) << kPrecision) + (x % freq) + start;
}

inline void enc_put_bits(uint64_t& x, BackwardBuf& out, uint32_t val,
                         uint32_t nbits) {
  const uint32_t freq = 1u << (16 - nbits);
  const uint64_t x_max = ((kRansL >> 16) << 32) * freq;
  if (x >= x_max) {
    out.put(static_cast<uint32_t>(x));
    x >>= 32;
  }
  x = (x << nbits) | val;
}

// Direct reverse-order encoder: no symbol buffering. Iterates the input
// backwards and, within each escaped symbol, emits the bypass tokens in the
// exact reverse of the forward emission order ([escape, count tokens,
// nibbles] forward → nibbles high-to-low, count tokens last-to-first, escape)
// so the stream is bit-identical to the buffered path.
void encode_direct(const int32_t* symbols, const int32_t* indexes, int64_t n,
                   const int32_t* cdfs, int32_t cols, const int32_t* cdf_sizes,
                   const int32_t* offsets, int64_t lane, int64_t stride,
                   BackwardBuf& out) {
  uint64_t x = kRansL;
  // last index of this lane
  int64_t start_i = -1;
  for (int64_t i = lane; i < n; i += stride) start_i = i;
  for (int64_t i = start_i; i >= lane; i -= stride) {
    const int32_t cdf_idx = indexes[i];
    const int32_t* cdf = cdfs + static_cast<int64_t>(cdf_idx) * cols;
    const int32_t max_value = cdf_sizes[cdf_idx] - 2;
    int32_t value = symbols[i] - offsets[cdf_idx];

    uint64_t raw_val = 0;
    bool escaped = false;
    if (value < 0) {
      raw_val = static_cast<uint64_t>(-2ll * value - 1);
      value = max_value;
      escaped = true;
    } else if (value >= max_value) {
      raw_val = static_cast<uint64_t>(2ll * (value - max_value));
      value = max_value;
      escaped = true;
    }

    if (escaped) {
      int32_t n_bypass = 0;
      while ((raw_val >> (n_bypass * kBypassBits)) != 0) ++n_bypass;
      // nibbles, highest chunk first (reverse of forward j = 0..n-1)
      for (int32_t j = n_bypass - 1; j >= 0; --j) {
        enc_put_bits(
            x, out,
            static_cast<uint32_t>((raw_val >> (j * kBypassBits)) &
                                  kMaxBypassVal),
            kBypassBits);
      }
      // count tokens: forward emits (15 × k, rem); reverse emits rem, 15 × k
      int32_t v = n_bypass;
      enc_put_bits(x, out, static_cast<uint32_t>(v % kMaxBypassVal),
                   kBypassBits);
      for (int32_t k = v / kMaxBypassVal; k > 0; --k) {
        enc_put_bits(x, out, static_cast<uint32_t>(kMaxBypassVal),
                     kBypassBits);
      }
    }
    enc_put(x, out, cdf[value],
            static_cast<uint32_t>(cdf[value + 1] - cdf[value]));
  }
  out.put(static_cast<uint32_t>(x >> 32));
  out.put(static_cast<uint32_t>(x));
}

// ---- decoder core -------------------------------------------------------

class ForwardReader {
 public:
  ForwardReader(const uint8_t* data, int64_t nbytes)
      : data_(data), end_(data + nbytes) {}
  uint32_t get() {
    uint32_t w = 0;
    if (data_ + 4 <= end_) {
      std::memcpy(&w, data_, 4);
      data_ += 4;
    }
    return w;
  }

 private:
  const uint8_t* data_;
  const uint8_t* end_;
};

struct DecState {
  uint64_t x;
  ForwardReader rd;
  DecState(const uint8_t* data, int64_t nbytes) : x(0), rd(data, nbytes) {
    const uint64_t lo = rd.get();
    const uint64_t hi = rd.get();
    x = lo | (hi << 32);
  }
  uint32_t get_bits(uint32_t nbits) {
    const uint32_t val = static_cast<uint32_t>(x & ((1u << nbits) - 1));
    x >>= nbits;
    if (x < kRansL) x = (x << 32) | rd.get();
    return val;
  }
  void advance(uint32_t start, uint32_t freq) {
    const uint64_t mask = (1ull << kPrecision) - 1;
    x = freq * (x >> kPrecision) + (x & mask) - start;
    if (x < kRansL) x = (x << 32) | rd.get();
  }
};

// lut: optional (rows, 1<<precision) int16 direct symbol-lookup table
// (lut[row][cum_freq] = symbol index); falls back to binary search when null.
// dom: optional (rows, 3) int32 per-row dominant-symbol shortcut
// {symbol, cdf[symbol], cdf[symbol+1]} — at production rates one symbol per
// row carries almost all mass, and this 12-byte check (hot in L1) skips the
// random access into the multi-MB LUT for the overwhelming majority of
// symbols.
void decode_lane(DecState& st, const int32_t* indexes, int64_t n,
                 const int32_t* cdfs, int32_t cols, const int32_t* cdf_sizes,
                 const int32_t* offsets, int64_t lane, int64_t stride,
                 int32_t* out, const int16_t* lut = nullptr,
                 const int32_t* dom = nullptr) {
  for (int64_t i = lane; i < n; i += stride) {
    const int32_t cdf_idx = indexes[i];
    const int32_t* cdf = cdfs + static_cast<int64_t>(cdf_idx) * cols;
    const int32_t size = cdf_sizes[cdf_idx];
    const int32_t max_value = size - 2;

    const uint32_t cum = static_cast<uint32_t>(st.x & ((1u << kPrecision) - 1));
    int32_t value;
    if (dom != nullptr &&
        static_cast<int32_t>(cum) >= dom[cdf_idx * 3 + 1] &&
        static_cast<int32_t>(cum) < dom[cdf_idx * 3 + 2]) {
      value = dom[cdf_idx * 3];
    } else if (lut != nullptr) {
      value = lut[(static_cast<int64_t>(cdf_idx) << kPrecision) + cum];
    } else {
      // binary search: last s with cdf[s] <= cum (cdf strictly increasing)
      const int32_t* it = std::upper_bound(cdf, cdf + size,
                                           static_cast<int32_t>(cum));
      value = static_cast<int32_t>(it - cdf) - 1;
    }
    st.advance(cdf[value], cdf[value + 1] - cdf[value]);

    if (value == max_value) {
      uint32_t val = st.get_bits(kBypassBits);
      uint32_t n_bypass = val;
      while (val == static_cast<uint32_t>(kMaxBypassVal)) {
        val = st.get_bits(kBypassBits);
        n_bypass += val;
      }
      uint32_t raw_val = 0;
      for (uint32_t j = 0; j < n_bypass; ++j) {
        raw_val |= st.get_bits(kBypassBits) << (j * kBypassBits);
      }
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1) {
        value = -value - 1;
      } else {
        value += max_value;
      }
    }
    out[i] = value + offsets[cdf_idx];
  }
}

}  // namespace

extern "C" {

// ---- CDF quantizer (behavioral spec: ops.cpp:24-81 / cdf.py) -------------

int stem_pmf_to_quantized_cdf(const double* pmf, int32_t n, int32_t precision,
                              int32_t* out /* n+1 */) {
  const int64_t scale = 1ll << precision;
  std::vector<int64_t> cdf(n + 1);
  cdf[0] = 0;
  for (int32_t i = 0; i < n; ++i) {
    // round half away from zero, like std::round
    const double v = pmf[i] * static_cast<double>(scale);
    cdf[i + 1] = static_cast<int64_t>(v + 0.5);
  }
  int64_t total = 0;
  for (auto c : cdf) total += c;
  if (total <= 0) return -1;
  for (auto& c : cdf) c = (scale * c) / total;
  for (int32_t i = 1; i <= n; ++i) cdf[i] += cdf[i - 1];
  cdf[n] = scale;

  for (int32_t i = 0; i < n; ++i) {
    if (cdf[i] == cdf[i + 1]) {
      int64_t best_freq = INT64_MAX;
      int32_t best_steal = -1;
      for (int32_t j = 0; j < n; ++j) {
        const int64_t freq = cdf[j + 1] - cdf[j];
        if (freq > 1 && freq < best_freq) {
          best_freq = freq;
          best_steal = j;
        }
      }
      if (best_steal < 0) return -2;
      if (best_steal < i) {
        for (int32_t j = best_steal + 1; j <= i; ++j) cdf[j]--;
      } else {
        for (int32_t j = i + 1; j <= best_steal; ++j) cdf[j]++;
      }
    }
  }
  for (int32_t i = 0; i <= n; ++i) out[i] = static_cast<int32_t>(cdf[i]);
  return 0;
}

// ---- single-stream (reference-format) ------------------------------------

// Returns bytes written, or -(bytes needed) if out_cap is too small.
int64_t stem_encode_with_indexes(const int32_t* symbols, const int32_t* indexes,
                                 int64_t n, const int32_t* cdfs, int32_t rows,
                                 int32_t cols, const int32_t* cdf_sizes,
                                 const int32_t* offsets, uint8_t* out,
                                 int64_t out_cap) {
  (void)rows;
  BackwardBuf buf;
  encode_direct(symbols, indexes, n, cdfs, cols, cdf_sizes, offsets, 0, 1,
                buf);
  const int64_t nbytes = static_cast<int64_t>(buf.nbytes());
  if (nbytes > out_cap) return -nbytes;
  buf.copy_reversed(out);
  return nbytes;
}

int stem_decode_with_indexes(const uint8_t* data, int64_t nbytes,
                             const int32_t* indexes, int64_t n,
                             const int32_t* cdfs, int32_t rows, int32_t cols,
                             const int32_t* cdf_sizes, const int32_t* offsets,
                             int32_t* out) {
  (void)rows;
  DecState st(data, nbytes);
  decode_lane(st, indexes, n, cdfs, cols, cdf_sizes, offsets, 0, 1, out);
  return 0;
}

int stem_decode_with_indexes_lut(const uint8_t* data, int64_t nbytes,
                                 const int32_t* indexes, int64_t n,
                                 const int32_t* cdfs, int32_t rows,
                                 int32_t cols, const int32_t* cdf_sizes,
                                 const int32_t* offsets, const int16_t* lut,
                                 const int32_t* dom, int32_t* out) {
  (void)rows;
  DecState st(data, nbytes);
  decode_lane(st, indexes, n, cdfs, cols, cdf_sizes, offsets, 0, 1, out, lut,
              dom);
  return 0;
}

// Build the direct-lookup table: lut[row][cum] = symbol index with
// cdf[sym] <= cum < cdf[sym+1]. One-time cost per table set.
void stem_build_lut(const int32_t* cdfs, int32_t rows, int32_t cols,
                    const int32_t* cdf_sizes, int16_t* lut /*rows<<16*/) {
  const int64_t span = 1ll << kPrecision;
  for (int32_t r = 0; r < rows; ++r) {
    const int32_t* cdf = cdfs + static_cast<int64_t>(r) * cols;
    int16_t* row = lut + static_cast<int64_t>(r) * span;
    const int32_t size = cdf_sizes[r];
    for (int32_t s = 0; s + 1 < size; ++s) {
      for (int32_t c = cdf[s]; c < cdf[s + 1]; ++c) {
        row[c] = static_cast<int16_t>(s);
      }
    }
  }
}

// Per-row dominant-symbol shortcut table: {argmax-freq symbol, its cdf
// start, its cdf end} per row (see decode_lane's `dom` fast path).
void stem_build_dom(const int32_t* cdfs, int32_t rows, int32_t cols,
                    const int32_t* cdf_sizes, int32_t* dom /*rows*3*/) {
  for (int32_t r = 0; r < rows; ++r) {
    const int32_t* cdf = cdfs + static_cast<int64_t>(r) * cols;
    const int32_t size = cdf_sizes[r];
    int32_t best = 0, best_freq = -1;
    for (int32_t s = 0; s + 1 < size; ++s) {
      const int32_t f = cdf[s + 1] - cdf[s];
      if (f > best_freq) {
        best_freq = f;
        best = s;
      }
    }
    // (the escape bucket is a valid shortcut too: decode_lane's bypass
    // handling keys off the VALUE, not the lookup method)
    dom[r * 3 + 0] = best;
    dom[r * 3 + 1] = cdf[best];
    dom[r * 3 + 2] = cdf[best + 1];
  }
}

// ---- stateful stream decoder (for autoregressive decode) -----------------

struct StreamDec {
  std::vector<uint8_t> data;
  DecState st;
  StreamDec(const uint8_t* d, int64_t nb)
      : data(d, d + nb), st(data.data(), nb) {}
};

void* stem_dec_create(const uint8_t* data, int64_t nbytes) {
  return new StreamDec(data, nbytes);
}

void stem_dec_destroy(void* h) { delete static_cast<StreamDec*>(h); }

int stem_dec_decode(void* h, const int32_t* indexes, int64_t n,
                    const int32_t* cdfs, int32_t rows, int32_t cols,
                    const int32_t* cdf_sizes, const int32_t* offsets,
                    int32_t* out) {
  (void)rows;
  StreamDec* d = static_cast<StreamDec*>(h);
  decode_lane(d->st, indexes, n, cdfs, cols, cdf_sizes, offsets, 0, 1, out);
  return 0;
}

// ---- interleaved multi-lane container -------------------------------------
//
// Layout: [u32 n_lanes][u32 payload_len[lane]...][payload lane 0][lane 1]...
// Symbol i belongs to lane (i % n_lanes). Each lane is an independent
// single-stream bitstream, so lanes encode and decode in parallel.

int64_t stem_encode_interleaved(const int32_t* symbols, const int32_t* indexes,
                                int64_t n, const int32_t* cdfs, int32_t rows,
                                int32_t cols, const int32_t* cdf_sizes,
                                const int32_t* offsets, int32_t n_lanes,
                                uint8_t* out, int64_t out_cap) {
  (void)rows;
  if (n_lanes < 1) return -1;
  std::vector<BackwardBuf> bufs(n_lanes);

  auto work = [&](int32_t lane) {
    encode_direct(symbols, indexes, n, cdfs, cols, cdf_sizes, offsets, lane,
                  n_lanes, bufs[lane]);
  };

  const unsigned hw = std::thread::hardware_concurrency();
  if (n_lanes > 1 && hw > 1) {
    std::vector<std::thread> threads;
    for (int32_t l = 0; l < n_lanes; ++l) threads.emplace_back(work, l);
    for (auto& t : threads) t.join();
  } else {
    for (int32_t l = 0; l < n_lanes; ++l) work(l);
  }

  int64_t total = 4 + 4 * static_cast<int64_t>(n_lanes);
  for (auto& b : bufs) total += static_cast<int64_t>(b.nbytes());
  if (total > out_cap) return -total;

  uint32_t lanes_u32 = static_cast<uint32_t>(n_lanes);
  std::memcpy(out, &lanes_u32, 4);
  int64_t off = 4;
  for (auto& b : bufs) {
    uint32_t len = static_cast<uint32_t>(b.nbytes());
    std::memcpy(out + off, &len, 4);
    off += 4;
  }
  for (auto& b : bufs) {
    b.copy_reversed(out + off);
    off += static_cast<int64_t>(b.nbytes());
  }
  return total;
}

int stem_decode_interleaved(const uint8_t* data, int64_t nbytes,
                            const int32_t* indexes, int64_t n,
                            const int32_t* cdfs, int32_t rows, int32_t cols,
                            const int32_t* cdf_sizes, const int32_t* offsets,
                            int32_t* out, const int16_t* lut,
                            const int32_t* dom) {
  (void)rows;
  if (nbytes < 4) return -1;
  uint32_t n_lanes = 0;
  std::memcpy(&n_lanes, data, 4);
  if (n_lanes < 1 || nbytes < 4 + 4 * static_cast<int64_t>(n_lanes)) return -1;

  std::vector<int64_t> lens(n_lanes), starts(n_lanes);
  int64_t off = 4 + 4 * static_cast<int64_t>(n_lanes);
  for (uint32_t l = 0; l < n_lanes; ++l) {
    uint32_t len = 0;
    std::memcpy(&len, data + 4 + 4 * l, 4);
    lens[l] = len;
    starts[l] = off;
    off += len;
  }
  if (off > nbytes) return -2;

  auto work = [&](uint32_t lane) {
    DecState st(data + starts[lane], lens[lane]);
    decode_lane(st, indexes, n, cdfs, cols, cdf_sizes, offsets, lane, n_lanes,
                out, lut, dom);
  };

  const unsigned hw = std::thread::hardware_concurrency();
  if (n_lanes > 1 && hw > 1) {
    std::vector<std::thread> threads;
    for (uint32_t l = 0; l < n_lanes; ++l) threads.emplace_back(work, l);
    for (auto& t : threads) t.join();
  } else {
    for (uint32_t l = 0; l < n_lanes; ++l) work(l);
  }
  return 0;
}

}  // extern "C"
