// Host-side rANS range codec + CDF quantization for rdoptq_tpu.
//
// TPU-native equivalent of the native entropy-coding layer the reference
// depends on via CompressAI (`compressai.ans.BufferedRansEncoder/RansDecoder`
// and `compressai._CXX.pmf_to_quantized_cdf`, used from
// task-oriented-PTQ/models/nic_cvt.py:5,452,515 and
// light-uniform-PTQ/models/tinylic.py:8,254,327). Clean-room implementation:
// 64-bit-state rANS with 32-bit renormalization, 16-bit probability
// precision, per-symbol CDF-row selection through an index array, and a
// raw-bits bypass escape for out-of-range symbols. The TPU produces
// (symbols, indexes) tensors; this codec turns them into a bitstream on the
// host — the only part of the pipeline that does not run on the device.
//
// Exposed through a plain C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kPrecision = 16;                  // probability bits
constexpr uint64_t kProbScale = 1ull << kPrecision;  // total frequency
constexpr uint64_t kRansL = 1ull << 31;              // lower renorm bound
constexpr uint32_t kChunkBits = 4;                   // bypass chunk size

struct RansEncoder {
  uint64_t state = kRansL;
  // Words are emitted LIFO; collect and reverse at flush time.
  std::vector<uint32_t> words;

  inline void put(uint32_t start, uint32_t freq) {
    uint64_t x = state;
    const uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
    if (x >= x_max) {
      words.push_back(static_cast<uint32_t>(x));
      x >>= 32;
    }
    state = ((x / freq) << kPrecision) + (x % freq) + start;
  }

  // Encode `nbits` raw bits (uniform distribution bypass).
  inline void put_bits(uint32_t bits, uint32_t nbits) {
    const uint32_t freq = 1u << (kPrecision - nbits);
    put(bits * freq, freq);
  }

  // Flush: 8-byte state header (little endian) + words in decode order.
  size_t flush(uint8_t* out, size_t capacity) const {
    const size_t nbytes = 8 + words.size() * 4;
    if (nbytes > capacity) return static_cast<size_t>(-1);
    std::memcpy(out, &state, 8);
    uint8_t* p = out + 8;
    for (size_t i = words.size(); i-- > 0;) {
      std::memcpy(p, &words[i], 4);
      p += 4;
    }
    return nbytes;
  }
};

struct RansDecoder {
  uint64_t state = 0;
  const uint8_t* ptr = nullptr;
  const uint8_t* end = nullptr;

  void init(const uint8_t* stream, size_t nbytes) {
    std::memcpy(&state, stream, 8);
    ptr = stream + 8;
    end = stream + nbytes;
  }

  inline uint32_t peek() const {
    return static_cast<uint32_t>(state & (kProbScale - 1));
  }

  inline void advance(uint32_t start, uint32_t freq) {
    uint64_t x = freq * (state >> kPrecision) + peek() - start;
    if (x < kRansL && ptr + 4 <= end) {
      uint32_t w;
      std::memcpy(&w, ptr, 4);
      ptr += 4;
      x = (x << 32) | w;
    }
    state = x;
  }

  inline uint32_t get_bits(uint32_t nbits) {
    const uint32_t freq = 1u << (kPrecision - nbits);
    const uint32_t bits = peek() >> (kPrecision - nbits);
    advance(bits * freq, freq);
    return bits;
  }
};

// -------------------------------------------------------------------------
// Bucketed CDF lookup table: decode's per-symbol binary search (the decode
// throughput bottleneck — ~9 dependent branch+load iterations per symbol)
// becomes one table load + a short forward scan. Row r maps the top
// kLutBits of the 16-bit probability value d to the largest symbol s with
// cdf[s] <= bucket_start; the scan advances while cdf[s+1] <= d (bounded
// by the symbols crossing one bucket, usually 0-2 for peaked rows).
// -------------------------------------------------------------------------

constexpr uint32_t kLutBits = 12;

struct CdfLut {
  std::vector<uint16_t> rows;  // n_rows * 2^kLutBits
};

inline uint32_t decode_symbol_lut(uint32_t d, const int32_t* cdf,
                                  const uint16_t* lut_row) {
  uint32_t s = lut_row[d >> (kPrecision - kLutBits)];
  // cdf[len-1] == 2^16 > d always, so the scan terminates in range
  while (static_cast<uint32_t>(cdf[s + 1]) <= d) ++s;
  return s;
}

inline uint32_t decode_symbol_search(uint32_t d, const int32_t* cdf,
                                     int cdf_len) {
  int lo = 0, hi = cdf_len - 1;
  while (hi - lo > 1) {
    const int mid = (lo + hi) >> 1;
    if (static_cast<uint32_t>(cdf[mid]) <= d) lo = mid; else hi = mid;
  }
  return static_cast<uint32_t>(lo);
}

// Map an escaped value to the unsigned overflow code and back.
// Escape fires when value < 0 or value >= max_value (the last CDF bin).
inline uint32_t overflow_code(int32_t value, int32_t max_value) {
  return value >= max_value ? (static_cast<uint32_t>(value - max_value) << 1)
                            : ((static_cast<uint32_t>(-value - 1) << 1) | 1u);
}

inline int32_t overflow_value(uint32_t code, int32_t max_value) {
  return (code & 1u) ? -static_cast<int32_t>(code >> 1) - 1
                     : static_cast<int32_t>(code >> 1) + max_value;
}

}  // namespace

extern "C" {

// Quantize a PMF (tail mass already appended by the caller as the final
// entry) to an integer CDF summing to 2^precision with every bin nonzero.
// `cdf` must have room for n + 1 entries. Returns 0 on success.
int rdoptq_pmf_to_quantized_cdf(const double* pmf, int n, int precision,
                                uint32_t* cdf) {
  if (n < 1 || precision < 8 || precision > 24) return -1;
  const int64_t total = 1ll << precision;
  double sum = 0.0;
  for (int i = 0; i < n; ++i) sum += pmf[i] > 0 ? pmf[i] : 0.0;
  if (sum <= 0) return -2;

  std::vector<int64_t> freq(n);
  int64_t acc = 0;
  for (int i = 0; i < n; ++i) {
    double p = pmf[i] > 0 ? pmf[i] : 0.0;
    int64_t f = static_cast<int64_t>(p / sum * total + 0.5);
    if (f < 1) f = 1;
    freq[i] = f;
    acc += f;
  }
  // Repair the total by stealing from / granting to the largest bins.
  while (acc != total) {
    if (acc > total) {
      int best = -1;
      int64_t best_f = 1;
      for (int i = 0; i < n; ++i)
        if (freq[i] > best_f) { best_f = freq[i]; best = i; }
      if (best < 0) return -3;  // cannot shrink below 1 per bin
      int64_t take = acc - total;
      if (take > freq[best] - 1) take = freq[best] - 1;
      freq[best] -= take;
      acc -= take;
    } else {
      int best = 0;
      for (int i = 1; i < n; ++i)
        if (freq[i] > freq[best]) best = i;
      freq[best] += total - acc;
      acc = total;
    }
  }
  cdf[0] = 0;
  for (int i = 0; i < n; ++i)
    cdf[i + 1] = cdf[i] + static_cast<uint32_t>(freq[i]);
  return 0;
}

// Encode `n` symbols. For symbol i, row `indexes[i]` of the CDF matrix is
// used: `cdfs` is (num_rows, cdf_stride) int32, row r valid up to
// cdf_lengths[r] entries, values offset by offsets[r]. Returns the number
// of bytes written to `out`, or -1 if `out_capacity` is too small.
long rdoptq_rans_encode(const int32_t* symbols, const int32_t* indexes,
                        long n, const int32_t* cdfs, int cdf_stride,
                        const int32_t* cdf_lengths, const int32_t* offsets,
                        uint8_t* out, long out_capacity) {
  RansEncoder enc;
  enc.words.reserve(static_cast<size_t>(n) / 2 + 16);
  // rANS is LIFO: process symbols in reverse so decode reads forward.
  for (long i = n - 1; i >= 0; --i) {
    const int32_t idx = indexes[i];
    const int32_t* cdf = cdfs + static_cast<long>(idx) * cdf_stride;
    const int32_t cdf_len = cdf_lengths[idx];
    const int32_t max_value = cdf_len - 2;
    int32_t value = symbols[i] - offsets[idx];

    uint32_t sym = static_cast<uint32_t>(value);
    bool escape = value < 0 || value >= max_value;
    if (escape) {
      // Within-symbol encode order is the reverse of decode order:
      // decode reads [escape-bin, chunk0, chunk1, ...]; push chunks
      // (reversed) first, then the escape bin.
      uint32_t code = overflow_code(value, max_value);
      uint32_t chunks[16];
      int nchunks = 0;
      do {
        chunks[nchunks++] = code & ((1u << kChunkBits) - 1);
        code >>= kChunkBits;
      } while (code != 0);
      for (int c = nchunks - 1; c >= 0; --c) {
        // continuation flag: 1 iff more chunks follow in decode order
        enc.put_bits(c < nchunks - 1 ? 1u : 0u, 1);
        enc.put_bits(chunks[c], kChunkBits);
      }
      sym = static_cast<uint32_t>(max_value);
    }
    const uint32_t start = static_cast<uint32_t>(cdf[sym]);
    const uint32_t freq = static_cast<uint32_t>(cdf[sym + 1]) - start;
    enc.put(start, freq);
  }
  const size_t nbytes = enc.flush(out, static_cast<size_t>(out_capacity));
  return nbytes == static_cast<size_t>(-1) ? -1 : static_cast<long>(nbytes);
}

// Decode `n` symbols from `stream` using the same CDF matrix contract as
// the encoder. Returns 0 on success.
// Shared decode loop; `lut` may be null (binary-search fallback).
static int decode_loop(RansDecoder& dec, const int32_t* indexes, long n,
                       const int32_t* cdfs, int cdf_stride,
                       const int32_t* cdf_lengths, const int32_t* offsets,
                       const CdfLut* lut, int32_t* out_symbols) {
  for (long i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t* cdf = cdfs + static_cast<long>(idx) * cdf_stride;
    const int32_t cdf_len = cdf_lengths[idx];
    const int32_t max_value = cdf_len - 2;

    const uint32_t d = dec.peek();
    const uint32_t sym =
        lut ? decode_symbol_lut(
                  d, cdf, lut->rows.data()
                              + (static_cast<size_t>(idx) << kLutBits))
            : decode_symbol_search(d, cdf, cdf_len);
    const uint32_t start = static_cast<uint32_t>(cdf[sym]);
    const uint32_t freq = static_cast<uint32_t>(cdf[sym + 1]) - start;
    dec.advance(start, freq);

    int32_t value = static_cast<int32_t>(sym);
    if (value == max_value) {  // escape: read varint chunks
      uint32_t code = 0;
      uint32_t shift = 0;
      while (true) {
        const uint32_t chunk = dec.get_bits(kChunkBits);
        code |= chunk << shift;
        shift += kChunkBits;
        const uint32_t cont = dec.get_bits(1);
        if (!cont || shift >= 64) break;
      }
      value = overflow_value(code, max_value);
    }
    out_symbols[i] = value + offsets[idx];
  }
  return 0;
}

void* rdoptq_cdf_lut_new(const int32_t* cdfs, int cdf_stride,
                         const int32_t* cdf_lengths, int n_rows) {
  auto* l = new CdfLut();
  l->rows.resize(static_cast<size_t>(n_rows) << kLutBits);
  for (int r = 0; r < n_rows; ++r) {
    const int32_t* cdf = cdfs + static_cast<long>(r) * cdf_stride;
    const int len = cdf_lengths[r];  // entries; symbols live in [0, len-2]
    uint16_t* row = l->rows.data() + (static_cast<size_t>(r) << kLutBits);
    uint32_t s = 0;
    for (uint32_t bkt = 0; bkt < (1u << kLutBits); ++bkt) {
      const uint32_t d0 = bkt << (kPrecision - kLutBits);
      while (s + 2 < static_cast<uint32_t>(len)
             && static_cast<uint32_t>(cdf[s + 1]) <= d0) {
        ++s;
      }
      row[bkt] = static_cast<uint16_t>(s);
    }
  }
  return l;
}

void rdoptq_cdf_lut_free(void* handle) {
  delete static_cast<CdfLut*>(handle);
}

int rdoptq_rans_decode(const uint8_t* stream, long nbytes,
                       const int32_t* indexes, long n, const int32_t* cdfs,
                       int cdf_stride, const int32_t* cdf_lengths,
                       const int32_t* offsets, int32_t* out_symbols) {
  if (nbytes < 8) return -1;
  RansDecoder dec;
  dec.init(stream, static_cast<size_t>(nbytes));
  return decode_loop(dec, indexes, n, cdfs, cdf_stride, cdf_lengths,
                     offsets, nullptr, out_symbols);
}

int rdoptq_rans_decode_lut(const uint8_t* stream, long nbytes,
                           const int32_t* indexes, long n,
                           const int32_t* cdfs, int cdf_stride,
                           const int32_t* cdf_lengths,
                           const int32_t* offsets, void* lut,
                           int32_t* out_symbols) {
  if (nbytes < 8) return -1;
  RansDecoder dec;
  dec.init(stream, static_cast<size_t>(nbytes));
  return decode_loop(dec, indexes, n, cdfs, cdf_stride, cdf_lengths,
                     offsets, static_cast<const CdfLut*>(lut), out_symbols);
}

// ---------------------------------------------------------------------------
// Stateful streaming decoder: conditional entropy models (channel slices,
// checkerboard passes, autoregressive wavefronts) decode in chunks whose
// distributions depend on previously decoded chunks.
// ---------------------------------------------------------------------------

struct StreamDecoder {
  RansDecoder dec;
  std::vector<uint8_t> buf;  // own the stream
};

void* rdoptq_rans_dec_new(const uint8_t* stream, long nbytes) {
  if (nbytes < 8) return nullptr;
  auto* sd = new StreamDecoder();
  sd->buf.assign(stream, stream + nbytes);
  sd->dec.init(sd->buf.data(), sd->buf.size());
  return sd;
}

int rdoptq_rans_dec_chunk(void* handle, const int32_t* indexes, long n,
                          const int32_t* cdfs, int cdf_stride,
                          const int32_t* cdf_lengths, const int32_t* offsets,
                          int32_t* out_symbols) {
  if (!handle) return -1;
  auto* sd = static_cast<StreamDecoder*>(handle);
  return decode_loop(sd->dec, indexes, n, cdfs, cdf_stride, cdf_lengths,
                     offsets, nullptr, out_symbols);
}

int rdoptq_rans_dec_chunk_lut(void* handle, const int32_t* indexes, long n,
                              const int32_t* cdfs, int cdf_stride,
                              const int32_t* cdf_lengths,
                              const int32_t* offsets, void* lut,
                              int32_t* out_symbols) {
  if (!handle) return -1;
  auto* sd = static_cast<StreamDecoder*>(handle);
  return decode_loop(sd->dec, indexes, n, cdfs, cdf_stride, cdf_lengths,
                     offsets, static_cast<const CdfLut*>(lut), out_symbols);
}

void rdoptq_rans_dec_free(void* handle) {
  delete static_cast<StreamDecoder*>(handle);
}

}  // extern "C"
