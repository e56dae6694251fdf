// Host-side entropy coder for pcc_geo_cnn_v2_tpu.
//
// Sequential arithmetic coding is not a TPU workload; the reference keeps it
// in tensorflow-compression's C++ range-coder ops
// (/root/reference/src/utils/patch_gaussian_conditional.py:27-31 documents the
// contract: per-element CDF-row indexes, quantized int32 CDFs with
// 16-bit precision, unbounded symbols via an overflow escape with
// overflow_width-bit chunks). This is a from-scratch implementation of that
// capability as a 64-bit rANS coder:
//
// - state: uint64, renormalized in 32-bit words, lower bound 2^31
// - regular symbols: bucket b = symbol - offset[row] coded against the row's
//   quantized CDF (cdf[row][b] .. cdf[row][b+1], total 2^precision)
// - out-of-range symbols: escape bucket (last bucket of the row), then the
//   zigzagged overflow magnitude in (overflow_width+1)-bit units
//   (low bits = chunk, top bit = continuation), uniform-coded
// - stream layout: 8-byte little-endian final state, then 32-bit words in
//   decode order
//
// Self-consistency (encode->decode identity) is the contract; the bitstream
// is not byte-compatible with tfc (models are retrained anyway).
//
// Build: g++ -O3 -shared -fPIC -o librange_coder.so range_coder.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint64_t kRansL = 1ull << 31;  // normalized interval lower bound

struct Event {  // one rANS coding event (start/freq over 2^bits)
  uint32_t start;
  uint32_t freq;
  uint32_t bits;
};

inline void rans_enc(uint64_t& x, std::vector<uint32_t>& words,
                     uint32_t start, uint32_t freq, uint32_t bits) {
  // renormalize so the new state stays in [kRansL, kRansL * 2^32)
  const uint64_t x_max = ((kRansL >> bits) << 32) * freq;
  while (x >= x_max) {
    words.push_back(static_cast<uint32_t>(x));
    x >>= 32;
  }
  x = ((x / freq) << bits) + (x % freq) + start;
}

struct RansDec {
  uint64_t x;
  const uint32_t* words;
  int64_t n_words;
  int64_t pos;  // next word to read

  inline uint32_t peek(uint32_t bits) const {
    return static_cast<uint32_t>(x & ((1ull << bits) - 1));
  }
  inline bool advance(uint32_t start, uint32_t freq, uint32_t bits) {
    x = freq * (x >> bits) + peek(bits) - start;
    while (x < kRansL) {
      if (pos >= n_words) return false;
      x = (x << 32) | words[pos++];
    }
    return true;
  }
};

// Map an out-of-range bucket to its escape payload (zigzag + side).
inline uint64_t overflow_value(int64_t bucket, int64_t num_regular) {
  if (bucket < 0) return (static_cast<uint64_t>(-bucket - 1) << 1);
  return (static_cast<uint64_t>(bucket - num_regular) << 1) | 1u;
}

inline int64_t overflow_bucket(uint64_t v, int64_t num_regular) {
  if (v & 1u) return num_regular + static_cast<int64_t>(v >> 1);
  return -static_cast<int64_t>(v >> 1) - 1;
}

}  // namespace

extern "C" {

// Returns bytes written, or -1 on overflow of out_capacity / bad args.
int64_t pcc_rc_encode(const int32_t* symbols, const int32_t* indexes,
                      int64_t n, const int32_t* cdf, int64_t cdf_stride,
                      const int32_t* cdf_length, const int32_t* offset,
                      int32_t precision, int32_t overflow_width,
                      uint8_t* out, int64_t out_capacity) {
  const uint32_t w = static_cast<uint32_t>(overflow_width);
  const uint32_t unit_bits = w + 1;
  const uint32_t cont_flag = 1u << w;

  std::vector<Event> events;
  events.reserve(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    const int32_t row = indexes[i];
    const int32_t* c = cdf + row * cdf_stride;
    const int64_t len = cdf_length[row];     // entries in this row
    const int64_t num_regular = len - 2;     // regular buckets
    const int64_t escape = num_regular;      // escape bucket index
    int64_t b = static_cast<int64_t>(symbols[i]) - offset[row];
    if (b < 0 || b >= num_regular) {
      const uint64_t v = overflow_value(b, num_regular);
      events.push_back({static_cast<uint32_t>(c[escape]),
                        static_cast<uint32_t>(c[escape + 1] - c[escape]),
                        static_cast<uint32_t>(precision)});
      // variable-length units, least-significant chunk first
      uint64_t rest = v;
      do {
        uint32_t unit = static_cast<uint32_t>(rest & (cont_flag - 1));
        rest >>= w;
        if (rest) unit |= cont_flag;
        events.push_back({unit, 1u, unit_bits});
      } while (rest);
    } else {
      events.push_back({static_cast<uint32_t>(c[b]),
                        static_cast<uint32_t>(c[b + 1] - c[b]),
                        static_cast<uint32_t>(precision)});
    }
  }

  uint64_t x = kRansL;
  std::vector<uint32_t> words;
  words.reserve(events.size() / 2 + 4);
  for (auto it = events.rbegin(); it != events.rend(); ++it) {
    rans_enc(x, words, it->start, it->freq, it->bits);
  }

  const int64_t total =
      8 + static_cast<int64_t>(words.size()) * 4;
  if (total > out_capacity) return -1;
  std::memcpy(out, &x, 8);
  uint8_t* p = out + 8;
  for (auto it = words.rbegin(); it != words.rend(); ++it) {
    std::memcpy(p, &(*it), 4);
    p += 4;
  }
  return total;
}

// Returns 0 on success, -1 on malformed stream.
int64_t pcc_rc_decode(const uint8_t* in, int64_t in_len,
                      const int32_t* indexes, int64_t n, const int32_t* cdf,
                      int64_t cdf_stride, const int32_t* cdf_length,
                      const int32_t* offset, int32_t precision,
                      int32_t overflow_width, int32_t* symbols_out) {
  if (in_len < 8 || (in_len - 8) % 4 != 0) return -1;
  const uint32_t w = static_cast<uint32_t>(overflow_width);
  const uint32_t unit_bits = w + 1;
  const uint32_t cont_flag = 1u << w;

  std::vector<uint32_t> words((in_len - 8) / 4);
  for (size_t i = 0; i < words.size(); ++i) {
    std::memcpy(&words[i], in + 8 + 4 * i, 4);
  }
  RansDec dec;
  std::memcpy(&dec.x, in, 8);
  dec.words = words.data();
  dec.n_words = static_cast<int64_t>(words.size());
  dec.pos = 0;

  for (int64_t i = 0; i < n; ++i) {
    const int32_t row = indexes[i];
    const int32_t* c = cdf + row * cdf_stride;
    const int64_t len = cdf_length[row];
    const int64_t num_regular = len - 2;
    const uint32_t slot = dec.peek(static_cast<uint32_t>(precision));
    // binary search: largest b with c[b] <= slot
    int64_t lo = 0, hi = len - 1;
    while (hi - lo > 1) {
      const int64_t mid = (lo + hi) >> 1;
      if (static_cast<uint32_t>(c[mid]) <= slot) lo = mid;
      else hi = mid;
    }
    const int64_t b = lo;
    if (!dec.advance(static_cast<uint32_t>(c[b]),
                     static_cast<uint32_t>(c[b + 1] - c[b]),
                     static_cast<uint32_t>(precision)))
      return -1;
    int64_t bucket = b;
    if (b == num_regular) {  // escape: read overflow units
      uint64_t v = 0;
      uint32_t shift = 0;
      while (true) {
        const uint32_t unit = dec.peek(unit_bits);
        if (!dec.advance(unit, 1u, unit_bits)) return -1;
        v |= static_cast<uint64_t>(unit & (cont_flag - 1)) << shift;
        shift += w;
        if (!(unit & cont_flag)) break;
        if (shift > 62) return -1;
      }
      bucket = overflow_bucket(v, num_regular);
    }
    symbols_out[i] = static_cast<int32_t>(bucket + offset[row]);
  }
  return 0;
}

}  // extern "C"
