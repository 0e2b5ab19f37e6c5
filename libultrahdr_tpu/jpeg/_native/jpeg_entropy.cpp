// Baseline JPEG Huffman entropy codec (host side of the TPU JPEG pipeline).
//
// The TPU computes batched DCT/quantization (jpeg/dct.py); this module does
// the inherently sequential bit-level work: interleaved-scan Huffman encode
// and decode with byte stuffing and restart-marker support.  It replaces the
// role libjpeg's jchuff.c/jdhuff.c play for the reference
// (/root/reference/lib/src/jpegencoderhelper.cpp, jpegdecoderhelper.cpp),
// implemented from the ITU-T T.81 spec (Annex C canonical codes, F.1.2
// encoding procedure, F.2.2 decoding procedure).
//
// Coefficients cross the boundary as zigzag-ordered int16 blocks laid out
// (blocks_down, blocks_across, 64) per component, padded to full MCUs.

#include <cstdint>
#include <cstring>
#include <vector>

#if defined(__AVX2__)
#include <immintrin.h>
#endif

namespace {

// ---------------------------------------------------------------------------
// Canonical Huffman code derivation (T.81 Annex C)

struct EncTable {
  uint32_t code[256];
  uint8_t size[256];
};

struct DecTable {
  int32_t mincode[17];
  int32_t maxcode[18];  // maxcode[17] sentinel
  int32_t valptr[17];
  uint8_t values[256];
  // fast lookup for first 10 bits: symbol and length (0 = miss)
  uint8_t look_sym[1024];
  uint8_t look_len[1024];
};

void build_enc_table(const uint8_t* bits, const uint8_t* vals, EncTable* t) {
  std::memset(t->size, 0, sizeof(t->size));
  uint32_t code = 0;
  int k = 0;
  for (int len = 1; len <= 16; len++) {
    for (int i = 0; i < bits[len - 1]; i++) {
      t->code[vals[k]] = code;
      t->size[vals[k]] = (uint8_t)len;
      code++;
      k++;
    }
    code <<= 1;
  }
}

void build_dec_table(const uint8_t* bits, const uint8_t* vals, DecTable* t) {
  int code = 0, k = 0;
  std::memcpy(t->values, vals, 256);
  for (int len = 1; len <= 16; len++) {
    if (bits[len - 1] > 0) {
      t->valptr[len] = k;
      t->mincode[len] = code;
      k += bits[len - 1];
      code += bits[len - 1];
      t->maxcode[len] = code - 1;
    } else {
      t->maxcode[len] = -1;
    }
    code <<= 1;
  }
  t->maxcode[17] = 0x7FFFFFFF;
  // 10-bit lookahead
  std::memset(t->look_len, 0, sizeof(t->look_len));
  int c = 0;
  k = 0;
  for (int len = 1; len <= 10; len++) {
    for (int i = 0; i < bits[len - 1]; i++, k++, c++) {
      // all 10-bit sequences with this prefix decode to vals[k]
      int lo = c << (10 - len);
      int hi = lo + (1 << (10 - len));
      for (int j = lo; j < hi; j++) {
        t->look_sym[j] = vals[k];
        t->look_len[j] = (uint8_t)len;
      }
    }
    c <<= 1;
  }
}

// ---------------------------------------------------------------------------
// Bit writer with 0xFF stuffing

struct BitWriter {
  uint8_t* out;
  int64_t cap;
  int64_t pos;
  uint64_t acc;   // bits accumulate in high-order positions
  int nbits;
  bool overflow;

  void put(uint32_t code, int size) {
    // size 0 happens for zero value-bit payloads (e.g. a DC diff of 0);
    // the shift below would then be 64 when the accumulator is empty,
    // which is undefined for uint64_t
    if (size == 0) return;
    acc |= (uint64_t)code << (64 - nbits - size);
    nbits += size;
    while (nbits >= 8) {
      uint8_t b = (uint8_t)(acc >> 56);
      emit(b);
      if (b == 0xFF) emit(0x00);
      acc <<= 8;
      nbits -= 8;
    }
  }

  void emit(uint8_t b) {
    if (pos >= cap) {
      overflow = true;
      return;
    }
    out[pos++] = b;
  }

  void flush_align() {  // pad with 1-bits to byte boundary (T.81 F.1.2.3)
    if (nbits > 0) {
      int pad = 8 - (nbits & 7);
      if (pad < 8) put((1u << pad) - 1, pad);
      // put() drained whole bytes; if exactly aligned nothing remains
    }
    acc = 0;
    nbits = 0;
  }

  void marker(uint8_t m) {  // write a marker without stuffing
    emit(0xFF);
    emit(m);
  }
};

inline int bit_size(int v) {
  int a = v < 0 ? -v : v;
  int n = 0;
  while (a) {
    a >>= 1;
    n++;
  }
  return n;
}

struct CompMeta {
  int32_t bw, bh, h, v, dc_tbl, ac_tbl;
};

}  // namespace

extern "C" {

// Pack the 10 significant bits of n P010 samples (data in the 10 MSB of
// each uint16) into a dense little-endian bit stream of 10*n bits
// (ceil(10n/16) uint16 words).  Shrinks the host->device upload of raw
// P010 input by 37.5%; the TPU unpacks with static shifts
// (fused.py _unpack_10bit).  n must be a multiple of 16 (caller pads).
void uhdr_pack_p010_10bit(const uint16_t* in, int64_t n, uint16_t* out) {
  int64_t groups = n / 16;
  for (int64_t g = 0; g < groups; g++) {
    const uint16_t* s = in + g * 16;
    uint16_t* d = out + g * 10;
    uint32_t acc = 0;
    int bits = 0, w = 0;
    for (int k = 0; k < 16; k++) {
      acc |= (uint32_t)(s[k] >> 6) << bits;
      bits += 10;
      if (bits >= 16) {
        d[w++] = (uint16_t)acc;
        acc >>= 16;
        bits -= 16;
      }
    }
  }
}

// Delta + bit-sliced wire packing of a P010 plane for host->device upload.
//
// The upload link (~50 MB/s tunnel) is the encode pipeline's binding
// constraint; the 10-bit dense pack above moves 10 bits/sample.  Natural
// and synthetic photographic content is horizontally smooth, so the
// horizontal delta of the 10-bit values fits 7 bits for >99.4% of samples
// (measured on the benchmark scenes).  Layout: per sample, code
// s = clamp(delta + 64, [0,127]); groups of 32 consecutive flat samples
// bit-slice into 7 uint32 words (word j holds bit j of all 32 samples in
// its lanes), which the TPU un-slices with 7 static shift-ands — no
// gather.  Out-of-range deltas store s=64 (delta 0) and are patched on
// device from the (flat_idx, true_delta) escape list.  Deltas reset per
// row (first column deltas against 512); UV interleaved planes delta
// against the previous same-channel sample (stride 2).
//
// Returns the escape count, or -1 when it exceeds esc_cap (caller falls
// back to the dense 10-bit pack).
// Generalized wire: configurable code width `bits` (4..8) and an optional
// 2D predictor.  two_d=0 reproduces the original delta7 semantics; two_d=1
// first removes the vertical delta (t[r,c] = v[r,c] - v[r-1,c], row 0
// against 512), then the horizontal delta of t (per channel for UV), which
// whitens smooth gradients so photographic content fits 4-5 bits.  The
// device reconstructs with a column cumsum then a row cumsum (fused.py
// _delta_decode_plane).  Escapes store the true horizontal delta.
// General form: configurable value shift (6 for P010's MSB-aligned 10-bit
// samples, 0 for raw u16 channels), predictor base, and int32 escape
// values (raw-u16 2D deltas span 18 bits).
int64_t uhdr_pack_delta_g(const uint16_t* in, int64_t rows, int64_t cols,
                          int uv_interleaved, int two_d, int bits,
                          int shift, int32_t base, uint32_t* out_words,
                          int32_t* esc_idx, int32_t* esc_val,
                          int64_t esc_cap) {
  if (bits < 2 || bits > 8) return -2;
  int64_t n = rows * cols;
  const int32_t offs = 1 << (bits - 1);
  const uint32_t lim = (1u << bits) - 1u;
  std::vector<uint8_t> codes(((n + 31) / 32) * 32, (uint8_t)offs);
  int64_t n_esc = 0;
#if defined(__AVX2__)
  // Vector path.  Both delta stages are elementwise (the "previous
  // sample" chain is just t[c] - t[c-stride], no prefix dependence), and
  // all arithmetic is exact mod 2^16: the device reconstructs with int32
  // cumsums then casts to uint16, so i16 lanes produce the same final
  // samples even where raw-u16 2D deltas exceed 16 bits (the escape list
  // then carries the mod-2^16 delta, which cumsums to the same u16).
  if (cols >= 16) {
    const int stride = uv_interleaved ? 2 : 1;
    const int16_t tprev_init = (int16_t)(two_d ? 0 : base);
    std::vector<int16_t> tbuf((size_t)cols + 2);
    std::vector<int16_t> prevrow;
    if (two_d) prevrow.assign((size_t)cols, (int16_t)base);
    const __m256i voffs = _mm256_set1_epi16((short)offs);
    const __m256i vlim = _mm256_set1_epi16((short)(int16_t)lim);
    const __m128i vshift = _mm_cvtsi32_si128(shift);
    for (int64_t r = 0; r < rows; r++) {
      const uint16_t* src = in + r * cols;
      uint8_t* dst = codes.data() + r * cols;
      int16_t* t = tbuf.data() + 2;
      t[-1] = t[-2] = tprev_init;
      int64_t c = 0;
      if (two_d) {
        for (; c + 16 <= cols; c += 16) {
          __m256i v = _mm256_srl_epi16(
              _mm256_loadu_si256((const __m256i*)(src + c)), vshift);
          __m256i pv = _mm256_loadu_si256((const __m256i*)(&prevrow[(size_t)c]));
          _mm256_storeu_si256((__m256i*)(t + c), _mm256_sub_epi16(v, pv));
          _mm256_storeu_si256((__m256i*)(&prevrow[(size_t)c]), v);
        }
        for (; c < cols; c++) {
          int16_t v = (int16_t)(src[c] >> shift);
          t[c] = (int16_t)(v - prevrow[(size_t)c]);
          prevrow[(size_t)c] = v;
        }
      } else {
        for (; c + 16 <= cols; c += 16)
          _mm256_storeu_si256(
              (__m256i*)(t + c),
              _mm256_srl_epi16(
                  _mm256_loadu_si256((const __m256i*)(src + c)), vshift));
        for (; c < cols; c++) t[c] = (int16_t)(src[c] >> shift);
      }
      for (c = 0; c + 16 <= cols; c += 16) {
        __m256i tc = _mm256_loadu_si256((const __m256i*)(t + c));
        __m256i tp = _mm256_loadu_si256((const __m256i*)(t + c - stride));
        __m256i d = _mm256_sub_epi16(tc, tp);
        __m256i s = _mm256_add_epi16(d, voffs);
        __m256i esc = _mm256_or_si256(
            _mm256_cmpgt_epi16(_mm256_setzero_si256(), s),
            _mm256_cmpgt_epi16(s, vlim));
        __m256i sel = _mm256_blendv_epi8(s, voffs, esc);
        __m128i packed = _mm_packus_epi16(_mm256_castsi256_si128(sel),
                                          _mm256_extracti128_si256(sel, 1));
        _mm_storeu_si128((__m128i*)(dst + c), packed);
        uint32_t m = (uint32_t)_mm256_movemask_epi8(esc);
        if (m) {
          alignas(32) int16_t dv[16];
          _mm256_storeu_si256((__m256i*)dv, d);
          for (int i = 0; i < 16; i++) {
            if (m & (3u << (2 * i))) {
              if (n_esc >= esc_cap) return -1;
              esc_idx[n_esc] = (int32_t)(r * cols + c + i);
              esc_val[n_esc++] = dv[i];
            }
          }
        }
      }
      for (; c < cols; c++) {
        int32_t d = (int16_t)(t[c] - t[c - stride]);
        int32_t s = d + offs;
        if ((uint32_t)s <= lim) {
          dst[c] = (uint8_t)s;
        } else {
          if (n_esc >= esc_cap) return -1;
          esc_idx[n_esc] = (int32_t)(r * cols + c);
          esc_val[n_esc++] = d;
        }
      }
    }
  } else
#endif
  {
    std::vector<int32_t> prev_row;
    if (two_d) prev_row.assign((size_t)cols, base);
    for (int64_t r = 0; r < rows; r++) {
      const uint16_t* src = in + r * cols;
      uint8_t* dst = codes.data() + r * cols;
      // 1D: predictor starts at `base` per row; 2D: horizontal predictor
      // of the vertically-differenced samples starts at 0 per row
      int32_t prev0 = two_d ? 0 : base, prev1 = prev0;
      for (int64_t c = 0; c < cols; c++) {
        int32_t v = src[c] >> shift;
        int32_t t = v;
        if (two_d) {
          t = v - prev_row[(size_t)c];
          prev_row[(size_t)c] = v;
        }
        int32_t& prev = (uv_interleaved && (c & 1)) ? prev1 : prev0;
        // mod-2^16 delta, matching the AVX2 i16-lane path bit for bit:
        // escape detection and escape values are then build-independent
        // (the reconstruction cumsums in int32 and casts to uint16, so
        // wrapped deltas decode to the same samples)
        int32_t d = (int16_t)(uint16_t)(uint32_t)(t - prev);
        prev = t;
        int32_t s = d + offs;
        if ((uint32_t)s <= lim) {
          dst[c] = (uint8_t)s;
        } else {
          if (n_esc >= esc_cap) return -1;
          esc_idx[n_esc] = (int32_t)(r * cols + c);
          esc_val[n_esc++] = d;
        }
      }
    }
  }
  int64_t groups = (n + 31) / 32;
#if defined(__AVX2__)
  for (int64_t g = 0; g < groups; g++) {
    __m256i cvec = _mm256_loadu_si256(
        (const __m256i*)(codes.data() + g * 32));
    for (int j = 0; j < bits; j++) {
      __m256i bit = _mm256_set1_epi8((char)(1 << j));
      __m256i has = _mm256_cmpeq_epi8(_mm256_and_si256(cvec, bit), bit);
      out_words[g * bits + j] = (uint32_t)_mm256_movemask_epi8(has);
    }
  }
#else
  for (int64_t g = 0; g < groups; g++) {
    const uint8_t* s = codes.data() + g * 32;
    uint32_t w[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 32; i++) {
      uint32_t c = s[i];
      for (int j = 0; j < bits; j++) w[j] |= ((c >> j) & 1u) << i;
    }
    for (int j = 0; j < bits; j++) out_words[g * bits + j] = w[j];
  }
#endif
  return n_esc;
}

// P010 form (10-bit samples in the MSBs; deltas fit int16 escapes)
int64_t uhdr_pack_delta(const uint16_t* in, int64_t rows, int64_t cols,
                        int uv_interleaved, int two_d, int bits,
                        uint32_t* out_words, int32_t* esc_idx,
                        int16_t* esc_val, int64_t esc_cap) {
  std::vector<int32_t> v32((size_t)(esc_cap > 0 ? esc_cap : 1));
  int64_t n = uhdr_pack_delta_g(in, rows, cols, uv_interleaved, two_d,
                                bits, 6, 512, out_words, esc_idx,
                                v32.data(), esc_cap);
  for (int64_t i = 0; i < (n > 0 ? n : 0); i++)
    esc_val[i] = (int16_t)v32[(size_t)i];
  return n;
}

int64_t uhdr_pack_delta7(const uint16_t* in, int64_t rows, int64_t cols,
                         int uv_interleaved, uint32_t* out_words,
                         int32_t* esc_idx, int16_t* esc_val,
                         int64_t esc_cap) {
  return uhdr_pack_delta(in, rows, cols, uv_interleaved, 0, 7, out_words,
                         esc_idx, esc_val, esc_cap);
}

// --------------------------------------------------------------------------
// Variable-width group wire ("vw"): the upload codec that replaced the
// fixed-rung ladder.  2D prediction (vertical then per-channel horizontal
// delta, exactly uhdr_pack_delta_g's two_d semantics), then each group of
// 32 residuals is bit-sliced at its OWN width w in 0..12 (the exact signed
// bits its min/max need; w=0 encodes an all-zero group with zero payload
// words).  No escape lists: every residual of a >>shift-reduced sample
// fits w<=18-shift<=15, so the wire ALWAYS fits — flat content costs ~0.15
// bits/sample, photographic content its local entropy, and one program
// serves every content type (the TPU-side unpack gathers per-group words
// via a cumsum of the width array).  Widths pack 8-per-u32 (4 bits each).
// Returns the payload word count, -1 if it would exceed payload_cap, -2 on
// unsupported shift (<3 would need widths >15).

static void uhdr_resid2d(const uint16_t* in, int64_t rows, int64_t cols,
                         int uv_interleaved, int shift, int32_t base,
                         int16_t* res) {
  const int stride = uv_interleaved ? 2 : 1;
#if defined(__AVX2__)
  if (cols >= 16) {
    std::vector<int16_t> prevrow((size_t)cols, (int16_t)base);
    std::vector<int16_t> tbuf((size_t)cols + 2);
    const __m128i vshift = _mm_cvtsi32_si128(shift);
    for (int64_t r = 0; r < rows; r++) {
      const uint16_t* src = in + r * cols;
      int16_t* t = tbuf.data() + 2;
      t[-1] = t[-2] = 0;
      int64_t c = 0;
      for (; c + 16 <= cols; c += 16) {
        __m256i v = _mm256_srl_epi16(
            _mm256_loadu_si256((const __m256i*)(src + c)), vshift);
        __m256i pv =
            _mm256_loadu_si256((const __m256i*)(&prevrow[(size_t)c]));
        _mm256_storeu_si256((__m256i*)(t + c), _mm256_sub_epi16(v, pv));
        _mm256_storeu_si256((__m256i*)(&prevrow[(size_t)c]), v);
      }
      for (; c < cols; c++) {
        int16_t v = (int16_t)(src[c] >> shift);
        t[c] = (int16_t)(v - prevrow[(size_t)c]);
        prevrow[(size_t)c] = v;
      }
      int16_t* dst = res + r * cols;
      for (c = 0; c + 16 <= cols; c += 16) {
        __m256i tc = _mm256_loadu_si256((const __m256i*)(t + c));
        __m256i tp = _mm256_loadu_si256((const __m256i*)(t + c - stride));
        _mm256_storeu_si256((__m256i*)(dst + c), _mm256_sub_epi16(tc, tp));
      }
      for (; c < cols; c++) dst[c] = (int16_t)(t[c] - t[c - stride]);
    }
    return;
  }
#endif
  std::vector<int32_t> prev_row((size_t)cols, base);
  for (int64_t r = 0; r < rows; r++) {
    const uint16_t* src = in + r * cols;
    int16_t* dst = res + r * cols;
    int32_t prev0 = 0, prev1 = 0;
    for (int64_t c = 0; c < cols; c++) {
      int32_t v = src[c] >> shift;
      int32_t t = v - prev_row[(size_t)c];
      prev_row[(size_t)c] = v;
      int32_t& prev = (uv_interleaved && (c & 1)) ? prev1 : prev0;
      dst[c] = (int16_t)(t - prev);
      prev = t;
    }
  }
}

int64_t uhdr_pack_vw(const uint16_t* in, int64_t rows, int64_t cols,
                     int uv_interleaved, int shift, int32_t base,
                     uint32_t* width_words, uint32_t* payload,
                     int64_t payload_cap) {
  // shift>=3 keeps every width <=12 by construction (13-bit samples).
  // shift<3 is allowed for callers whose samples are <=10 bits in the
  // LOW bits (e.g. RGBA1010102 channels at shift 0); content that would
  // need a width >12 (the u4 field / payload budget cap) returns -2 and
  // the caller falls back to another wire.
  if (shift < 0 || shift > 6) return -2;
  const int64_t n = rows * cols;
  const int64_t G = (n + 31) / 32;
  std::vector<int16_t> res((size_t)(G * 32), 0);
  uhdr_resid2d(in, rows, cols, uv_interleaved, shift, base, res.data());
  std::memset(width_words, 0, (size_t)((G + 7) / 8) * 4);
  int64_t off = 0;
  for (int64_t g = 0; g < G; g++) {
    const int16_t* d = res.data() + g * 32;
#if defined(__AVX2__)
    __m256i d0 = _mm256_loadu_si256((const __m256i*)d);
    __m256i d1 = _mm256_loadu_si256((const __m256i*)(d + 16));
    __m256i mx8 = _mm256_max_epi16(d0, d1);
    __m256i mn8 = _mm256_min_epi16(d0, d1);
    __m128i mx4 = _mm_max_epi16(_mm256_castsi256_si128(mx8),
                                _mm256_extracti128_si256(mx8, 1));
    __m128i mn4 = _mm_min_epi16(_mm256_castsi256_si128(mn8),
                                _mm256_extracti128_si256(mn8, 1));
    mx4 = _mm_max_epi16(mx4, _mm_srli_si128(mx4, 8));
    mn4 = _mm_min_epi16(mn4, _mm_srli_si128(mn4, 8));
    mx4 = _mm_max_epi16(mx4, _mm_srli_si128(mx4, 4));
    mn4 = _mm_min_epi16(mn4, _mm_srli_si128(mn4, 4));
    mx4 = _mm_max_epi16(mx4, _mm_srli_si128(mx4, 2));
    mn4 = _mm_min_epi16(mn4, _mm_srli_si128(mn4, 2));
    int32_t mx = (int16_t)_mm_cvtsi128_si32(mx4);
    int32_t mn = (int16_t)_mm_cvtsi128_si32(mn4);
#else
    int32_t mx = d[0], mn = d[0];
    for (int i = 1; i < 32; i++) {
      if (d[i] > mx) mx = d[i];
      if (d[i] < mn) mn = d[i];
    }
#endif
    int w = 0;
    if (mx | mn) {
      int32_t m = mx > (-mn - 1) ? mx : (-mn - 1);
      w = 1;
      while (m >= (1 << (w - 1))) w++;
    }
    if (w > 12) return -2;      // content too wide for the u4 width field
    width_words[g >> 3] |= (uint32_t)w << (4 * (g & 7));
    if (!w) continue;
    if (off + w > payload_cap) return -1;
#if defined(__AVX2__)
    {
      const __m256i bias = _mm256_set1_epi16((short)(1 << (w - 1)));
      __m256i s0 = _mm256_add_epi16(
          _mm256_loadu_si256((const __m256i*)d), bias);
      __m256i s1 = _mm256_add_epi16(
          _mm256_loadu_si256((const __m256i*)(d + 16)), bias);
      for (int b = 0; b < w; b++) {
        __m256i t0 = _mm256_srai_epi16(_mm256_slli_epi16(s0, 15 - b), 15);
        __m256i t1 = _mm256_srai_epi16(_mm256_slli_epi16(s1, 15 - b), 15);
        __m256i p = _mm256_packs_epi16(t0, t1);
        p = _mm256_permute4x64_epi64(p, 0xD8);
        payload[off + b] = (uint32_t)_mm256_movemask_epi8(p);
      }
    }
#else
    {
      const int32_t bias = 1 << (w - 1);
      uint32_t wbuf[16];
      for (int b = 0; b < w; b++) wbuf[b] = 0;
      for (int i = 0; i < 32; i++) {
        uint32_t s = (uint32_t)(d[i] + bias);
        for (int b = 0; b < w; b++) wbuf[b] |= ((s >> b) & 1u) << i;
      }
      for (int b = 0; b < w; b++) payload[off + b] = wbuf[b];
    }
#endif
    off += w;
  }
  return off;
}

// Bit-slice a flat int16 stream at `bits` per sample (no prediction) with
// an escape list for out-of-range values — the decode path's coefficient
// upload wire (quantized natural-image AC coefficients fit 4 bits for
// >99.5% of samples at q95).  Groups of 32 samples slice into `bits` u32
// words; escapes store (flat index, true value).  Returns the escape
// count, or -1 on overflow.
int64_t uhdr_pack_slices(const int16_t* in, int64_t n, int bits,
                         uint32_t* out_words, int32_t* esc_idx,
                         int16_t* esc_val, int64_t esc_cap) {
  if (bits < 2 || bits > 8) return -2;
  const int32_t offs = 1 << (bits - 1);
  const uint32_t lim = (1u << bits) - 1u;
  int64_t n_esc = 0;
  int64_t groups = (n + 31) / 32;
  for (int64_t g = 0; g < groups; g++) {
    uint32_t w[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    int64_t base = g * 32;
    int m = (int)((n - base < 32) ? (n - base) : 32);
    for (int i = 0; i < m; i++) {
      int32_t s = (int32_t)in[base + i] + offs;
      uint32_t c;
      if ((uint32_t)s <= lim) {
        c = (uint32_t)s;
      } else {
        if (n_esc >= esc_cap) return -1;
        esc_idx[n_esc] = (int32_t)(base + i);
        esc_val[n_esc++] = in[base + i];
        c = (uint32_t)offs;              // decodes to 0, patched on device
      }
      for (int j = 0; j < bits; j++) w[j] |= ((c >> j) & 1u) << i;
    }
    for (int i = m; i < 32; i++)
      for (int j = 0; j < bits; j++)
        w[j] |= (((uint32_t)offs >> j) & 1u) << i;
    for (int j = 0; j < bits; j++) out_words[g * bits + j] = w[j];
  }
  return n_esc;
}

// Host half of the decode-output DOWNLOAD wire (fused._pack_down_wire_*):
// the device bit-slices each output channel's 2D deltas (vertical diff
// from base, then horizontal diff, same filter as uhdr_pack_delta_g) and
// the 33-66 MB decoded image crosses the link at `bits`/sample/channel.
// This reverses one channel: un-slice, patch escapes (ascending flat
// indices, as jnp.nonzero emits), integrate, write u16 samples.
int64_t uhdr_unpack_delta2d(const uint32_t* words, const int32_t* esc_idx,
                            const int32_t* esc_val, int64_t n_esc,
                            int64_t rows, int64_t cols, int bits,
                            int32_t base, uint16_t* out) {
  if (bits < 2 || bits > 8) return -2;
  int64_t n = rows * cols;
  const int32_t offs = 1 << (bits - 1);
  std::vector<uint8_t> codes((size_t)(((n + 31) / 32) * 32));
  int64_t groups = (n + 31) / 32;
  for (int64_t g = 0; g < groups; g++) {
    const uint32_t* w = words + g * bits;
    uint8_t* dst = codes.data() + g * 32;
    for (int i = 0; i < 32; i++) {
      uint32_t c = 0;
      for (int j = 0; j < bits; j++) c |= ((w[j] >> i) & 1u) << j;
      dst[i] = (uint8_t)c;
    }
  }
  std::vector<int32_t> prev_row((size_t)cols, base);
  int64_t e = 0;
  for (int64_t r = 0; r < rows; r++) {
    const uint8_t* src = codes.data() + r * cols;
    uint16_t* dst = out + r * cols;
    int32_t t = 0;
    for (int64_t c = 0; c < cols; c++) {
      int32_t d;
      if (e < n_esc && esc_idx[e] == (int32_t)(r * cols + c)) {
        d = esc_val[e++];
      } else {
        d = (int32_t)src[c] - offs;
      }
      t += d;
      int32_t v = prev_row[(size_t)c] + t;
      prev_row[(size_t)c] = v;
      dst[c] = (uint16_t)v;
    }
  }
  return e;
}

// Finalize a device-packed scan: byte-stuff each restart row and join rows
// with RST markers.  `in` holds mcus_h byte-aligned row segments laid out
// back to back (offsets in row_off[0..n_rows], bytes); the TPU produced the
// Huffman bits (jpeg/device_entropy.py), this pass is the only sequential
// remainder.  Returns bytes written or -1 on overflow.
int64_t uhdr_stuff_scan(const uint8_t* in, const int32_t* row_off,
                        int n_rows, uint8_t* out, int64_t capacity) {
  int64_t o = 0;
  for (int r = 0; r < n_rows; r++) {
    const uint8_t* p = in + row_off[r];
    const uint8_t* end = in + row_off[r + 1];
    if (o + 2 * (end - p) + 2 > capacity) return -1;
    while (p < end) {
      uint8_t c = *p++;
      out[o++] = c;
      if (c == 0xFF) out[o++] = 0x00;
    }
    if (r != n_rows - 1) {
      out[o++] = 0xFF;
      out[o++] = (uint8_t)(0xD0 + (r & 7));
    }
  }
  return o;
}

// Like uhdr_stuff_scan but with independent (start, end) byte ranges per
// restart row — used when rows come from multiple device shards laid out
// with per-shard strides (parallel/batch.py sharded encode).
int64_t uhdr_stuff_scan_ranges(const uint8_t* in, const int64_t* starts,
                               const int64_t* ends, int n_rows, uint8_t* out,
                               int64_t capacity) {
  int64_t o = 0;
  for (int r = 0; r < n_rows; r++) {
    const uint8_t* p = in + starts[r];
    const uint8_t* end = in + ends[r];
    if (o + 2 * (end - p) + 2 > capacity) return -1;
    while (p < end) {
      uint8_t c = *p++;
      out[o++] = c;
      if (c == 0xFF) out[o++] = 0x00;
    }
    if (r != n_rows - 1) {
      out[o++] = 0xFF;
      out[o++] = (uint8_t)(0xD0 + (r & 7));
    }
  }
  return o;
}

// Join word-aligned per-block bit segments (device packer v2,
// jpeg/device_entropy.py pack_scan_device_v2) into the final entropy-coded
// stream: bit-level concatenation + RST marker per MCU row + byte stuffing
// in one sequential pass.  `words` holds each block's MSB-first bits in
// ceil(len/32) consecutive uint32s; `len_bits` are per-block bit counts
// (the per-row 1-bit pad is already inside the row's last block, so every
// row boundary lands byte-aligned).  Returns bytes written, -1 on capacity
// overflow, -2 if a row boundary is not byte-aligned.
int64_t uhdr_join_blocks(const uint32_t* words, const uint16_t* len_bits,
                         int64_t n_blocks, int64_t blocks_per_row,
                         uint8_t* out, int64_t capacity) {
  uint64_t acc = 0;
  int accbits = 0;
  int64_t o = 0, wpos = 0;
  int64_t rst = 0;
  for (int64_t b = 0; b < n_blocks; b++) {
    int len = len_bits[b];
    int nw = (len + 31) >> 5;
    for (int i = 0; i < nw; i++) {
      uint32_t wd = words[wpos + i];
      int take = len - 32 * i;
      if (take > 32) take = 32;
      acc = (acc << take) | (uint64_t)(wd >> (32 - take));
      accbits += take;
      if (o + 16 > capacity) return -1;
      while (accbits >= 8) {
        uint8_t c = (uint8_t)(acc >> (accbits - 8));
        out[o++] = c;
        if (c == 0xFF) out[o++] = 0x00;
        accbits -= 8;
      }
    }
    wpos += nw;
    if ((b + 1) % blocks_per_row == 0) {
      if (accbits != 0) {
        // byte-align the restart row with 1-bits (T.81 F.1.2.3).  Device
        // packers may emit rows unpadded (the v3 kernel) or pre-padded
        // (the XLA tree, which lands here with accbits == 0) — the final
        // bytes are identical either way.
        int pad = 8 - accbits;
        uint8_t c = (uint8_t)(((acc << pad) | ((1u << pad) - 1)) & 0xFF);
        if (o + 2 > capacity) return -1;
        out[o++] = c;
        if (c == 0xFF) out[o++] = 0x00;
        accbits = 0;
        acc = 0;
      }
      if (b + 1 != n_blocks) {
        if (o + 2 > capacity) return -1;
        out[o++] = 0xFF;
        out[o++] = (uint8_t)(0xD0 + (rst & 7));
        rst++;
      }
    }
  }
  return o;
}

// Encode one interleaved baseline scan.  Returns bytes written, or -1 on
// overflow, -2 on bad args.  Emits only entropy-coded data (+RST markers if
// restart_interval > 0); SOS header/EOI are the caller's job.
int64_t uhdr_encode_scan(const int16_t** coeffs, const int32_t* comp_meta,
                         int num_comps, int mcus_w, int mcus_h,
                         int restart_interval, const uint8_t* dc_bits,
                         const uint8_t* dc_vals, const uint8_t* ac_bits,
                         const uint8_t* ac_vals, uint8_t* out,
                         int64_t capacity) {
  if (num_comps < 1 || num_comps > 4) return -2;
  EncTable dc_t[4], ac_t[4];
  for (int i = 0; i < 4; i++) {
    build_enc_table(dc_bits + 16 * i, dc_vals + 256 * i, &dc_t[i]);
    build_enc_table(ac_bits + 16 * i, ac_vals + 256 * i, &ac_t[i]);
  }
  const CompMeta* cm = (const CompMeta*)comp_meta;

  BitWriter w{out, capacity, 0, 0, 0, false};
  int last_dc[4] = {0, 0, 0, 0};
  int rst_idx = 0;
  int mcus_since_restart = 0;

  for (int my = 0; my < mcus_h; my++) {
    for (int mx = 0; mx < mcus_w; mx++) {
      if (restart_interval > 0 && mcus_since_restart == restart_interval) {
        w.flush_align();
        w.marker((uint8_t)(0xD0 + rst_idx));
        rst_idx = (rst_idx + 1) & 7;
        mcus_since_restart = 0;
        for (int i = 0; i < 4; i++) last_dc[i] = 0;
      }
      for (int ci = 0; ci < num_comps; ci++) {
        const CompMeta& c = cm[ci];
        const EncTable& dct = dc_t[c.dc_tbl];
        const EncTable& act = ac_t[c.ac_tbl];
        for (int by = 0; by < c.v; by++) {
          for (int bx = 0; bx < c.h; bx++) {
            int row = my * c.v + by;
            int col = mx * c.h + bx;
            const int16_t* blk = coeffs[ci] + ((int64_t)row * c.bw + col) * 64;
            // DC
            int diff = blk[0] - last_dc[ci];
            last_dc[ci] = blk[0];
            int s = bit_size(diff);
            if (s > 15 || dct.size[s] == 0) return -3;  // uncodable symbol
            w.put(dct.code[s], dct.size[s]);
            if (s) {
              int bits = diff < 0 ? diff + (1 << s) - 1 : diff;
              w.put((uint32_t)bits & ((1u << s) - 1), s);
            }
            // AC
            int run = 0;
            for (int kk = 1; kk < 64; kk++) {
              int v = blk[kk];
              if (v == 0) {
                run++;
                continue;
              }
              while (run > 15) {
                w.put(act.code[0xF0], act.size[0xF0]);  // ZRL
                run -= 16;
              }
              int sz = bit_size(v);
              int sym = (run << 4) | sz;
              if (sz > 10 || act.size[sym] == 0) return -3;  // uncodable
              w.put(act.code[sym], act.size[sym]);
              int bits = v < 0 ? v + (1 << sz) - 1 : v;
              w.put((uint32_t)bits & ((1u << sz) - 1), sz);
              run = 0;
            }
            if (run > 0) {
              w.put(act.code[0x00], act.size[0x00]);  // EOB
            }
          }
        }
      }
      mcus_since_restart++;
    }
  }
  w.flush_align();
  if (w.overflow) return -1;
  return w.pos;
}

namespace {

// Bit reader over stuffed entropy data, bit-exact to libjpeg(-turbo)'s
// slow-path semantics (jdhuff.c jpeg_fill_bit_buffer) including corrupt
// streams: fill bytes (runs of FF) before a marker are consumed, FF 00 is
// a stuffed data FF, EOF synthesizes a fake EOI (jdatasrc.c
// fill_mem_input_buffer), and once a bit request exceeds the real data
// the `insufficient` flag latches (JWRN_HIT_MARKER) and the request is
// satisfied with zero bits.  libjpeg-turbo's fast entropy path is
// disabled whenever a restart interval is set (jdhuff.c decode_mcu) and
// otherwise bails to the slow path at any marker, so the slow path IS the
// reference behavior for every stream this library emits or ingests.
struct BitReader {
  const uint8_t* data;
  int64_t size;
  int64_t pos;         // next unread byte
  uint64_t acc;        // left-aligned unconsumed bits; bits below nbits are 0
  int nbits;           // count of REAL bits in acc (zero fill is virtual)
  int pending_marker;  // 0 = none; 0xD9 synthesized at EOF
  bool insufficient;   // latched: a bit request ran past the segment's data

  static inline bool has_ff(uint64_t v) {
    uint64_t t = v ^ 0xFFFFFFFFFFFFFFFFull;  // FF bytes -> 00
    return ((t - 0x0101010101010101ull) & ~t
            & 0x8080808080808080ull) != 0;
  }

  // Append REAL bytes only — never zero-fills.  Stops after consuming a
  // marker (its FF fill run + code byte) into pending_marker, or at EOF.
  void fill() {
    if (pending_marker) return;
    // fast path: next 8 bytes contain no 0xFF (no stuffing, no marker) —
    // bulk-insert as many whole bytes as fit
    if (nbits <= 56 && pos + 8 <= size) {
      uint64_t chunk;
      memcpy(&chunk, data + pos, 8);
      if (!has_ff(chunk)) {
        uint64_t bs = __builtin_bswap64(chunk);
        int k = (64 - nbits) >> 3;
        acc |= (bs >> nbits) & (~0ull << (64 - nbits - 8 * k));
        pos += k;
        nbits += 8 * k;
        return;
      }
    }
    while (nbits <= 56) {
      if (pos >= size) {
        pending_marker = 0xD9;  // fake EOI, like fill_mem_input_buffer
        return;
      }
      uint8_t b = data[pos];
      if (b == 0xFF) {
        int64_t p = pos + 1;
        while (p < size && data[p] == 0xFF) p++;  // FF fill bytes skipped
        if (p >= size) {
          pos = size;
          pending_marker = 0xD9;
          return;
        }
        if (data[p] == 0x00) {  // stuffed data FF
          pos = p + 1;
          acc |= (uint64_t)0xFF << (56 - nbits);
          nbits += 8;
        } else {  // a real marker: consume it, stop feeding
          pending_marker = data[p];
          pos = p + 1;
          return;
        }
      } else {
        pos++;
        acc |= (uint64_t)b << (56 - nbits);
        nbits += 8;
      }
    }
  }

  // plain peek/skip: caller guarantees nbits >= n
  inline uint32_t peek(int n) { return (uint32_t)(acc >> (64 - n)); }
  inline void skip(int n) {
    acc <<= n;
    nbits -= n;
  }

  // CHECK_BIT_BUFFER(n) + GET_BITS(n) with libjpeg's corrupt-stream
  // semantics: the request is the latch granularity, and a short read is
  // padded with zero bits (get_buffer <<= MIN_GET_BITS - bits_left).
  uint32_t get_exact(int n) {
    if (n == 0) return 0;
    if (nbits < n) {
      fill();
      if (nbits < n) {
        insufficient = true;
        uint32_t v = (uint32_t)(acc >> (64 - n));  // low bits auto-zero
        acc <<= n;
        nbits = 0;
        return v;
      }
    }
    uint32_t v = (uint32_t)(acc >> (64 - n));
    acc <<= n;
    nbits -= n;
    return v;
  }

  inline uint32_t get_bits(int n) {
    if (n == 0) return 0;
    if (nbits >= n) {
      uint32_t v = peek(n);
      skip(n);
      return v;
    }
    return get_exact(n);
  }

  // process_restart discard (jdhuff.c: bits_left = 0)
  inline void discard_bits() {
    acc = 0;
    nbits = 0;
  }
};

// jdmarker.c next_marker(): skip garbage bytes to the next FF-prefixed
// marker code; FF 00 is stuffed data (keep scanning), runs of FF are fill
// bytes; EOF yields the fake EOI that fill_mem_input_buffer synthesizes.
void next_marker(BitReader& br) {
  while (br.pos < br.size) {
    uint8_t c = br.data[br.pos++];
    if (c != 0xFF) continue;
    while (br.pos < br.size && br.data[br.pos] == 0xFF) br.pos++;
    if (br.pos >= br.size) break;
    c = br.data[br.pos++];
    if (c != 0) {
      br.pending_marker = c;
      return;
    }
  }
  br.pos = br.size;
  br.pending_marker = 0xD9;
}

// jdhuff.c process_restart() + jdmarker.c read_restart_marker() with the
// default jpeg_resync_to_restart() policy, tracking the expected RSTn —
// this is what lets a decode resynchronize after a corrupted restart row
// exactly like libjpeg (the row decodes to deterministic garbage, later
// rows recover bit-identically).
void process_restart(BitReader& br, int& next_restart_num) {
  br.discard_bits();
  if (br.pending_marker == 0) next_marker(br);
  if (br.pending_marker == 0xD0 + next_restart_num) {
    br.pending_marker = 0;  // normal case: swallow the marker
  } else {
    int desired = next_restart_num;
    for (;;) {
      int marker = br.pending_marker;
      int action;
      if (marker < 0xC0) {
        action = 2;  // invalid marker: skip it
      } else if (marker < 0xD0 || marker > 0xD7) {
        action = 3;  // valid non-restart marker (e.g. EOI): stop consuming
      } else if (marker == 0xD0 + ((desired + 1) & 7) ||
                 marker == 0xD0 + ((desired + 2) & 7)) {
        action = 3;  // one of the next two expected: assume RSTn was lost
      } else if (marker == 0xD0 + ((desired - 1) & 7) ||
                 marker == 0xD0 + ((desired - 2) & 7)) {
        action = 2;  // a prior restart: advance past the duplicate
      } else {
        action = 1;  // the desired restart (or too far away): take it
      }
      if (action == 1) {
        br.pending_marker = 0;
        break;
      }
      if (action == 2) {
        next_marker(br);
        continue;
      }
      break;  // action 3: return without discarding the marker
    }
  }
  next_restart_num = (next_restart_num + 1) & 7;
  br.insufficient = false;  // jdhuff.c: insufficient_data = FALSE
}

// jpeg_make_d_derived_tbl's stream-rejecting checks (jdhuff.c): the
// canonical code space must not overflow any length (no code of all
// ones), and DC tables may only carry symbols 0..15; violations reject
// the stream (JERR_BAD_HUFF_TABLE).
bool validate_dec_table(const uint8_t* bits, const uint8_t* vals,
                        bool is_dc) {
  int code = 0, k = 0;
  for (int len = 1; len <= 16; len++) {
    code += bits[len - 1];
    if (code >= (1 << len)) return false;
    k += bits[len - 1];
    code <<= 1;
  }
  if (k > 256) return false;
  if (is_dc) {
    for (int i = 0; i < k; i++) {
      if (vals[i] > 15) return false;
    }
  }
  return true;
}

inline int huff_extend(int v, int s) {
  return (v < (1 << (s - 1))) ? v - (1 << s) + 1 : v;
}

// Huffman-decode one symbol, bit-exact to jdhuff.c HUFF_DECODE +
// jpeg_huff_decode on corrupt streams too: an invalid code consumes
// exactly 17 bits and yields symbol 0 (JWRN_HUFF_BAD_CODE), and requests
// past a marker latch `insufficient` at libjpeg's request granularity
// before being satisfied with zero bits.
int decode_symbol(BitReader& br, const DecTable& t) {
  if (br.nbits < 17) br.fill();
  if (br.nbits >= 17) {  // the latch cannot fire within this symbol
    uint32_t look = br.peek(10);
    if (t.look_len[look]) {
      br.skip(t.look_len[look]);
      return t.look_sym[look];
    }
    int code = (int)br.peek(16);
    for (int len = 11; len <= 16; len++) {
      int c = code >> (16 - len);
      if (t.maxcode[len] >= 0 && c <= t.maxcode[len] &&
          c >= t.mincode[len]) {
        br.skip(len);
        return t.values[(t.valptr[len] + (c - t.mincode[len])) & 0xFF];
      }
    }
    br.skip(17);
    return 0;  // JWRN_HUFF_BAD_CODE: fake a zero, keep decoding
  }
  // tail path near a marker/EOF: walk bit-by-bit (T.81 Figure F.16) so
  // the insufficient-data latch fires at exactly libjpeg's request
  int code = 0;
  for (int len = 1; len <= 16; len++) {
    code = (code << 1) | (int)br.get_exact(1);
    if (t.maxcode[len] >= 0 && code <= t.maxcode[len] &&
        code >= t.mincode[len]) {
      return t.values[(t.valptr[len] + (code - t.mincode[len])) & 0xFF];
    }
  }
  br.get_exact(1);  // 17th bit of the sentinel walk (jpeg_huff_decode)
  return 0;
}

}  // namespace

// Decode one interleaved baseline scan into zigzag coeff arrays (padded to
// full MCUs, caller-allocated and zero-initialized).  Returns bytes consumed
// from `data` (pointing at the byte after the last entropy byte consumed),
// or -1 on invalid code, -2 on bad args.
int64_t uhdr_decode_scan(const uint8_t* data, int64_t size,
                         int16_t** out_coeffs, const int32_t* comp_meta,
                         int num_comps, int mcus_w, int mcus_h,
                         int restart_interval, const uint8_t* dc_bits,
                         const uint8_t* dc_vals, const uint8_t* ac_bits,
                         const uint8_t* ac_vals) {
  if (num_comps < 1 || num_comps > 4) return -2;
  DecTable dc_t[4], ac_t[4];
  for (int i = 0; i < 4; i++) {
    build_dec_table(dc_bits + 16 * i, dc_vals + 256 * i, &dc_t[i]);
    build_dec_table(ac_bits + 16 * i, ac_vals + 256 * i, &ac_t[i]);
  }
  const CompMeta* cm = (const CompMeta*)comp_meta;

  // libjpeg parity: tables referenced by the scan must pass the derived-
  // table validation or the stream is rejected (jpeg_make_d_derived_tbl);
  // table ids outside 0..3 are JERR_NO_HUFF_TABLE (also guards dc_t[4]).
  for (int ci = 0; ci < num_comps; ci++) {
    if (cm[ci].dc_tbl < 0 || cm[ci].dc_tbl > 3 || cm[ci].ac_tbl < 0 ||
        cm[ci].ac_tbl > 3) {
      return -5;
    }
    if (!validate_dec_table(dc_bits + 16 * cm[ci].dc_tbl,
                            dc_vals + 256 * cm[ci].dc_tbl, true) ||
        !validate_dec_table(ac_bits + 16 * cm[ci].ac_tbl,
                            ac_vals + 256 * cm[ci].ac_tbl, false)) {
      return -5;
    }
  }

  BitReader br{data, size, 0, 0, 0, 0, false};
  int last_dc[4] = {0, 0, 0, 0};
  int mcus_since_restart = 0;
  int next_restart_num = 0;

  for (int my = 0; my < mcus_h; my++) {
    for (int mx = 0; mx < mcus_w; mx++) {
      if (restart_interval > 0 && mcus_since_restart == restart_interval) {
        process_restart(br, next_restart_num);
        mcus_since_restart = 0;
        for (int i = 0; i < 4; i++) last_dc[i] = 0;
      }
      // jdhuff.c decode_mcu: once the data ran out, leave whole MCUs as
      // zeroes (uniform gray) until a restart resets the latch
      if (!br.insufficient) {
        for (int ci = 0; ci < num_comps; ci++) {
          const CompMeta& c = cm[ci];
          const DecTable& dct = dc_t[c.dc_tbl];
          const DecTable& act = ac_t[c.ac_tbl];
          for (int by = 0; by < c.v; by++) {
            for (int bx = 0; bx < c.h; bx++) {
              int row = my * c.v + by;
              int col = mx * c.h + bx;
              int16_t* blk =
                  out_coeffs[ci] + ((int64_t)row * c.bw + col) * 64;
              int s = decode_symbol(br, dct);  // DC symbols 0..15 validated
              int diff = s ? huff_extend((int)br.get_bits(s), s) : 0;
              last_dc[ci] += diff;
              blk[0] = (int16_t)last_dc[ci];
              int kk = 1;
              while (kk < 64) {
                int rs = decode_symbol(br, act);
                int r = rs >> 4, sz = rs & 15;
                if (sz == 0) {
                  if (r == 15) {
                    kk += 16;  // ZRL
                    continue;
                  }
                  break;  // EOB (bad-code fake zeros land here too)
                }
                kk += r;
                // corrupt runs past the block clobber coefficient 63,
                // matching libjpeg's extended jpeg_natural_order[] entries
                blk[kk < 64 ? kk : 63] =
                    (int16_t)huff_extend((int)br.get_bits(sz), sz);
                kk++;
              }
            }
          }
        }
      }
      mcus_since_restart++;
    }
  }
  return br.pos;
}

// ---------------------------------------------------------------------------
// Progressive scan decode (T.81 G.2, successive approximation + spectral
// selection), one call per SOS.  Python walks the segment structure and
// passes each scan's entropy data; coefficient arrays accumulate in place.
//
// scan_meta per scan component: {comp_index, dc_tbl, ac_tbl, sbw, sbh}
// where sbw/sbh are the component's non-interleaved block dims
// (ceil(ceil(w*h_i/hmax)/8)); comp_meta per image component as in
// uhdr_decode_scan (bw = full MCU-padded row stride).
int64_t uhdr_decode_progressive_scan(
    const uint8_t* data, int64_t size, int16_t** coeffs,
    const int32_t* comp_meta, int num_comps_image, const int32_t* scan_meta,
    int num_comps_scan, int ss, int se, int ah, int al, int mcus_w,
    int mcus_h, int restart_interval, const uint8_t* dc_bits,
    const uint8_t* dc_vals, const uint8_t* ac_bits, const uint8_t* ac_vals) {
  if (num_comps_scan < 1 || num_comps_scan > 4) return -2;
  if (ss < 0 || se > 63 || ss > se) return -2;
  if (ss > 0 && num_comps_scan != 1) return -2;
  DecTable dc_t[4], ac_t[4];
  for (int i = 0; i < 4; i++) {
    build_dec_table(dc_bits + 16 * i, dc_vals + 256 * i, &dc_t[i]);
    build_dec_table(ac_bits + 16 * i, ac_vals + 256 * i, &ac_t[i]);
  }
  const CompMeta* cm = (const CompMeta*)comp_meta;
  struct ScanComp {
    int idx, dc_tbl, ac_tbl, sbw, sbh;
  };
  const ScanComp* sc = (const ScanComp*)scan_meta;
  for (int i = 0; i < num_comps_scan; i++) {
    if (sc[i].idx < 0 || sc[i].idx >= num_comps_image) return -2;
    // libjpeg parity (jdphuff.c start_pass_phuff_decoder): only the
    // tables a scan actually uses are derived/validated — DC tables for
    // a DC-first scan, the AC table for AC scans, nothing for DC refine
    if (ss == 0 && ah == 0) {
      if (sc[i].dc_tbl < 0 || sc[i].dc_tbl > 3 ||
          !validate_dec_table(dc_bits + 16 * sc[i].dc_tbl,
                              dc_vals + 256 * sc[i].dc_tbl, true)) {
        return -5;
      }
    } else if (ss > 0) {
      if (sc[i].ac_tbl < 0 || sc[i].ac_tbl > 3 ||
          !validate_dec_table(ac_bits + 16 * sc[i].ac_tbl,
                              ac_vals + 256 * sc[i].ac_tbl, false)) {
        return -5;
      }
    }
  }

  BitReader br{data, size, 0, 0, 0, 0, false};
  int pred[4] = {0, 0, 0, 0};
  uint32_t eobrun = 0;
  int mcus_since_restart = 0;
  int next_restart_num = 0;
  const int p1 = 1 << al;
  const int m1 = -(1 << al);

  // total "MCU" count: interleaved uses the image grid; a non-interleaved
  // scan's MCU is one block of that component (T.81 G.2.4)
  bool interleaved = num_comps_scan > 1;
  int total_w = interleaved ? mcus_w : sc[0].sbw;
  int total_h = interleaved ? mcus_h : sc[0].sbh;

  auto restart_if_due = [&]() {
    if (restart_interval > 0 && mcus_since_restart == restart_interval) {
      process_restart(br, next_restart_num);  // jdphuff.c process_restart
      for (int i = 0; i < 4; i++) pred[i] = 0;
      eobrun = 0;
      mcus_since_restart = 0;
    }
  };

  auto decode_dc_block = [&](int16_t* blk, int c) -> bool {
    if (ah == 0) {
      int s = decode_symbol(br, dc_t[sc[c].dc_tbl]);
      int diff = s ? huff_extend((int)br.get_bits(s), s) : 0;
      pred[c] += diff;
      blk[0] = (int16_t)(pred[c] * p1);
    } else {
      if (br.get_bits(1)) blk[0] = (int16_t)(blk[0] | p1);
    }
    return true;
  };

  auto decode_ac_first = [&](int16_t* blk) -> bool {
    if (eobrun > 0) {
      eobrun--;
      return true;
    }
    int k = ss;
    while (k <= se) {
      int rs = decode_symbol(br, ac_t[sc[0].ac_tbl]);
      int r = rs >> 4, s = rs & 15;
      if (s == 0) {
        if (r == 15) {
          k += 16;
          continue;
        }
        eobrun = (1u << r) - 1;
        if (r) eobrun += br.get_bits(r);
        break;
      }
      k += r;
      // corrupt runs past the band clobber position min(k, 63), matching
      // libjpeg's extended jpeg_natural_order[] entries (jdphuff.c)
      blk[k < 64 ? k : 63] =
          (int16_t)(huff_extend((int)br.get_bits(s), s) * p1);
      k++;
    }
    return true;
  };

  auto refine_nonzero = [&](int16_t* blk, int k) {
    // correction bit for an already-nonzero coefficient (G.1.2.3)
    if (br.get_bits(1)) {
      if ((blk[k] & p1) == 0) {
        blk[k] = (int16_t)(blk[k] + (blk[k] >= 0 ? p1 : m1));
      }
    }
  };

  auto decode_ac_refine = [&](int16_t* blk) -> bool {
    // T.81 G.1.2.3 successive-approximation AC refinement.  Note the EOB
    // run here counts the CURRENT block too (set to 1<<r, decremented by
    // the tail-correction pass below), unlike the first-scan encoding.
    int k = ss;
    if (eobrun == 0) {
      while (k <= se) {
        int rs = decode_symbol(br, ac_t[sc[0].ac_tbl]);
        int r = rs >> 4, s = rs & 15;
        int newval = 0;
        if (s == 0) {
          if (r != 15) {
            eobrun = 1u << r;
            if (r) eobrun += br.get_bits(r);
            break;
          }
          // r == 15: ZRL — skip 16 zero-history positions
        } else {
          // jdphuff.c: s != 1 is only a JWRN_HUFF_BAD_CODE warning; the
          // sign bit is read and the coefficient treated as size 1
          newval = br.get_bits(1) ? p1 : m1;
        }
        while (k <= se) {
          if (blk[k] != 0) {
            refine_nonzero(blk, k);
          } else {
            if (--r < 0) break;
          }
          k++;
        }
        // on corrupt data k may run past the band; libjpeg still writes
        // the new coefficient via the extended natural-order table
        if (newval) blk[k < 64 ? k : 63] = (int16_t)newval;
        k++;
      }
    }
    if (eobrun > 0) {
      while (k <= se) {
        if (blk[k] != 0) refine_nonzero(blk, k);
        k++;
      }
      eobrun--;
    }
    return true;
  };

  for (int my = 0; my < total_h; my++) {
    for (int mx = 0; mx < total_w; mx++) {
      restart_if_due();
      // jdphuff.c: if we've run out of data, don't modify the MCU
      if (!br.insufficient) {
        if (interleaved) {
          for (int c = 0; c < num_comps_scan; c++) {
            const CompMeta& m = cm[sc[c].idx];
            for (int by = 0; by < m.v; by++) {
              for (int bx = 0; bx < m.h; bx++) {
                int row = my * m.v + by, col = mx * m.h + bx;
                int16_t* blk =
                    coeffs[sc[c].idx] + ((int64_t)row * m.bw + col) * 64;
                if (ss == 0) {
                  if (!decode_dc_block(blk, c)) return -3;
                }
              }
            }
          }
        } else {
          const CompMeta& m = cm[sc[0].idx];
          int16_t* blk = coeffs[sc[0].idx] + ((int64_t)my * m.bw + mx) * 64;
          if (ss == 0) {
            if (!decode_dc_block(blk, 0)) return -3;
          } else if (ah == 0) {
            if (!decode_ac_first(blk)) return -3;
          } else {
            if (!decode_ac_refine(blk)) return -3;
          }
        }
      }
      mcus_since_restart++;
    }
  }
  return br.pos;
}

}  // extern "C"

// Extract one 10-bit channel of packed RGBA1010102 into u16 samples
// (the RGB upload wire's channel split; numpy's shift-and costs ~60 ms
// per 12 MP channel, this runs at memory speed).
extern "C" void uhdr_extract_channel10(const uint32_t* in, int64_t n,
                                       int shift, uint16_t* out) {
  int64_t i = 0;
#if defined(__AVX2__)
  const __m256i m = _mm256_set1_epi32(1023);
  const __m128i sh = _mm_cvtsi32_si128(shift);
  for (; i + 16 <= n; i += 16) {
    __m256i a = _mm256_and_si256(
        _mm256_srl_epi32(_mm256_loadu_si256((const __m256i*)(in + i)), sh),
        m);
    __m256i b = _mm256_and_si256(
        _mm256_srl_epi32(
            _mm256_loadu_si256((const __m256i*)(in + i + 8)), sh),
        m);
    // packus works per 128-lane; permute4x64 restores sample order
    __m256i p = _mm256_permute4x64_epi64(_mm256_packus_epi32(a, b), 0xD8);
    _mm256_storeu_si256((__m256i*)(out + i), p);
  }
#endif
  for (; i < n; i++) out[i] = (uint16_t)((in[i] >> shift) & 1023u);
}
