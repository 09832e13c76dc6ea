// Native host codec for inverted_index_2_tpu.
//
// Implements the exact posting-block layout of codec/packing.py (delta +
// per-block horizontal bit-packing, blocks of 128, self-delimiting) as tight
// scalar C++ for the HOST side of the pipeline: segment writing (merge
// output encode) and bulk decode feeding the vectorized merge. The reference
// gets this layer from the Go library `ronanh/intcomp`
// (/root/reference/file/writer.go:49, reader.go:100); the device side uses
// the Pallas/XLA decoder in ops/decode.py over the same bytes.
//
// ABI: plain C functions, loaded via ctypes (codec/native.py). All offsets
// are in 32-bit words. Thread-safe (no globals); release the GIL around
// calls from Python.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

constexpr int64_t kBlock = 128;

inline int bit_length(uint32_t x) { return x ? 32 - __builtin_clz(x) : 0; }

inline int64_t packed_words(int64_t n_blk, int64_t b) {
  int64_t nd = n_blk > 0 ? n_blk - 1 : 0;
  return (nd * b + 31) / 32;
}

// Width of the largest (delta - 1) in values[s .. s+n_blk) (relative deltas).
// byte_align: 0 = exact bits (disk codec), 1 = whole bytes {8,16,24,32},
// 2 = power-of-two bytes {8,16,32} (device arena: the 24-bit class has no
// repeat-friendly lane layout in Mosaic, so the Pallas decoder excludes it).
inline int block_width(const uint32_t* v, int64_t n_blk, int32_t byte_align) {
  uint32_t maxd = 0;
  for (int64_t j = 0; j + 1 < n_blk; ++j) {
    maxd |= v[j + 1] - v[j] - 1;  // OR keeps the max bit width
  }
  int b = bit_length(maxd);
  if (byte_align && b > 0) {
    b = (b + 7) / 8 * 8;
    if (byte_align >= 2 && b == 24) b = 32;
  }
  return b;
}

}  // namespace

// Shared set-op / block-stream helpers (used by the decode entry points
// below and the batched boolean serving routines further down).
namespace {

// Merge-union of two sorted-unique runs into dst (sized na+nb). Returns the
// written count. Inputs may share values (main/delta tier overlap; cross-run
// duplicates emit once). BRANCHLESS inner loop: the three-way compare of a
// textbook merge mispredicts ~50% on independent posting sets (measured to
// dominate the OR serve); writing min(a, b) and advancing each side by its
// own <= flag compiles to cmov/setcc with no data-dependent branch — and
// advancing BOTH sides on equality is exactly the dedupe.
int64_t union2(const uint32_t* a, int64_t na, const uint32_t* b, int64_t nb,
               uint32_t* dst) {
  int64_t i = 0, j = 0, m = 0;
  while (i < na && j < nb) {
    const uint32_t x = a[i], y = b[j];
    const int64_t ta = x <= y, tb = y <= x;
    dst[m++] = ta ? x : y;
    i += ta;
    j += tb;
  }
  while (i < na) dst[m++] = a[i++];
  while (j < nb) dst[m++] = b[j++];
  return m;
}

// Intersection of two sorted-unique runs into dst (sized min(na, nb)).
// Galloping (search the long run from a moving lower bound) when the
// lengths are skewed; two-pointer otherwise.
int64_t intersect2(const uint32_t* a, int64_t na, const uint32_t* b,
                   int64_t nb, uint32_t* dst) {
  if (na > nb) {
    std::swap(a, b);
    std::swap(na, nb);
  }
  int64_t m = 0;
  if (nb > 8 * na) {
    const uint32_t* lo = b;
    const uint32_t* end = b + nb;
    for (int64_t i = 0; i < na; ++i) {
      lo = std::lower_bound(lo, end, a[i]);
      if (lo == end) break;
      if (*lo == a[i]) dst[m++] = a[i];
    }
  } else {
    // branchless two-pointer (see union2): unconditional store at m,
    // m advances only on equality
    int64_t i = 0, j = 0;
    while (i < na && j < nb) {
      const uint32_t x = a[i], y = b[j];
      dst[m] = x;
      m += x == y;
      i += x <= y;
      j += y <= x;
    }
  }
  return m;
}

struct Run {
  const uint32_t* p;
  int64_t n;
};

#if defined(__AVX512F__)
// Compare-exchange clean of a BITONIC 16-lane u32 sequence (4 stages,
// stride 8/4/2/1): lane i keeps min when (i & stride) == 0, max otherwise.
inline __m512i bitonic_clean16(__m512i v) {
  static const __m512i i8 = _mm512_setr_epi32(8, 9, 10, 11, 12, 13, 14, 15,
                                              0, 1, 2, 3, 4, 5, 6, 7);
  static const __m512i i4 = _mm512_setr_epi32(4, 5, 6, 7, 0, 1, 2, 3,
                                              12, 13, 14, 15, 8, 9, 10, 11);
  static const __m512i i2 = _mm512_setr_epi32(2, 3, 0, 1, 6, 7, 4, 5,
                                              10, 11, 8, 9, 14, 15, 12, 13);
  static const __m512i i1 = _mm512_setr_epi32(1, 0, 3, 2, 5, 4, 7, 6,
                                              9, 8, 11, 10, 13, 12, 15, 14);
  __m512i p = _mm512_permutexvar_epi32(i8, v);
  v = _mm512_mask_blend_epi32(0xFF00, _mm512_min_epu32(v, p),
                              _mm512_max_epu32(v, p));
  p = _mm512_permutexvar_epi32(i4, v);
  v = _mm512_mask_blend_epi32(0xF0F0, _mm512_min_epu32(v, p),
                              _mm512_max_epu32(v, p));
  p = _mm512_permutexvar_epi32(i2, v);
  v = _mm512_mask_blend_epi32(0xCCCC, _mm512_min_epu32(v, p),
                              _mm512_max_epu32(v, p));
  p = _mm512_permutexvar_epi32(i1, v);
  v = _mm512_mask_blend_epi32(0xAAAA, _mm512_min_epu32(v, p),
                              _mm512_max_epu32(v, p));
  return v;
}
#endif

// Duplicate-KEEPING merge of two sorted runs (each may itself contain
// duplicates) — the OR reduction's level merge. Cross-run dedupe is
// deferred to the single output pass (measured: config-3 unions are ~0.1%
// duplicates, so carrying them is free and the merge core stays branch-
// free). AVX-512 path: classic 16-lane bitonic merge network — reverse one
// register, min/max gives the bitonic halves, clean each (the emitted low
// half is provably <= every unloaded element: all 16 loaded from the other
// run would have to be smaller, and they are already loaded). Scalar
// fallback/tails: branchless two-pointer emitting one side on ties.
int64_t merge2_dups(const uint32_t* a, int64_t na, const uint32_t* b,
                    int64_t nb, uint32_t* dst) {
  int64_t i = 0, j = 0, m = 0;
#if defined(__AVX512F__)
  if (na >= 16 && nb >= 16) {
    static const __m512i rev = _mm512_setr_epi32(
        15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0);
    __m512i va = _mm512_loadu_si512(a);
    __m512i vb = _mm512_loadu_si512(b);
    i = 16;
    j = 16;
    while (true) {
      const __m512i br = _mm512_permutexvar_epi32(rev, vb);
      const __m512i lo = bitonic_clean16(_mm512_min_epu32(va, br));
      const __m512i hi = bitonic_clean16(_mm512_max_epu32(va, br));
      _mm512_storeu_si512(dst + m, lo);
      m += 16;
      va = hi;
      if (i + 16 <= na && j + 16 <= nb) {
        if (a[i] <= b[j]) {
          vb = _mm512_loadu_si512(a + i);
          i += 16;
        } else {
          vb = _mm512_loadu_si512(b + j);
          j += 16;
        }
      } else {
        break;
      }
    }
    // spill the held register and three-way merge it with both tails
    alignas(64) uint32_t vbuf[16];
    _mm512_storeu_si512(vbuf, va);
    int64_t x = 0;
    while (x < 16 && i < na && j < nb) {
      const uint32_t vx = vbuf[x], ya = a[i], yb = b[j];
      if (vx <= ya && vx <= yb) {
        dst[m++] = vx;
        ++x;
      } else if (ya <= yb) {
        dst[m++] = ya;
        ++i;
      } else {
        dst[m++] = yb;
        ++j;
      }
    }
    while (x < 16 && i < na) {
      const uint32_t vx = vbuf[x], ya = a[i];
      const int64_t t = vx <= ya;
      dst[m++] = t ? vx : ya;
      x += t;
      i += !t;
    }
    while (x < 16 && j < nb) {
      const uint32_t vx = vbuf[x], yb = b[j];
      const int64_t t = vx <= yb;
      dst[m++] = t ? vx : yb;
      x += t;
      j += !t;
    }
    while (x < 16) dst[m++] = vbuf[x++];
  }
#endif
  while (i < na && j < nb) {
    const uint32_t x = a[i], y = b[j];
    const int64_t ta = x <= y;
    dst[m++] = ta ? x : y;
    i += ta;
    j += !ta;
  }
  while (i < na) dst[m++] = a[i++];
  while (j < nb) dst[m++] = b[j++];
  return m;
}

// Final OR output stage: merge two sorted dup-carrying runs (either may be
// empty), dedupe, optionally tombstone-filter, and write the result straight
// into the caller's output array. This FUSES the last pairwise merge level
// with the dedupe+filter pass — previously the reduction materialized one
// full run and a scalar compare-per-element loop re-read it (the two passes
// were ~45% of the full-result OR serve at config-3: decomposition in
// experiments/or_host_decomp.py). The SIMD path dedupes in-register on emit:
// compare each sorted 16-lane block against itself shifted by one (carrying
// the last emitted value across blocks) and VPCOMPRESSD the kept lanes.
// Returns the count written.
int64_t merge_dedupe_out(const uint32_t* a, int64_t na, const uint32_t* b,
                         int64_t nb, const uint32_t* removed, int64_t R,
                         uint32_t* out) {
  if (na == 0) {
    a = b;
    na = nb;
    b = nullptr;
    nb = 0;
  }
  if (na == 0) return 0;
  int64_t m = 0;
  uint32_t first = (nb > 0 && b[0] < a[0]) ? b[0] : a[0];
  if (R > 0) {
    // tombstone path: fused scalar merge+dedupe+filter (the removed set is
    // bounded by sync-GC; this path is off the idle hot loop)
    const uint32_t* rlo = removed;
    const uint32_t* rend = removed + R;
    int64_t i = 0, j = 0;
    uint32_t prev = ~first;
    while (i < na || j < nb) {
      const uint32_t v =
          (i < na && (j >= nb || a[i] <= b[j])) ? a[i++] : b[j++];
      if (v == prev) continue;
      prev = v;
      rlo = std::lower_bound(rlo, rend, v);
      if (rlo != rend && *rlo == v) continue;
      out[m++] = v;
    }
    return m;
  }
  uint32_t last = ~first;  // != first element so the first always emits
  int64_t i = 0, j = 0;
#if defined(__AVX512F__)
  const auto emit16 = [&](__m512i lo) {
    const __m512i prevv =
        _mm512_alignr_epi32(lo, _mm512_set1_epi32(static_cast<int>(last)), 15);
    const __mmask16 keep = _mm512_cmpneq_epu32_mask(lo, prevv);
    _mm512_mask_compressstoreu_epi32(out + m, keep, lo);
    m += __builtin_popcount(static_cast<unsigned>(keep));
    last = static_cast<uint32_t>(
        _mm_extract_epi32(_mm512_extracti32x4_epi32(lo, 3), 3));
  };
  if (nb >= 16 && na >= 16) {
    // two-run 16-lane bitonic merge (see merge2_dups), emitting each low
    // half through the dedupe-compress store
    static const __m512i rev = _mm512_setr_epi32(
        15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0);
    __m512i va = _mm512_loadu_si512(a);
    __m512i vb = _mm512_loadu_si512(b);
    i = 16;
    j = 16;
    while (true) {
      const __m512i br = _mm512_permutexvar_epi32(rev, vb);
      const __m512i lo = bitonic_clean16(_mm512_min_epu32(va, br));
      const __m512i hi = bitonic_clean16(_mm512_max_epu32(va, br));
      emit16(lo);
      va = hi;
      if (i + 16 <= na && j + 16 <= nb) {
        if (a[i] <= b[j]) {
          vb = _mm512_loadu_si512(a + i);
          i += 16;
        } else {
          vb = _mm512_loadu_si512(b + j);
          j += 16;
        }
      } else {
        break;
      }
    }
    // spill the held register and three-way merge it with both tails
    alignas(64) uint32_t vbuf[16];
    _mm512_storeu_si512(vbuf, va);
    int64_t x = 0;
    while (x < 16 && i < na && j < nb) {
      const uint32_t vx = vbuf[x], ya = a[i], yb = b[j];
      uint32_t v;
      if (vx <= ya && vx <= yb) {
        v = vx;
        ++x;
      } else if (ya <= yb) {
        v = ya;
        ++i;
      } else {
        v = yb;
        ++j;
      }
      out[m] = v;
      m += v != last;
      last = v;
    }
    while (x < 16) {
      const uint32_t* t = (i < na) ? a : b;
      int64_t* ti = (i < na) ? &i : &j;
      const int64_t tn = (i < na) ? na : nb;
      if (*ti < tn && t[*ti] < vbuf[x]) {
        const uint32_t v = t[(*ti)++];
        out[m] = v;
        m += v != last;
        last = v;
      } else {
        const uint32_t v = vbuf[x++];
        out[m] = v;
        m += v != last;
        last = v;
      }
    }
  }
  // one stream left (or SIMD-short inputs): finish the two-pointer part
  // scalar, then stream the sorted remainder 16 lanes at a time
  while (i < na && j < nb) {
    const uint32_t x = a[i], y = b[j];
    const int64_t ta = x <= y;
    const uint32_t v = ta ? x : y;
    i += ta;
    j += !ta;
    out[m] = v;
    m += v != last;
    last = v;
  }
  if (j < nb) {  // at most one side has a remainder; make it `a`
    a = b;
    i = j;
    na = nb;
    j = nb = 0;
  }
  for (; i + 16 <= na; i += 16) emit16(_mm512_loadu_si512(a + i));
  for (; i < na; ++i) {
    const uint32_t v = a[i];
    out[m] = v;
    m += v != last;
    last = v;
  }
#else
  while (i < na && j < nb) {
    const uint32_t x = a[i], y = b[j];
    const int64_t ta = x <= y;
    const uint32_t v = ta ? x : y;
    i += ta;
    j += !ta;
    out[m] = v;
    m += v != last;
    last = v;
  }
  while (i < na) {
    const uint32_t v = a[i++];
    out[m] = v;
    m += v != last;
    last = v;
  }
  while (j < nb) {
    const uint32_t v = b[j++];
    out[m] = v;
    m += v != last;
    last = v;
  }
#endif
  return m;
}

#if defined(__AVX512F__)
// In-register inclusive prefix sum of 16 u32 lanes (4 shift-up + add steps).
inline __m512i scan16_epi32(__m512i x) {
  const __m512i z = _mm512_setzero_si512();
  x = _mm512_add_epi32(x, _mm512_alignr_epi32(x, z, 16 - 1));
  x = _mm512_add_epi32(x, _mm512_alignr_epi32(x, z, 16 - 2));
  x = _mm512_add_epi32(x, _mm512_alignr_epi32(x, z, 16 - 4));
  x = _mm512_add_epi32(x, _mm512_alignr_epi32(x, z, 16 - 8));
  return x;
}
#endif

// Decode ONE block at words[pos] into dst (capacity >= kBlock). Returns
// n_blk and sets *next_pos, or -1 on malformed/truncated input. (The block
// layout of codec/packing.py: [b | n_blk<<8][first][packed deltas].)
//
// Byte-aligned widths (8/16/32 — ALL blocks of the retained serving tables,
// encode_bulk(byte_align=2)) take an AVX-512 path when available: 16 deltas
// zero-extend into one zmm, +1, in-register prefix scan, +running base —
// ~10 instructions per 16 values vs ~6 scalar ops per value. Exact-width
// disk blocks (any b) keep the scalar shift/mask loop.
inline int64_t decode_block(const uint32_t* words, int64_t wlen, int64_t pos,
                            uint32_t* dst, int64_t* next_pos) {
  if (pos + 2 > wlen) return -1;
  const uint32_t header = words[pos];
  const int b = header & 0xFF;
  const int64_t n_blk = (header >> 8) & 0xFF;
  if (n_blk <= 0 || n_blk > kBlock || b > 32) return -1;
  const int64_t np = pos + 2 + packed_words(n_blk, b);
  if (np > wlen) return -1;
  uint32_t cur = words[pos + 1];
  const uint32_t* packed = words + pos + 2;
  dst[0] = cur;
  const int64_t nd = n_blk - 1;
  int64_t j = 0;
  if (b == 0) {
    for (; j < nd; ++j) dst[1 + j] = ++cur;
    *next_pos = np;
    return n_blk;
  }
#if defined(__AVX512F__)
  if (b == 8 || b == 16 || b == 32) {
    // SIMD loads stay inside the packed plane: it is allocated in whole
    // words, so ceil(nd*b/32)*4 bytes >= the nd*(b/8) bytes read below
    const __m512i one = _mm512_set1_epi32(1);
    for (; j + 16 <= nd; j += 16) {
      __m512i d;
      if (b == 8) {
        d = _mm512_cvtepu8_epi32(_mm_loadu_si128(reinterpret_cast<const __m128i*>(
            reinterpret_cast<const uint8_t*>(packed) + j)));
      } else if (b == 16) {
        d = _mm512_cvtepu16_epi32(_mm256_loadu_si256(
            reinterpret_cast<const __m256i*>(
                reinterpret_cast<const uint16_t*>(packed) + j)));
      } else {
        d = _mm512_loadu_si512(packed + j);
      }
      const __m512i s = scan16_epi32(_mm512_add_epi32(d, one));
      _mm512_storeu_si512(dst + 1 + j,
                          _mm512_add_epi32(s, _mm512_set1_epi32(cur)));
      cur = dst[16 + j];
    }
    if (b == 8) {
      const uint8_t* src = reinterpret_cast<const uint8_t*>(packed);
      for (; j < nd; ++j) dst[1 + j] = cur += src[j] + 1u;
    } else if (b == 16) {
      const uint16_t* src = reinterpret_cast<const uint16_t*>(packed);
      for (; j < nd; ++j) dst[1 + j] = cur += src[j] + 1u;
    } else {
      for (; j < nd; ++j) dst[1 + j] = cur += packed[j] + 1u;
    }
    *next_pos = np;
    return n_blk;
  }
#endif
  {
    const uint64_t mask = (b == 32) ? 0xFFFFFFFFull : ((1ull << b) - 1);
    int64_t bitpos = static_cast<int64_t>(j) * b;
    for (; j < nd; ++j, bitpos += b) {
      const int64_t w0 = bitpos >> 5;
      const int s = bitpos & 31;
      uint64_t window = packed[w0];
      if (s + b > 32) window |= static_cast<uint64_t>(packed[w0 + 1]) << 32;
      cur += static_cast<uint32_t>((window >> s) & mask) + 1;
      dst[1 + j] = cur;
    }
  }
  *next_pos = np;
  return n_blk;
}

// Decode a whole list at words[start] ([count][blocks...]) into dst
// (capacity >= words[start], pre-read by the caller). Returns the count,
// or -1 on malformed input.
//
// The n_blk-vs-remaining check MUST happen BEFORE decode_block writes
// (decode consumes UNTRUSTED disk bytes; a corrupt stream whose blocks
// overrun the count word would otherwise scribble up to kBlock-1 values
// past dst's allocation before any post-hoc check could reject it —
// heap corruption that surfaced as a later abort inside XLA's compiler).
inline int64_t decode_list(const uint32_t* words, int64_t wlen, int64_t start,
                           uint32_t* dst) {
  if (start < 0 || start >= wlen) return -1;
  int64_t pos = start + 1;
  const int64_t n = words[start];
  int64_t produced = 0;
  while (produced < n) {
    if (pos < 0 || pos >= wlen) return -1;
    const int64_t n_blk = (words[pos] >> 8) & 0xFF;
    if (produced + n_blk > n) return -1;
    const int64_t k = decode_block(words, wlen, pos, dst + produced, &pos);
    if (k < 0) return -1;
    produced += k;
  }
  return n;
}

// A posting list's block stream (for the streaming intersect).
struct ListCursor {
  const uint32_t* words;
  int64_t wlen;
  int64_t pos;        // next block's word offset
  int64_t remaining;  // values not yet consumed
};

inline bool cursor_init(const uint32_t* words, int64_t wlen, int64_t start,
                        ListCursor* c) {
  if (start < 0 || start >= wlen) return false;
  c->words = words;
  c->wlen = wlen;
  c->pos = start + 1;
  c->remaining = words[start];
  return true;
}

// cur (sorted unique) ∧ one block stream -> dst (capacity >= nc), WITHOUT
// materializing the stream: a block decodes only if its value range can
// intersect cur's remaining window. Block k's max is < block k+1's first
// value (values ascend across blocks), so a whole block skips when the next
// block's first <= cur's smallest unmatched value — and the walk stops at
// the first block past cur's max (every later block starts higher). The
// CPU mirror of the fused Pallas kernel's anchor pruning + early-exit walk
// (ops/pallas_fused.py). Returns the match count, -1 on malformed input.
inline int64_t intersect_stream(const uint32_t* cur, int64_t nc,
                                ListCursor* c, uint32_t* dst,
                                uint32_t* blockbuf) {
  int64_t m = 0, i = 0;
  if (nc == 0) return 0;
  const uint32_t cur_max = cur[nc - 1];
  while (c->remaining > 0 && i < nc) {
    const int64_t pos = c->pos;
    if (pos + 2 > c->wlen) return -1;
    const uint32_t header = c->words[pos];
    const int b = header & 0xFF;
    const int64_t n_blk = (header >> 8) & 0xFF;
    if (n_blk <= 0 || n_blk > kBlock || b > 32 || n_blk > c->remaining)
      return -1;
    const uint32_t first = c->words[pos + 1];
    const int64_t next_pos = pos + 2 + packed_words(n_blk, b);
    if (next_pos > c->wlen) return -1;
    if (first > cur_max) break;  // all later blocks start higher still
    if (c->remaining > n_blk) {
      if (next_pos + 2 > c->wlen) return -1;
      const uint32_t next_first = c->words[next_pos + 1];
      if (next_first <= cur[i]) {  // whole block below the next needed value
        c->pos = next_pos;
        c->remaining -= n_blk;
        continue;
      }
    }
    int64_t ignored;
    if (decode_block(c->words, c->wlen, pos, blockbuf, &ignored) != n_blk)
      return -1;
    c->pos = next_pos;
    c->remaining -= n_blk;
    // merge-join the decoded block with cur[i..): skipped cur elements can
    // never match later blocks (those start above this block's values).
    // Branchless (see union2): store unconditionally, advance m on equality
    int64_t j = 0;
    while (j < n_blk && i < nc) {
      const uint32_t x = blockbuf[j], y = cur[i];
      dst[m] = x;
      m += x == y;
      j += x <= y;
      i += y <= x;
    }
  }
  return m;
}

}  // namespace

extern "C" {

// Pass 1: compute per-list word offsets and the total output size.
// outs[T] receives each list's word offset; returns total words, or -1 when
// some list is not strictly increasing (the layout's precondition).
int64_t tpi_encode_bulk_size(const uint32_t* values, const int64_t* voffs,
                             int64_t T, int64_t* outs, int32_t byte_align) {
  int64_t pos = 0;
  for (int64_t t = 0; t < T; ++t) {
    outs[t] = pos;
    const int64_t n = voffs[t + 1] - voffs[t];
    pos += 1;  // count word
    const uint32_t* v = values + voffs[t];
    for (int64_t j = 0; j + 1 < n; ++j) {
      if (v[j + 1] <= v[j]) return -1;
    }
    for (int64_t s = 0; s < n; s += kBlock) {
      const int64_t n_blk = (n - s) < kBlock ? (n - s) : kBlock;
      const int b = block_width(v + s, n_blk, byte_align);
      pos += 2 + packed_words(n_blk, b);
    }
  }
  return pos;
}

// Pass 2: fill the output buffer (sized by pass 1; zero-initialized by caller).
void tpi_encode_bulk_fill(const uint32_t* values, const int64_t* voffs,
                          int64_t T, const int64_t* outs, uint32_t* words,
                          int32_t byte_align) {
  for (int64_t t = 0; t < T; ++t) {
    const int64_t n = voffs[t + 1] - voffs[t];
    const uint32_t* v = values + voffs[t];
    int64_t pos = outs[t];
    words[pos++] = static_cast<uint32_t>(n);
    for (int64_t s = 0; s < n; s += kBlock) {
      const int64_t n_blk = (n - s) < kBlock ? (n - s) : kBlock;
      const int b = block_width(v + s, n_blk, byte_align);
      words[pos] = static_cast<uint32_t>(b) | (static_cast<uint32_t>(n_blk) << 8);
      words[pos + 1] = v[s];
      if (b > 0) {
        // b == 0 (all-consecutive values) has ZERO packed words — the
        // delta loop's read-modify-write `packed[0] |= 0` would touch one
        // word past the allocation when this is the final block (OOB
        // write-back: harmless value-wise but a lost-update race against
        // whatever neighbors the buffer, and a page-fault risk on
        // mmap-backed arrays; caught by ASAN fuzzing, round 5)
        uint32_t* packed = words + pos + 2;
        int64_t bitpos = 0;
        for (int64_t j = 0; j + 1 < n_blk; ++j, bitpos += b) {
          const uint64_t d = v[s + j + 1] - v[s + j] - 1;
          const uint64_t c = d << (bitpos & 31);
          packed[bitpos >> 5] |= static_cast<uint32_t>(c);
          const uint32_t hi = static_cast<uint32_t>(c >> 32);
          if (hi) packed[(bitpos >> 5) + 1] |= hi;
        }
      }
      pos += 2 + packed_words(n_blk, b);
    }
  }
}

// Pass 1 of decode: per-list value counts (reads just the count words).
// words_len bounds all reads and counts are sanity-capped against the
// remaining file size (a block of n_blk<=kBlock values occupies >=2 words),
// so a corrupted _dict offset cannot OOB-read or force a huge value-buffer
// allocation. Returns 0 on success, -1 on an out-of-range offset/count.
int32_t tpi_decode_counts_v2(const uint32_t* words, int64_t words_len,
                             const int64_t* outs, int64_t T, int64_t* counts) {
  for (int64_t t = 0; t < T; ++t) {
    const int64_t pos = outs[t];
    if (pos < 0 || pos >= words_len) return -1;
    const int64_t n = words[pos];
    if (n > (words_len - pos - 1) * (kBlock / 2)) return -1;
    counts[t] = n;
  }
  return 0;
}

// Pass 2 of decode: fill out_values at out_voffs (exclusive prefix sums of
// counts). words_len bounds all reads (decode consumes UNTRUSTED disk bytes;
// decode_list validates every header and extent). Byte-aligned blocks take
// decode_block's SIMD path. Returns 0 on success, -1 on a malformed block.
int32_t tpi_decode_bulk(const uint32_t* words, int64_t words_len,
                        const int64_t* outs, int64_t T,
                        uint32_t* out_values, const int64_t* out_voffs) {
  for (int64_t t = 0; t < T; ++t) {
    if (decode_list(words, words_len, outs[t], out_values + out_voffs[t]) < 0)
      return -1;
  }
  return 0;
}

// Scan block tables (device snapshot builder): for each list, record each
// block's word offset into flat[], laid out per term at tbs[t]..tbs[t+1].
// Validates headers (untrusted bytes) and the flat[] bound; returns 0 on
// success, -1 on malformed input.
int32_t tpi_scan_blocks(const uint32_t* words, int64_t words_len,
                        const int64_t* outs, int64_t T, const int64_t* tbs,
                        int32_t* flat) {
  for (int64_t t = 0; t < T; ++t) {
    int64_t pos = outs[t];
    if (pos < 0 || pos >= words_len) return -1;
    const int64_t n = words[pos++];
    int64_t k = tbs[t];
    const int64_t k_end = tbs[t + 1];
    if (n == 0) {  // one unused slot; zero to match the numpy builder exactly
      if (k < k_end) flat[k] = 0;
      continue;
    }
    int64_t seen = 0;
    while (seen < n) {
      if (pos + 2 > words_len || k >= k_end) return -1;
      const uint32_t header = words[pos];
      const int b = header & 0xFF;
      const int64_t n_blk = (header >> 8) & 0xFF;
      if (n_blk <= 0 || n_blk > kBlock || b > 32) return -1;
      flat[k++] = static_cast<int32_t>(pos);
      seen += n_blk;
      pos += 2 + packed_words(n_blk, b);
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Ingestion sort: order terms by (shard key, term bytes), dedupe exactly.
// Shard key = first 10 bits of the first two bytes; terms shorter than
// 2 bytes route to shard 0 (reference shard.go:362-378 semantics).
// Sorting uses an 8-byte big-endian prefix as the primary key (single
// integer compare for almost all pairs) with full memcmp + length only on
// prefix ties — the scalar-core mirror of the packed-word key design.
// ---------------------------------------------------------------------------

namespace {

struct TermRef {
  uint64_t prefix;  // first 8 bytes, big-endian, zero-padded
  int32_t idx;
  uint16_t shard;
};

inline uint64_t prefix8(const uint8_t* p, int64_t len) {
  if (len >= 8) {  // common case: one unaligned load + byte swap
    uint64_t v;
    std::memcpy(&v, p, 8);
    return __builtin_bswap64(v);
  }
  uint64_t v = 0;
  for (int64_t i = 0; i < len; ++i) v |= static_cast<uint64_t>(p[i]) << (56 - 8 * i);
  return v;
}

}  // namespace

// order[] receives the sorted-unique term indexes; shard_of[] their shard ids
// (aligned with order). Returns the unique count m.
//
// Sort strategy: LSD radix over the 80-bit (shard, 8-byte-prefix) key —
// five stable 16-bit counting passes, O(n) each — then std::sort fixups only
// inside runs whose full key collides (terms sharing their first 8 bytes).
// ~3-4x faster than comparison sorting on typical term data.
int64_t tpi_ingest_sort(const uint8_t* blob, const int64_t* offsets, int64_t n,
                        int32_t* order, uint16_t* shard_of) {
  std::vector<uint64_t> prefix(n);
  std::vector<uint16_t> shard(n);
  std::vector<int32_t> idx(n), tmp(n);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t off = offsets[i];
    const int64_t len = offsets[i + 1] - off;
    const uint8_t* p = blob + off;
    prefix[i] = prefix8(p, len);
    shard[i] = len >= 2 ? static_cast<uint16_t>(((p[0] << 8) | p[1]) >> 6) : 0;
    idx[i] = static_cast<int32_t>(i);
  }
  // five stable LSD passes: prefix bits 0..63 (16 at a time), then shard
  std::vector<int64_t> cnt(65536 + 1);
  auto pass = [&](auto key_of) {
    std::fill(cnt.begin(), cnt.end(), 0);
    for (int64_t i = 0; i < n; ++i) cnt[key_of(idx[i]) + 1]++;
    for (int64_t b = 0; b < 65536; ++b) cnt[b + 1] += cnt[b];
    for (int64_t i = 0; i < n; ++i) tmp[cnt[key_of(idx[i])]++] = idx[i];
    idx.swap(tmp);
  };
  for (int s = 0; s < 64; s += 16) {
    pass([&](int32_t i) { return (prefix[i] >> s) & 0xFFFF; });
  }
  pass([&](int32_t i) { return static_cast<uint64_t>(shard[i]); });

  auto full_cmp = [&](int32_t a, int32_t b) {
    const int64_t la = offsets[a + 1] - offsets[a];
    const int64_t lb = offsets[b + 1] - offsets[b];
    const int64_t m = la < lb ? la : lb;
    const int c =
        std::memcmp(blob + offsets[a], blob + offsets[b], static_cast<size_t>(m));
    if (c) return c;
    return la < lb ? -1 : (la > lb ? 1 : 0);
  };
  // fix ties: runs with equal (shard, prefix) need full-byte ordering
  for (int64_t i = 0; i < n;) {
    int64_t j = i + 1;
    while (j < n && shard[idx[j]] == shard[idx[i]] && prefix[idx[j]] == prefix[idx[i]])
      ++j;
    if (j - i > 1) {
      std::sort(idx.begin() + i, idx.begin() + j,
                [&](int32_t a, int32_t b) { return full_cmp(a, b) < 0; });
    }
    i = j;
  }
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (i > 0 && shard[idx[i]] == shard[idx[i - 1]] &&
        prefix[idx[i]] == prefix[idx[i - 1]] && full_cmp(idx[i], idx[i - 1]) == 0) {
      continue;  // duplicate term
    }
    order[m] = idx[i];
    shard_of[m] = shard[idx[i]];
    ++m;
  }
  return m;
}

// Fused ingest: sort terms by (shard, bytes), dedupe, and gather the sorted
// unique terms into (out_blob, out_offsets) in ONE call. Returns the unique
// count m; fills shard_of[0..m) and out_offsets[0..m]. out_blob must have
// room for offsets[n] bytes (the full input blob size; dedupe only shrinks).
//
// vs tpi_ingest_sort + tpi_concat_terms: the radix passes move whole
// (prefix, idx, shard) records — sequential reads instead of the random
// prefix[idx[i]] gathers — trivial passes (all keys in one bucket, common
// with skewed prefixes / single-shard batches) are skipped, and the concat
// is fused into the dedupe sweep with an inline 16-byte fast copy.
int64_t tpi_ingest_sort_concat(const uint8_t* blob, const int64_t* offsets,
                               int64_t n, uint16_t* shard_of,
                               uint8_t* out_blob, int64_t* out_offsets) {
  struct Rec {
    uint64_t prefix;
    int32_t idx;
    uint16_t shard;
    uint16_t pad;
  };
  std::vector<Rec> a(n), b(n);
  // one sweep: build records + all five 16-bit histograms
  std::vector<int32_t> cnt(5 * 65536, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t off = offsets[i];
    const int64_t len = offsets[i + 1] - off;
    const uint8_t* p = blob + off;
    Rec& r = a[i];
    r.prefix = prefix8(p, len);
    r.shard = len >= 2 ? static_cast<uint16_t>(((p[0] << 8) | p[1]) >> 6) : 0;
    r.idx = static_cast<int32_t>(i);
    r.pad = 0;
    cnt[0 * 65536 + (r.prefix & 0xFFFF)]++;
    cnt[1 * 65536 + ((r.prefix >> 16) & 0xFFFF)]++;
    cnt[2 * 65536 + ((r.prefix >> 32) & 0xFFFF)]++;
    cnt[3 * 65536 + (r.prefix >> 48)]++;
    cnt[4 * 65536 + r.shard]++;
  }
  Rec* src = a.data();
  Rec* dst = b.data();
  for (int p = 0; p < 5; ++p) {
    int32_t* c = cnt.data() + p * 65536;
    const int shift = p * 16;
    // trivial pass: every key in one bucket (stable sort => no-op)
    if (n > 0) {
      const uint64_t k0 =
          p < 4 ? ((src[0].prefix >> shift) & 0xFFFF) : src[0].shard;
      if (c[k0] == n) continue;
    }
    int32_t run = 0;
    for (int64_t k = 0; k < 65536; ++k) {
      const int32_t v = c[k];
      c[k] = run;
      run += v;
    }
    if (p < 4) {
      for (int64_t i = 0; i < n; ++i)
        dst[c[(src[i].prefix >> shift) & 0xFFFF]++] = src[i];
    } else {
      for (int64_t i = 0; i < n; ++i) dst[c[src[i].shard]++] = src[i];
    }
    std::swap(src, dst);
  }
  auto full_cmp = [&](int32_t x, int32_t y) {
    const int64_t lx = offsets[x + 1] - offsets[x];
    const int64_t ly = offsets[y + 1] - offsets[y];
    const int64_t m = lx < ly ? lx : ly;
    const int c =
        std::memcmp(blob + offsets[x], blob + offsets[y], static_cast<size_t>(m));
    if (c) return c;
    return lx < ly ? -1 : (lx > ly ? 1 : 0);
  };
  // fix ties: runs with equal (shard, prefix) need full-byte ordering
  for (int64_t i = 0; i < n;) {
    int64_t j = i + 1;
    while (j < n && src[j].shard == src[i].shard && src[j].prefix == src[i].prefix)
      ++j;
    if (j - i > 1) {
      std::sort(src + i, src + j,
                [&](const Rec& x, const Rec& y) { return full_cmp(x.idx, y.idx) < 0; });
    }
    i = j;
  }
  // dedupe + fused concat
  const int64_t blob_len = offsets[n];
  int64_t m = 0, pos = 0;
  out_offsets[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    const Rec& r = src[i];
    if (i > 0 && r.shard == src[i - 1].shard && r.prefix == src[i - 1].prefix &&
        full_cmp(r.idx, src[i - 1].idx) == 0) {
      continue;  // duplicate term
    }
    const int64_t off = offsets[r.idx];
    const int64_t len = offsets[r.idx + 1] - off;
    if (len <= 16 && off + 16 <= blob_len && pos + 16 <= blob_len) {
      // unconditional 16-byte copy (two unaligned 8B moves); the extra
      // bytes land in slack that the next term overwrites or pos ignores
      // (guards keep both source and destination inside their buffers)
      std::memcpy(out_blob + pos, blob + off, 16);
    } else {
      std::memcpy(out_blob + pos, blob + off, static_cast<size_t>(len));
    }
    pos += len;
    out_offsets[m + 1] = pos;
    shard_of[m] = r.shard;
    ++m;
  }
  return m;
}

// Pack terms (blob, offsets) into (n, W+1) big-endian uint32 key rows:
// W words of 4 term bytes (zero-padded) + the length word — the fixed-width
// bytes.Compare-exact layout of codec/keys.py (numpy twin: pack_blob).
void tpi_pack_keys(const uint8_t* blob, const int64_t* offsets, int64_t n,
                   int64_t W, uint32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t off = offsets[i];
    const int64_t len = offsets[i + 1] - off;
    const uint8_t* p = blob + off;
    uint32_t* row = out + i * (W + 1);
    const int64_t full = len / 4;
    int64_t w = 0;
    for (; w < full && w < W; ++w) {
      uint32_t v;
      std::memcpy(&v, p + w * 4, 4);
      row[w] = __builtin_bswap32(v);
    }
    if (w < W) {
      // partial word: remaining 0-3 bytes, high-aligned
      uint32_t v = 0;
      const int64_t rem = len - w * 4;
      for (int64_t b = 0; b < rem && b < 4; ++b) {
        v |= static_cast<uint32_t>(p[w * 4 + b]) << (24 - 8 * b);
      }
      row[w++] = v;
      for (; w < W; ++w) row[w] = 0;
    }
    row[W] = static_cast<uint32_t>(len);
  }
}

// Gather terms order[0..m) into a packed (out_blob, out_offsets[m+1]) pair.
void tpi_concat_terms(const uint8_t* blob, const int64_t* offsets,
                      const int32_t* order, int64_t m, uint8_t* out_blob,
                      int64_t* out_offsets) {
  int64_t pos = 0;
  out_offsets[0] = 0;
  for (int64_t i = 0; i < m; ++i) {
    const int64_t off = offsets[order[i]];
    const int64_t len = offsets[order[i] + 1] - off;
    std::memcpy(out_blob + pos, blob + off, static_cast<size_t>(len));
    pos += len;
    out_offsets[i + 1] = pos;
  }
}

// Stable lexicographic argsort of packed key rows (N x Wp1 uint32,
// row-major): LSD radix, two 16-bit counting passes per column from the
// least-significant column. Replaces np.lexsort in the merge path
// (the multiword-key analogue of the FST's ordered iteration).
void tpi_sort_key_rows(const uint32_t* keys, int64_t n, int64_t wp1,
                       int32_t* order) {
  std::vector<int32_t> tmp(n);
  for (int64_t i = 0; i < n; ++i) order[i] = static_cast<int32_t>(i);
  std::vector<int64_t> cnt(65536 + 1);
  int32_t* src = order;
  int32_t* dst = tmp.data();
  for (int64_t c = wp1 - 1; c >= 0; --c) {
    for (int shift = 0; shift <= 16; shift += 16) {
      std::fill(cnt.begin(), cnt.end(), 0);
      for (int64_t i = 0; i < n; ++i) {
        const uint32_t v = keys[static_cast<int64_t>(src[i]) * wp1 + c];
        cnt[((v >> shift) & 0xFFFF) + 1]++;
      }
      for (int64_t b = 0; b < 65536; ++b) cnt[b + 1] += cnt[b];
      for (int64_t i = 0; i < n; ++i) {
        const uint32_t v = keys[static_cast<int64_t>(src[i]) * wp1 + c];
        dst[cnt[(v >> shift) & 0xFFFF]++] = src[i];
      }
      std::swap(src, dst);
    }
  }
  // wp1 columns x 2 passes = even number of swaps: result is in `order`
  if (src != order) std::memcpy(order, src, static_cast<size_t>(n) * 4);
}

// Ragged value gather for the merge path: for each list i, copy
// src[starts[i] .. starts[i]+counts[i]) to out and tag each copied element
// with group[i]. Returns total elements written.
int64_t tpi_merge_gather(const uint32_t* src, const int64_t* starts,
                         const int64_t* counts, const int64_t* group,
                         int64_t n_lists, uint32_t* out_vals,
                         int64_t* out_groups) {
  int64_t pos = 0;
  for (int64_t i = 0; i < n_lists; ++i) {
    const int64_t c = counts[i];
    const uint32_t* s = src + starts[i];
    const int64_t g = group[i];
    for (int64_t j = 0; j < c; ++j) {
      out_vals[pos] = s[j];
      out_groups[pos] = g;
      ++pos;
    }
  }
  return pos;
}

// Merge-union core: sort (group, value) pairs, dedupe, drop tombstoned
// values. vals/groups are consumed in place conceptually; results land in
// out_vals/out_groups (caller-sized V). removed must be sorted ascending.
// Returns the kept count. Radix-sorts the packed 64-bit (group<<32 | value)
// key in four stable 16-bit passes.
int64_t tpi_merge_pairs(const uint32_t* vals, const int64_t* groups, int64_t V,
                        const uint32_t* removed, int64_t R,
                        uint32_t* out_vals, int64_t* out_groups) {
  std::vector<uint64_t> key(V), tmp(V);
  for (int64_t i = 0; i < V; ++i) {
    key[i] = (static_cast<uint64_t>(groups[i]) << 32) | vals[i];
  }
  std::vector<int64_t> cnt(65536 + 1);
  uint64_t* src = key.data();
  uint64_t* dst = tmp.data();
  for (int shift = 0; shift < 64; shift += 16) {
    std::fill(cnt.begin(), cnt.end(), 0);
    for (int64_t i = 0; i < V; ++i) cnt[((src[i] >> shift) & 0xFFFF) + 1]++;
    for (int64_t b = 0; b < 65536; ++b) cnt[b + 1] += cnt[b];
    for (int64_t i = 0; i < V; ++i) dst[cnt[(src[i] >> shift) & 0xFFFF]++] = src[i];
    std::swap(src, dst);
  }
  // four passes (even): sorted data is back in key[]
  int64_t m = 0;
  uint64_t prev = ~src[0];  // != src[0]
  for (int64_t i = 0; i < V; ++i) {
    const uint64_t k = src[i];
    if (k == prev) continue;
    prev = k;
    const uint32_t v = static_cast<uint32_t>(k);
    if (R > 0) {
      // branchless-ish binary search in the sorted tombstone set
      int64_t lo = 0, hi = R;
      while (lo < hi) {
        const int64_t mid = (lo + hi) >> 1;
        if (removed[mid] < v) lo = mid + 1; else hi = mid;
      }
      if (lo < R && removed[lo] == v) continue;
    }
    out_vals[m] = v;
    out_groups[m] = static_cast<int64_t>(k >> 32);
    ++m;
  }
  return m;
}

// Ragged byte gather: concatenate src[starts[i] .. starts[i]+lens[i]).
void tpi_gather_bytes(const uint8_t* src, const int64_t* starts,
                      const int64_t* lens, int64_t n, uint8_t* out) {
  int64_t pos = 0;
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + pos, src + starts[i], static_cast<size_t>(lens[i]));
    pos += lens[i];
  }
}

// ---------------------------------------------------------------------------
// Batched boolean set ops over decoded columnar tiers (the host serving
// route, models/query_engine.py boolean_host). The reference serves booleans
// by composing its streaming iterators on the CPU (types.go:14-22 union /
// intersection semantics over reader.go posting streams); this is the same
// architecture with the per-query iterator chain replaced by linear merges
// over the batch-decoded columnar runs.
// ---------------------------------------------------------------------------


// Batched AND/OR over two columnar tiers. Per flat term j: tier presence
// f*[j], postings v*[o*[j] .. o*[j+1]) (sorted unique). koffs[Q+1] maps each
// query to its flat-term range. A term present in both tiers contributes the
// union of its rows; a term present in neither empties an AND and
// contributes nothing to an OR. removed (sorted, may be empty) filters the
// per-query RESULT. is_or: 0 = intersection, 1 = union. Outputs land in
// out_vals (caller-sized to o1[K] + o2[K], the total input volume — results
// only shrink) with exclusive offsets out_offs[Q+1]. Returns the total
// output count.
int64_t tpi_boolean_host(const uint32_t* v1, const int64_t* o1,
                         const uint8_t* f1, const uint32_t* v2,
                         const int64_t* o2, const uint8_t* f2, int32_t dual,
                         const int64_t* koffs, int64_t Q,
                         const uint32_t* removed, int64_t R, int32_t is_or,
                         uint32_t* out_vals, int64_t* out_offs) {
  std::vector<Run> runs, next;
  std::vector<uint32_t> scratch;  // tier-union staging (valid per query)
  std::vector<uint32_t> ping, pong;  // set-op ping-pong buffers
  int64_t w = 0;
  out_offs[0] = 0;
  for (int64_t q = 0; q < Q; ++q) {
    const int64_t k0 = koffs[q], k1 = koffs[q + 1];
    runs.clear();
    bool miss = k0 == k1;  // an empty query is empty under both ops
    int64_t total = 0;
    for (int64_t j = k0; j < k1; ++j) {
      total += (f1[j] ? o1[j + 1] - o1[j] : 0) +
               (dual && f2[j] ? o2[j + 1] - o2[j] : 0);
    }
    if (static_cast<int64_t>(scratch.size()) < total) scratch.resize(total);
    int64_t spos = 0;
    for (int64_t j = k0; j < k1; ++j) {
      const int64_t n1 = f1[j] ? o1[j + 1] - o1[j] : 0;
      const int64_t n2 = dual && f2[j] ? o2[j + 1] - o2[j] : 0;
      if (!f1[j] && !(dual && f2[j])) {
        miss = true;  // term in neither tier
        if (!is_or) break;
        continue;
      }
      if (n1 > 0 && n2 > 0) {
        const int64_t m =
            union2(v1 + o1[j], n1, v2 + o2[j], n2, scratch.data() + spos);
        runs.push_back({scratch.data() + spos, m});
        spos += m;
      } else if (n2 > 0) {
        runs.push_back({v2 + o2[j], n2});
      } else {
        runs.push_back({v1 + o1[j], n1});  // n1 may be 0 (present, empty)
      }
    }
    Run cur{nullptr, 0};
    if (!is_or) {
      if (!miss && !runs.empty()) {
        std::sort(runs.begin(), runs.end(),
                  [](const Run& a, const Run& b) { return a.n < b.n; });
        cur = runs[0];
        if (runs.size() > 1) {
          if (static_cast<int64_t>(ping.size()) < cur.n) ping.resize(cur.n);
          if (static_cast<int64_t>(pong.size()) < cur.n) pong.resize(cur.n);
          uint32_t* dst = ping.data();
          uint32_t* alt = pong.data();
          for (size_t r = 1; r < runs.size() && cur.n > 0; ++r) {
            cur.n = intersect2(cur.p, cur.n, runs[r].p, runs[r].n, dst);
            cur.p = dst;
            std::swap(dst, alt);
          }
        }
      }
    } else if (!runs.empty()) {
      // bottom-up pairwise dup-KEEPING SIMD merges (see merge2_dups) down
      // to TWO runs; the final level runs fused with the dedupe+filter
      // output stage (merge_dedupe_out) straight into out_vals
      if (runs.size() > 2) {
        if (static_cast<int64_t>(ping.size()) < total) ping.resize(total);
        if (static_cast<int64_t>(pong.size()) < total) pong.resize(total);
        uint32_t* arena = ping.data();
        uint32_t* alt = pong.data();
        while (runs.size() > 2) {
          next.clear();
          int64_t pos = 0;
          for (size_t r = 0; r + 1 < runs.size(); r += 2) {
            const int64_t m = merge2_dups(runs[r].p, runs[r].n,
                                          runs[r + 1].p, runs[r + 1].n,
                                          arena + pos);
            next.push_back({arena + pos, m});
            pos += m;
          }
          if (runs.size() & 1) {
            // odd run out: copy into the arena so the next level's writes
            // (into alt) can't alias it
            const Run& last = runs.back();
            std::memcpy(arena + pos, last.p,
                        static_cast<size_t>(last.n) * 4);
            next.push_back({arena + pos, last.n});
            pos += last.n;
          }
          runs.swap(next);
          std::swap(arena, alt);
        }
      }
      const Run r1 = runs.size() > 1 ? runs[1] : Run{nullptr, 0};
      w += merge_dedupe_out(runs[0].p, runs[0].n, r1.p, r1.n, removed, R,
                            out_vals + w);
    }
    if (cur.n > 0) {
      // one output pass: dedupe (a no-op for AND's already-unique results)
      // + tombstone filter
      uint32_t prev = ~cur.p[0];  // != first element
      if (R == 0) {
        for (int64_t i = 0; i < cur.n; ++i) {
          const uint32_t v = cur.p[i];
          if (v == prev) continue;
          prev = v;
          out_vals[w++] = v;
        }
      } else {
        const uint32_t* rlo = removed;
        const uint32_t* rend = removed + R;
        for (int64_t i = 0; i < cur.n; ++i) {
          const uint32_t v = cur.p[i];
          if (v == prev) continue;
          prev = v;
          rlo = std::lower_bound(rlo, rend, v);
          if (rlo != rend && *rlo == v) continue;
          out_vals[w++] = v;
        }
      }
    }
    out_offs[q + 1] = w;
  }
  return w;
}

// Fused batched boolean serving DIRECTLY from the compressed posting
// streams (the retained-tables words arrays): resolve is done by the caller
// (hash probe -> per-flat-term count-word offsets, -1 = miss per tier);
// this routine decodes, set-ops, tombstone-filters, and writes columnar
// results in one pass per query, never materializing a batch-wide decode.
//
// AND walks terms in ascending total-count order: the smallest list decodes
// fully (both tiers union2-merged), every later list streams block-by-block
// through intersect_stream — blocks that provably cannot intersect the
// current candidate set are SKIPPED WITHOUT DECODING, the walk stops at the
// first block past the candidates' max, and an empty intermediate result
// skips every remaining list entirely. intersect(cur, union(t1, t2)) is
// computed as union(intersect(cur, t1), intersect(cur, t2)) so probe tiers
// never materialize either. This is the reference's streaming-iterator
// intersection (types.go:14-22 over reader.go streams) rebuilt around the
// block-anchor geometry of our codec.
//
// OR decodes every present run (the union IS the output; nothing to skip)
// and bottom-up pairwise-merges, with the final merge level writing straight
// into out_vals when no tombstone filter runs.
//
// is_or: 0 = AND, 1 = OR. removed (sorted, may be empty) filters results.
// out_vals must hold the sum of all referenced list counts (results only
// shrink). Returns the total output count, or -1 on malformed input.
int64_t tpi_boolean_serve(const uint32_t* w1, int64_t wlen1,
                          const int64_t* s1, const uint32_t* w2,
                          int64_t wlen2, const int64_t* s2, int32_t dual,
                          const int64_t* koffs, int64_t Q,
                          const uint32_t* removed, int64_t R, int32_t is_or,
                          uint32_t* out_vals, int64_t* out_offs) {
  struct Term {
    int64_t start1, start2;  // -1 = absent in that tier
    int64_t n;               // total values across tiers
  };
  std::vector<Term> terms;
  std::vector<Run> runs, next;
  std::vector<uint32_t> arena;          // OR decode staging / AND base
  std::vector<uint32_t> ping, pong, third;  // AND candidate buffers
  uint32_t blockbuf[kBlock];
  int64_t w = 0;
  out_offs[0] = 0;
  for (int64_t q = 0; q < Q; ++q) {
    const int64_t k0 = koffs[q], k1 = koffs[q + 1];
    terms.clear();
    bool miss = k0 == k1;
    int64_t total = 0;
    for (int64_t j = k0; j < k1; ++j) {
      Term t{s1[j], dual ? s2[j] : -1, 0};
      if (t.start1 < 0 && t.start2 < 0) {
        miss = true;
        if (!is_or) break;
        continue;
      }
      if (t.start1 >= 0) {
        if (t.start1 >= wlen1 ||
            static_cast<int64_t>(w1[t.start1]) >
                (wlen1 - t.start1 - 1) * (kBlock / 2))
          return -1;
        t.n += w1[t.start1];
      }
      if (t.start2 >= 0) {
        if (t.start2 >= wlen2 ||
            static_cast<int64_t>(w2[t.start2]) >
                (wlen2 - t.start2 - 1) * (kBlock / 2))
          return -1;
        t.n += w2[t.start2];
      }
      total += t.n;
      terms.push_back(t);
    }
    Run cur{nullptr, 0};
    if (!is_or) {
      if (!miss && !terms.empty()) {
        std::sort(terms.begin(), terms.end(),
                  [](const Term& a, const Term& b) { return a.n < b.n; });
        // base: full decode of the smallest term, tiers union2-merged
        const Term& base = terms[0];
        const int64_t bn = base.n;
        if (static_cast<int64_t>(arena.size()) < 2 * bn)
          arena.resize(2 * bn);
        if (static_cast<int64_t>(ping.size()) < bn) ping.resize(bn);
        if (static_cast<int64_t>(pong.size()) < bn) pong.resize(bn);
        if (static_cast<int64_t>(third.size()) < bn) third.resize(bn);
        if (base.start1 >= 0 && base.start2 >= 0) {
          const int64_t n1 = decode_list(w1, wlen1, base.start1, arena.data());
          const int64_t n2 =
              decode_list(w2, wlen2, base.start2, arena.data() + n1);
          if (n1 < 0 || n2 < 0) return -1;
          cur.n = union2(arena.data(), n1, arena.data() + n1, n2, ping.data());
          cur.p = ping.data();
        } else {
          const uint32_t* wv = base.start1 >= 0 ? w1 : w2;
          const int64_t wl = base.start1 >= 0 ? wlen1 : wlen2;
          const int64_t st = base.start1 >= 0 ? base.start1 : base.start2;
          cur.n = decode_list(wv, wl, st, ping.data());
          if (cur.n < 0) return -1;
          cur.p = ping.data();
        }
        // probes, smallest-first: streaming intersect, early exit on empty
        uint32_t* bufs[3] = {pong.data(), third.data(), ping.data()};
        int nextbuf = 0;
        for (size_t r = 1; r < terms.size() && cur.n > 0; ++r) {
          const Term& t = terms[r];
          uint32_t* dA = bufs[nextbuf];
          int64_t mA = 0, mB = 0;
          uint32_t* dB = nullptr;
          ListCursor c;
          if (t.start1 >= 0) {
            if (!cursor_init(w1, wlen1, t.start1, &c)) return -1;
            mA = intersect_stream(cur.p, cur.n, &c, dA, blockbuf);
            if (mA < 0) return -1;
          }
          if (t.start2 >= 0) {
            dB = bufs[(nextbuf + 1) % 3];
            if (!cursor_init(w2, wlen2, t.start2, &c)) return -1;
            mB = intersect_stream(cur.p, cur.n, &c, dB, blockbuf);
            if (mB < 0) return -1;
          }
          if (dB != nullptr && mA > 0 && mB > 0) {
            uint32_t* dC = bufs[(nextbuf + 2) % 3];
            cur.n = union2(dA, mA, dB, mB, dC);
            cur.p = dC;
            // dC holds cur; rotate so the next probe writes elsewhere
            nextbuf = (nextbuf + 2 + 1) % 3;
          } else if (dB != nullptr && mB > 0) {
            cur.p = dB;
            cur.n = mB;
            nextbuf = (nextbuf + 1 + 1) % 3;
          } else {
            cur.p = dA;
            cur.n = mA;
            nextbuf = (nextbuf + 1) % 3;
          }
        }
      }
      if (cur.n > 0) {
        if (R == 0) {
          std::memcpy(out_vals + w, cur.p, static_cast<size_t>(cur.n) * 4);
          w += cur.n;
        } else {
          const uint32_t* rlo = removed;
          const uint32_t* rend = removed + R;
          for (int64_t i = 0; i < cur.n; ++i) {
            const uint32_t v = cur.p[i];
            rlo = std::lower_bound(rlo, rend, v);
            if (rlo != rend && *rlo == v) continue;
            out_vals[w++] = v;
          }
        }
      }
    } else if (!terms.empty()) {
      // OR: decode every present run (tier rows join the merge directly —
      // union across terms subsumes the per-term tier union)
      if (static_cast<int64_t>(arena.size()) < total) arena.resize(total);
      if (static_cast<int64_t>(ping.size()) < total) ping.resize(total);
      runs.clear();
      int64_t pos = 0;
      for (const Term& t : terms) {
        if (t.start1 >= 0) {
          const int64_t n = decode_list(w1, wlen1, t.start1, arena.data() + pos);
          if (n < 0) return -1;
          if (n > 0) runs.push_back({arena.data() + pos, n});
          pos += n;
        }
        if (t.start2 >= 0) {
          const int64_t n = decode_list(w2, wlen2, t.start2, arena.data() + pos);
          if (n < 0) return -1;
          if (n > 0) runs.push_back({arena.data() + pos, n});
          pos += n;
        }
      }
      // reduce to TWO runs with dup-KEEPING SIMD merges (cross-run dups —
      // shared doc ids and carried level dups — survive the levels); the
      // FINAL level runs fused with the dedupe+filter output stage
      // (merge_dedupe_out), writing straight into out_vals
      uint32_t* buf = ping.data();
      uint32_t* alt = arena.data();  // after level 1, the arena is dead
      while (runs.size() > 2) {
        next.clear();
        int64_t p2 = 0;
        for (size_t r = 0; r + 1 < runs.size(); r += 2) {
          const int64_t m = merge2_dups(runs[r].p, runs[r].n, runs[r + 1].p,
                                        runs[r + 1].n, buf + p2);
          next.push_back({buf + p2, m});
          p2 += m;
        }
        if (runs.size() & 1) {
          const Run& last = runs.back();
          std::memcpy(buf + p2, last.p, static_cast<size_t>(last.n) * 4);
          next.push_back({buf + p2, last.n});
          p2 += last.n;
        }
        runs.swap(next);
        std::swap(buf, alt);
      }
      if (!runs.empty()) {
        const Run r0 = runs[0];
        const Run r1 = runs.size() > 1 ? runs[1] : Run{nullptr, 0};
        w += merge_dedupe_out(r0.p, r0.n, r1.p, r1.n, removed, R,
                              out_vals + w);
      }
    }
    out_offs[q + 1] = w;
  }
  return w;
}

// Robin Hood linear-probe hash table build: slots (size S, power of two)
// pre-filled with -1. Displacement-balancing insertion minimizes the MAXIMUM
// probe chain — which is exactly what the device lookup pays (its while_loop
// runs until the whole batch resolves, i.e. max-chain iterations).
// The linear-probe invariant (walk from home slot until an empty slot finds
// any present key) is preserved.
void tpi_hash_build(const uint32_t* hashes, int64_t N, int32_t* slots,
                    int64_t S) {
  const uint32_t mask = static_cast<uint32_t>(S - 1);
  for (int64_t i = 0; i < N; ++i) {
    int32_t cur = static_cast<int32_t>(i);
    uint32_t pos = hashes[i] & mask;
    uint32_t dist = 0;
    while (true) {
      const int32_t existing = slots[pos];
      if (existing < 0) {
        slots[pos] = cur;
        break;
      }
      const uint32_t their_dist =
          (pos - (hashes[existing] & mask)) & mask;
      if (dist > their_dist) {  // rob the rich: swap and keep inserting
        slots[pos] = cur;
        cur = existing;
        dist = their_dist;
      }
      pos = (pos + 1) & mask;
      ++dist;
    }
  }
}

// Batched exact probe over the same table layout — the host twin of the
// device hash lookup (ops/dict_search.py) and of the numpy probe_rows_np
// walk (codec/hashing.py:115), which pays a full-array numpy pass per
// probe iteration (~9 ms per 65k keys on a 1-vCPU host; this loop is
// <1 ms). Hash math must stay bit-identical to hashing.hash_rows_np:
// FNV-1a fold over the W1 key words (incl. the length word) + the
// murmur-style avalanche. An EMPTY slot terminates a chain (definitive
// miss); every hit is verified word-exact against the full key row, so
// collisions cannot alias. qkeys rows must be pre-narrowed to the table's
// width. out[i] = term row, -1 = absent.
void tpi_hash_probe(const uint32_t* keys, int64_t W1, const int32_t* slots,
                    int64_t S, int32_t max_probes, const uint32_t* qkeys,
                    int64_t M, int32_t* out) {
  const uint32_t mask = static_cast<uint32_t>(S - 1);
  for (int64_t i = 0; i < M; ++i) {
    const uint32_t* q = qkeys + i * W1;
    uint32_t h = 2166136261u;
    for (int64_t c = 0; c < W1; ++c) h = (h ^ q[c]) * 16777619u;
    h ^= h >> 16;
    h *= 0x7FEB352Du;
    h ^= h >> 15;
    h *= 0x846CA68Bu;
    h ^= h >> 16;
    int32_t res = -1;
    uint32_t pos = h & mask;
    for (int32_t p = 0; p < max_probes; ++p) {
      const int32_t cand = slots[pos];
      if (cand < 0) break;
      const uint32_t* k = keys + static_cast<int64_t>(cand) * W1;
      bool eq = true;
      for (int64_t c = 0; c < W1; ++c) {
        if (k[c] != q[c]) {
          eq = false;
          break;
        }
      }
      if (eq) {
        res = cand;
        break;
      }
      pos = (pos + 1) & mask;
    }
    out[i] = res;
  }
}

// Dedup fan-out (r5): expand a deduped columnar result back to the full
// batch — out row i is unique-group gid[i]'s row. One memcpy per output
// row, i.e. the floor any duplicate query can cost (the obligatory output
// write); the numpy alternatives are a per-row Python slice loop (~1 us
// overhead/row) or a gather whose int64 index array alone is 2x the
// output bytes. voffs must be the exact cumsum of the gid-mapped counts
// (the Python caller builds it; asserted there).
void tpi_fanout_u32(const uint32_t* uvals, const int64_t* uvoffs,
                    const int64_t* gid, int64_t n, const int64_t* voffs,
                    uint32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t g = gid[i];
    const int64_t s = uvoffs[g];
    int64_t cnt = uvoffs[g + 1] - s;
    if (!cnt) continue;
    const uint32_t* src = uvals + s;
    uint32_t* dst = out + voffs[i];
#if defined(__AVX512F__)
    // the expanded output is fresh memory far bigger than cache:
    // non-temporal stores skip the read-for-ownership (a plain memcpy
    // READS the whole 87 MB destination at config-3 Zipf just to
    // overwrite it) — measured 5.7 -> ~3.5 us/query on the fan-out.
    // Sources stay cached loads: hot groups re-read from L2.
    if (cnt >= 64) {
      while ((reinterpret_cast<uintptr_t>(dst) & 63) && cnt) {
        *dst++ = *src++;
        --cnt;
      }
      for (; cnt >= 16; cnt -= 16, src += 16, dst += 16)
        _mm512_stream_si512(reinterpret_cast<__m512i*>(dst),
                            _mm512_loadu_si512(src));
    }
#endif
    if (cnt) std::memcpy(dst, src, static_cast<size_t>(cnt) * sizeof(uint32_t));
  }
#if defined(__AVX512F__)
  _mm_sfence();
#endif
}

// Build + longest-probe-chain in one call (the numpy post-pass cost ~0.1s
// per million terms at snapshot build). Returns max probe length (final
// displacement + 1), >= 1.
int32_t tpi_hash_build_v2(const uint32_t* hashes, int64_t N, int32_t* slots,
                          int64_t S) {
  tpi_hash_build(hashes, N, slots, S);
  const uint32_t mask = static_cast<uint32_t>(S - 1);
  uint32_t maxd = 0;
  for (int64_t s = 0; s < S; ++s) {
    const int32_t idx = slots[s];
    if (idx < 0) continue;
    const uint32_t d = (static_cast<uint32_t>(s) - (hashes[idx] & mask)) & mask;
    if (d > maxd) maxd = d;
  }
  return static_cast<int32_t>(maxd) + 1;
}

}  // extern "C"
