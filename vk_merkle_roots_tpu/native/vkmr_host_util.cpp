// vkmr_host_util.cpp — non-hash host utilities, compiled with the full
// native ISA (wide-vector codegen is fine here; the SHA translation unit
// vkmr_native.cpp must stay all-SSE — see the Makefile note).
//
//   * FIPS padding + big-endian word packing of a bucket of equal-block
//     leaves (role of Batch packing, /root/reference/src/vkmr/
//     Batches.cpp:64-121, and the in-shader padding, SHA-256.comp:207-285 —
//     done host-side here by design)
//   * a glibc-compatible rand() stream generator (role of rndm, Rndm.cpp)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint32_t load_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

}  // namespace

namespace {

// Scatter one leaf's padded big-endian words into the tile-major device
// wire format: word w of leaf r lands at out[((r/1024)*W + w)*1024 +
// (r%1024)].  `row` holds the leaf's padded bytes (little-endian memory);
// `nwords` is how many leading words are real (the rest of the row in the
// output was calloc-zeroed by the caller and is endian-invariant zero).
// The write stride is 4 KB, but consecutive leaves hit consecutive lanes
// of the same cache lines, so a 128-leaf run revisits each line 16 times
// while it is still resident.
inline void scatter_leaf_words(const uint8_t* row, int64_t nwords, int64_t r,
                               int64_t words_per_leaf, uint32_t* out) {
  uint32_t* base = out + (r >> 10) * words_per_leaf * 1024 + (r & 1023);
  for (int64_t w = 0; w < nwords; ++w)
    base[w << 10] = load_be32(row + w * 4);
}

}  // namespace

extern "C" {

// Pack a bucket of n leaves (all padding to `nblocks` 64-byte blocks) into
// the tile-major device wire format: out is (tiles, nblocks*16, 8, 128)
// uint32 big-endian words — word w of leaf r at [r/1024, w, (r%1024)/128,
// r%128] — the layout the Pallas mapping kernel consumes with zero on-
// device reshuffling (the role of the reference's Batch staging buffers,
// /root/reference/src/vkmr/Batches.cpp:64-121, with the word-major twist
// that a lane-per-leaf kernel wants).  `out` must be zero-initialized
// (rows past n stay zero).
void vkmr_pack_bucket_tiles(const uint8_t* data, const int64_t* offsets,
                            const int64_t* lengths, int64_t n, int32_t nblocks,
                            uint32_t* out) {
  const int64_t words_per = int64_t(nblocks) * 16;
  const int64_t pitch_bytes = int64_t(nblocks) * 64;
#pragma omp parallel
  {
    std::vector<uint8_t> row((size_t)pitch_bytes);
#pragma omp for schedule(dynamic, 512)
    for (int64_t i = 0; i < n; ++i) {
      const int64_t len = lengths[i];
      uint8_t* rb = row.data();
      std::memcpy(rb, data + offsets[i], size_t(len));
      rb[size_t(len)] = 0x80;
      std::memset(rb + len + 1, 0, size_t(pitch_bytes - len - 1));
      const uint64_t bits = uint64_t(len) * 8;
      for (int i2 = 0; i2 < 8; ++i2)
        rb[size_t(pitch_bytes - 8 + i2)] = uint8_t(bits >> (56 - 8 * i2));
      scatter_leaf_words(rb, words_per, i, words_per, out);
    }
  }
}

// Pack a *stream* bucket into the same tile-major wire format: rows of
// `cap_blocks` 64-byte message blocks, each leaf's FIPS padding (0x80 +
// 64-bit big-endian bit length) at the leaf's REAL padded block boundary;
// words past it stay zero (the kernel predicates those blocks off —
// packing._pack_stream_tiles semantics).  `out` must be zero-initialized.
void vkmr_pack_stream_bucket_tiles(const uint8_t* data, const int64_t* offsets,
                                   const int64_t* lengths, int64_t n,
                                   int32_t cap_blocks, uint32_t* out) {
  const int64_t words_per = int64_t(cap_blocks) * 16;
#pragma omp parallel
  {
    std::vector<uint8_t> row;
#pragma omp for schedule(dynamic, 16)
    for (int64_t i = 0; i < n; ++i) {
      const int64_t len = lengths[i];
      const int64_t end = ((len + 9 + 63) / 64) * 64;  // real padded bytes
      if (int64_t(row.size()) < end) row.resize(size_t(end));
      uint8_t* rb = row.data();
      std::memcpy(rb, data + offsets[i], size_t(len));
      rb[size_t(len)] = 0x80;
      std::memset(rb + len + 1, 0, size_t(end - len - 1));
      const uint64_t bits = uint64_t(len) * 8;
      for (int i2 = 0; i2 < 8; ++i2)
        rb[size_t(end - 8 + i2)] = uint8_t(bits >> (56 - 8 * i2));
      scatter_leaf_words(rb, end / 4, i, words_per, out);
    }
  }
}

// glibc-compatible TYPE_3 additive-feedback rand(), reimplemented from the
// published algorithm (same stream as the reference's rndm built against
// glibc).  Fills `out` with `count` newline-terminated printable strings;
// returns the number of bytes written, or -1 if `cap` would overflow.
int64_t vkmr_rndm_stream(uint32_t seed, int64_t count, int32_t maxlen,
                         uint8_t* out, int64_t cap) {
  if (maxlen < 2) return -2;
  int32_t r[344];
  if (seed == 0) seed = 1;
  r[0] = int32_t(seed);
  for (int i = 1; i < 31; ++i) {
    // 16807 * r[i-1] % 2147483647 via Schrage, C truncating division.
    const int64_t hi = r[i - 1] / 127773;
    const int64_t lo = r[i - 1] % 127773;
    int64_t word = 16807 * lo - 2836 * hi;
    if (word < 0) word += 2147483647;
    r[i] = int32_t(word);
  }
  for (int i = 31; i < 34; ++i) r[i] = r[i - 31];
  uint32_t ring[31];
  for (int i = 0; i < 31; ++i) ring[i] = uint32_t(r[i + 3]);
  // Discard the first 310 outputs (i = 34 .. 343).
  int pos = 0;
  auto next_rand = [&]() -> uint32_t {
    const uint32_t v = ring[pos] + ring[(pos + 28) % 31];
    ring[pos] = v;
    pos = (pos + 1) % 31;
    return v >> 1;
  };
  for (int i = 34; i < 344; ++i) (void)next_rand();

  int64_t written = 0;
  for (int64_t s = 0; s < count; ++s) {
    const int32_t len = 1 + int32_t(next_rand() % uint32_t(maxlen - 1));
    if (written + len + 1 > cap) return -1;
    for (int32_t k = 0; k < len; ++k)
      out[written++] = uint8_t(32 + next_rand() % 94u);
    out[written++] = '\n';
  }
  return written;
}

}  // extern "C"
