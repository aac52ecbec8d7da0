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

// In-place little->big endian conversion of `n` u32 words.  GCC/Clang at
// -O3 -march=native vectorize the __builtin_bswap32 loop into pshufb/
// vpshufb over full vector registers — this pass runs at memory speed.
inline void bswap32_inplace(uint32_t* w, int64_t n) {
  for (int64_t i = 0; i < n; ++i) w[i] = __builtin_bswap32(w[i]);
}

}  // namespace

extern "C" {

// Pack a bucket of n leaves (all padding to `nblocks` 64-byte blocks) into
// big-endian u32 words: out is n * nblocks * 16 uint32, caller-zeroed or
// not (fully overwritten here).  Layout matches packing.pack_spans.
void vkmr_pack_bucket(const uint8_t* data, const int64_t* offsets,
                      const int64_t* lengths, int64_t n, int32_t nblocks,
                      uint32_t* out) {
  const int64_t words_per = int64_t(nblocks) * 16;
  const int64_t pitch_bytes = int64_t(nblocks) * 64;
  // Build each row directly in the output buffer (payload + 0x80 + zero
  // fill + bit length as bytes), then byte-swap the row's words in place —
  // one write + one read-modify-write per byte instead of the former
  // staging row's three passes, and the swap loop vectorizes.
#pragma omp parallel for schedule(dynamic, 512)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t len = lengths[i];
    uint8_t* rb = reinterpret_cast<uint8_t*>(out + i * words_per);
    std::memcpy(rb, data + offsets[i], size_t(len));
    rb[size_t(len)] = 0x80;
    std::memset(rb + len + 1, 0, size_t(pitch_bytes - len - 1));
    const uint64_t bits = uint64_t(len) * 8;
    for (int i2 = 0; i2 < 8; ++i2)
      rb[size_t(pitch_bytes - 8 + i2)] = uint8_t(bits >> (56 - 8 * i2));
    bswap32_inplace(out + i * words_per, words_per);
  }
}

// Pack a *stream* bucket: n long leaves into rows of `cap_blocks` 64-byte
// message blocks each.  Unlike vkmr_pack_bucket, each leaf's FIPS padding
// (0x80 + 64-bit big-endian bit length) lands at the leaf's REAL padded
// block boundary; the rest of the row is zero blocks the kernel predicates
// off (packing._pack_stream_rows semantics).
void vkmr_pack_stream_bucket(const uint8_t* data, const int64_t* offsets,
                             const int64_t* lengths, int64_t n,
                             int32_t cap_blocks, uint32_t* out) {
  const int64_t words_per = int64_t(cap_blocks) * 16;
  const int64_t pitch_bytes = int64_t(cap_blocks) * 64;
  // Same direct-to-output layout as vkmr_pack_bucket; only the real padded
  // blocks get byte-swapped — the zero rung-padding blocks past `end` are
  // endian-invariant, and on the 5/4 capacity ladder skipping them saves
  // up to 20% of the swap pass.
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t len = lengths[i];
    uint8_t* rb = reinterpret_cast<uint8_t*>(out + i * words_per);
    std::memcpy(rb, data + offsets[i], size_t(len));
    rb[size_t(len)] = 0x80;
    std::memset(rb + len + 1, 0, size_t(pitch_bytes - len - 1));
    const int64_t end = ((len + 9 + 63) / 64) * 64;  // real padded bytes
    const uint64_t bits = uint64_t(len) * 8;
    for (int i2 = 0; i2 < 8; ++i2)
      rb[size_t(end - 8 + i2)] = uint8_t(bits >> (56 - 8 * i2));
    bswap32_inplace(out + i * words_per, end / 4);
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
