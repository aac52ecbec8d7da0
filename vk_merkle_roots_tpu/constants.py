"""SHA-256 constants and wire-format definitions shared by every backend.

This is the TPU framework's equivalent of the reference's shared C++/GLSL
header (``/root/reference/src/common/SHA-256defs.h:10-55``): one module that
both the Pallas kernels and the NumPy/hashlib oracle import, so the round
constants, initial hash state, and message layout can never drift apart.

Wire format notes
-----------------
* Digests are held as 8 big-endian u32 words (the reference's
  ``VkSha256Result`` struct, SHA-256defs.h:48-50).  Serializing a digest to
  bytes is big-endian word order — identical to ``hashlib.sha256().digest()``.
* Messages are packed as big-endian u32 words.  The reference stores packed
  little-endian bytes and swops ends on load inside the shader
  (SHA-256.comp:232, 249); we pre-swap on the host so device kernels are pure
  arithmetic.
* Padding is standard FIPS-180-4: ``0x80`` byte, zero fill, 64-bit big-endian
  bit length.  NOTE: the reference writes the *top* length word as
  ``size & 0xE0000000`` (SHA-256defs.h:31 ``MB_SIZE_TOP``) instead of
  ``size >> 29`` — a deviation from FIPS-180 for any single input of
  2^29 bytes or more.  This framework is standard (hashlib-consistent)
  everywhere; both implementations agree for all leaves < 2^29 bytes, and
  leaf sizes are capped well below that (``MAX_LEAF_BYTES``).
"""

from __future__ import annotations

import numpy as np

# Number of 32-bit words in a digest / message block.
DIGEST_WORDS = 8  # SHA256_WC (SHA-256defs.h:36)
DIGEST_BYTES = 32
BLOCK_WORDS = 16  # SHA256_MESSAGE_BLOCK_WC (SHA-256defs.h:35)
BLOCK_BYTES = 64

# Device tile geometry: one VPU vector register is (8 sublanes, 128 lanes);
# one *tile* holds 1024 leaves (or digests), one per lane position.  The
# tile-major wire format places word w of leaf r at
# ``[r // TILE, w, (r % TILE) // TILE_LANE, r % TILE_LANE]`` — every module
# (host packer contract, Pallas block shapes, mesh sharding specs) derives
# its geometry from these three constants; the native packer's matching
# literals are pinned by the differential tests.
TILE_SUB = 8
TILE_LANE = 128
TILE = TILE_SUB * TILE_LANE

# Per-leaf size limit, matching the reference's documented 2^32-byte input
# limit (SHA-256defs.h:28-31).  NOTE on fidelity: the reference's padding
# writes the top length word as ``size & 0xE0000000`` (MB_SIZE_TOP,
# SHA-256defs.h:31) instead of ``size >> 29`` — non-FIPS for any single
# input of 2^29 bytes or more.  This framework is FIPS/hashlib-standard at
# every length, so roots agree with the reference for all leaves < 2^29
# bytes and with hashlib (the correct value) everywhere.  Device stream
# buckets stay far below this (EngineConfig.device_max_blocks rows); larger
# leaves route to the host hasher, which handles any length.
MAX_LEAF_BYTES = (1 << 32) - 1

# FIPS-180-4 initial hash value (fractional parts of sqrt of first 8 primes).
SHA256_IV = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)

# FIPS-180-4 round constants (fractional parts of cbrt of first 64 primes).
SHA256_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5,
        0x3956C25B, 0x59F111F1, 0x923F82A4, 0xAB1C5ED5,
        0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174,
        0xE49B69C1, 0xEFBE4786, 0x0FC19DC6, 0x240CA1CC,
        0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7,
        0xC6E00BF3, 0xD5A79147, 0x06CA6351, 0x14292967,
        0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85,
        0xA2BFE8A1, 0xA81A664B, 0xC24B8B70, 0xC76C51A3,
        0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5,
        0x391C0CB3, 0x4ED8AA4A, 0x5B9CCA4F, 0x682E6FF3,
        0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)


def padded_block_count(length: int) -> int:
    """Number of 64-byte message blocks for a `length`-byte input after
    FIPS-180 padding (0x80 byte + >=0 zeros + 8-byte length footer)."""
    return (length + 9 + BLOCK_BYTES - 1) // BLOCK_BYTES


# Message words of the second (padding-only) block of a 64-byte message —
# the pair-hash case: SHA-256 of L||R runs over exactly one data block plus
# this constant block.  W[0]=0x80000000 pad bit, W[15]=512 bit length.
PAD_BLOCK_64 = np.zeros(BLOCK_WORDS, dtype=np.uint32)
PAD_BLOCK_64[0] = 0x80000000
PAD_BLOCK_64[15] = 512

# Trailing padding words of the single-block message formed by a 32-byte
# digest (the second hash of SHA-256d): W[0..7] are the digest, then these.
PAD_TAIL_32 = np.zeros(BLOCK_WORDS - DIGEST_WORDS, dtype=np.uint32)
PAD_TAIL_32[0] = 0x80000000
PAD_TAIL_32[-1] = 256


def _schedule(first16: np.ndarray) -> np.ndarray:
    """Expand 16 message words to the full 64-word schedule (host-side, for
    precomputing constant schedules)."""
    w = np.zeros(64, dtype=np.uint64)
    w[:16] = first16

    def rotr(x: np.ndarray, n: int) -> np.ndarray:
        x = x & 0xFFFFFFFF
        return ((x >> np.uint64(n)) | (x << np.uint64(32 - n))) & np.uint64(0xFFFFFFFF)

    for t in range(16, 64):
        s0 = rotr(w[t - 15], 7) ^ rotr(w[t - 15], 18) ^ ((w[t - 15] & 0xFFFFFFFF) >> np.uint64(3))
        s1 = rotr(w[t - 2], 17) ^ rotr(w[t - 2], 19) ^ ((w[t - 2] & 0xFFFFFFFF) >> np.uint64(10))
        w[t] = (w[t - 16] + s0 + w[t - 7] + s1) & np.uint64(0xFFFFFFFF)
    return w.astype(np.uint32)


# Precomputed full 64-word schedule for the constant 64-byte-message padding
# block.  Node-hash kernels fold (W[t] + K[t]) as a single scalar constant per
# round, eliminating the schedule computation for that compression entirely.
PAD_BLOCK_64_SCHEDULE = _schedule(PAD_BLOCK_64)
PAD_BLOCK_64_SCHEDULE_PLUS_K = (
    PAD_BLOCK_64_SCHEDULE.astype(np.uint64) + SHA256_K.astype(np.uint64)
).astype(np.uint32)
