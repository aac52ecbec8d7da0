"""Shape-polymorphic SHA-256 compression math on uint32 arrays.

One implementation of the FIPS-180-4 round function, shared verbatim by the
Pallas kernel bodies (arrays are (8,128) vector registers there) and by the
pure-XLA fallback path (arrays are (n,) lanes there).  This mirrors the role
of the reference's shared round macros (``/root/reference/src/common/
SHA-256defs.h:16-27``) which are included by both the CPU engine and the GLSL
shader — except here the *same Python functions* trace into both backends,
so there is nothing to keep in sync.

Everything is uint32; all adds wrap mod 2^32 by dtype.  ``Ch`` and ``Maj``
use the 3-op forms (``g ^ (e & (f ^ g))`` and ``(a & b) | (c & (a | b))``) —
bit-identical to the canonical definitions but cheaper on the VPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import (
    DIGEST_WORDS,
    PAD_BLOCK_64_SCHEDULE_PLUS_K,
    PAD_TAIL_32,
    SHA256_IV,
    SHA256_K,
)

U32 = jnp.uint32


def rotr(x, n: int):
    # uint32 >> is a logical shift; rotation is (x >> n) | (x << (32-n)).
    return (x >> n) | (x << (32 - n))


def big_sigma0(x):
    return rotr(x, 2) ^ rotr(x, 13) ^ rotr(x, 22)


def big_sigma1(x):
    return rotr(x, 6) ^ rotr(x, 11) ^ rotr(x, 25)


def small_sigma0(x):
    return rotr(x, 7) ^ rotr(x, 18) ^ (x >> 3)


def small_sigma1(x):
    return rotr(x, 17) ^ rotr(x, 19) ^ (x >> 10)


def ch(e, f, g):
    return g ^ (e & (f ^ g))


def maj(a, b, c):
    return (a & b) | (c & (a | b))


def initial_state(like):
    """The FIPS-180 initial hash value broadcast to the shape of ``like``."""
    return tuple(jnp.full(jnp.shape(like), np.uint32(SHA256_IV[j]), U32) for j in range(8))


def compress(state, w16, unroll: bool = True):
    """One compression of a 16-word message block into ``state``.

    ``state``: tuple of 8 uint32 arrays (a..h); ``w16``: sequence of 16
    uint32 arrays, all the same shape.  Returns the new state tuple
    (feed-forward add included).

    ``unroll=True`` (the Pallas-kernel form) unrolls the 64 rounds at trace
    time with a rolling 16-entry schedule window — only 16 live message
    registers.  ``unroll=False`` (the XLA-fallback form) uses
    ``lax.fori_loop`` so host-platform compiles stay small and fast; the
    math is identical.
    """
    if not unroll:
        return _compress_rolled(state, w16)
    a, b, c, d, e, f, g, h = state
    w = list(w16)
    # Cached-XOR Maj: maj(a,b,c) = b ^ ((a^b) & (b^c)), and this round's
    # (b^c) is last round's (a^b) — one live register saves an op per round.
    ab_prev = b ^ c
    for t in range(64):
        if t < 16:
            wt = w[t]
        else:
            wt = (
                w[t % 16]
                + small_sigma0(w[(t - 15) % 16])
                + w[(t - 7) % 16]
                + small_sigma1(w[(t - 2) % 16])
            )
            w[t % 16] = wt
        t1 = h + big_sigma1(e) + ch(e, f, g) + wt + np.uint32(SHA256_K[t])
        ab = a ^ b
        t2 = big_sigma0(a) + (b ^ (ab & ab_prev))
        ab_prev = ab
        h, g, f, e = g, f, e, d + t1
        d, c, b, a = c, b, a, t1 + t2
    s = state
    return (s[0] + a, s[1] + b, s[2] + c, s[3] + d, s[4] + e, s[5] + f, s[6] + g, s[7] + h)


def _compress_rolled(state, w16):
    """``lax.fori_loop`` form of :func:`compress` (same math, small graph)."""
    import jax

    w64 = jnp.zeros((64,) + tuple(jnp.shape(w16[0])), U32)
    w64 = w64.at[:16].set(jnp.stack(list(w16)))

    def sched(t, w):
        wt = w[t - 16] + small_sigma0(w[t - 15]) + w[t - 7] + small_sigma1(w[t - 2])
        return w.at[t].set(wt)

    w64 = jax.lax.fori_loop(16, 64, sched, w64)
    ktab = jnp.asarray(SHA256_K)

    def round_body(t, st):
        a, b, c, d, e, f, g, h = st
        t1 = h + big_sigma1(e) + ch(e, f, g) + w64[t] + ktab[t]
        t2 = big_sigma0(a) + maj(a, b, c)
        return (t1 + t2, a, b, c, d + t1, e, f, g)

    out = jax.lax.fori_loop(0, 64, round_body, tuple(state))
    return tuple(s + o for s, o in zip(state, out))


def compress_const_schedule(state, schedule_plus_k=PAD_BLOCK_64_SCHEDULE_PLUS_K, unroll: bool = True):
    """Compression of a block whose message is a compile-time constant.

    The full 64-word schedule is precomputed on the host and folded with the
    round constants, so each round costs one scalar-broadcast add instead of
    the schedule recurrence — used for the constant padding block of every
    64-byte (pair) message.
    """
    if not unroll:
        import jax

        wk = jnp.asarray(schedule_plus_k)

        def round_body(t, st):
            a, b, c, d, e, f, g, h = st
            t1 = h + big_sigma1(e) + ch(e, f, g) + wk[t]
            t2 = big_sigma0(a) + maj(a, b, c)
            return (t1 + t2, a, b, c, d + t1, e, f, g)

        out = jax.lax.fori_loop(0, 64, round_body, tuple(state))
        return tuple(s + o for s, o in zip(state, out))
    a, b, c, d, e, f, g, h = state
    ab_prev = b ^ c
    for t in range(64):
        t1 = h + big_sigma1(e) + ch(e, f, g) + np.uint32(schedule_plus_k[t])
        ab = a ^ b
        t2 = big_sigma0(a) + (b ^ (ab & ab_prev))
        ab_prev = ab
        h, g, f, e = g, f, e, d + t1
        d, c, b, a = c, b, a, t1 + t2
    s = state
    return (s[0] + a, s[1] + b, s[2] + c, s[3] + d, s[4] + e, s[5] + f, s[6] + g, s[7] + h)


def finalize_sha256d(state, unroll: bool = True):
    """Second SHA-256 pass over a 32-byte digest held as 8 word arrays:
    one block = the digest + constant FIPS padding (0x80…, bitlen 256)."""
    pad = [jnp.full(jnp.shape(state[0]), np.uint32(PAD_TAIL_32[j]), U32) for j in range(8)]
    return compress(initial_state(state[0]), list(state) + pad, unroll=unroll)


def node_hash_words(left, right, unroll: bool = True):
    """SHA-256d of the 64-byte concatenation of two digests (8 word arrays
    each): data block + constant padding block + finalization pass.  This is
    the Merkle interior-node rule (SHA-256plus.cpp:360-451 equivalents)."""
    s = compress(initial_state(left[0]), list(left) + list(right), unroll=unroll)
    s = compress_const_schedule(s, unroll=unroll)
    return finalize_sha256d(s, unroll=unroll)


def leaf_digest_words(w_blocks, unroll: bool = True):
    """SHA-256d of a pre-padded leaf given as a list of 16-word blocks."""
    s = initial_state(w_blocks[0][0])
    for block in w_blocks:
        s = compress(s, block, unroll=unroll)
    return finalize_sha256d(s, unroll=unroll)
