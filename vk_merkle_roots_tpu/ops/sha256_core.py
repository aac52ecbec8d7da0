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


# --------------------------------------------------------- constant folding
#
# Trace-time partial evaluation of the compression: a SymU32 is a uint32
# value that is a compile-time constant, a traced array, or a traced array
# plus a constant addend.  Where the message block or initial state contains
# constants (the IV of every first/finalization pass; the FIPS padding words
# of the finalization block), whole sub-expressions — σ of constant schedule
# entries, Ch/Maj over still-constant state registers, wt+K folds — evaluate
# on the host and vanish from the kernel.  The reference cannot do this (its
# GLSL runs the generic macros every round, SHA-256defs.h:16-27); a traced
# kernel gets it for the cost of this class.


def _rotr_i(x: int, n: int) -> int:
    x &= 0xFFFFFFFF
    return ((x >> n) | (x << (32 - n))) & 0xFFFFFFFF


def _bsig0_i(x):
    return _rotr_i(x, 2) ^ _rotr_i(x, 13) ^ _rotr_i(x, 22)


def _bsig1_i(x):
    return _rotr_i(x, 6) ^ _rotr_i(x, 11) ^ _rotr_i(x, 25)


def _sig0_i(x):
    return _rotr_i(x, 7) ^ _rotr_i(x, 18) ^ ((x & 0xFFFFFFFF) >> 3)


def _sig1_i(x):
    return _rotr_i(x, 17) ^ _rotr_i(x, 19) ^ ((x & 0xFFFFFFFF) >> 10)


class SymU32:
    """uint32 value under trace-time partial evaluation: ``var`` (traced
    array or None) plus wrapping constant addend ``const``."""

    __slots__ = ("var", "const")

    def __init__(self, var=None, const=0):
        self.var = var
        self.const = int(const) & 0xFFFFFFFF

    @property
    def is_const(self):
        return self.var is None

    def value(self):
        """Materialize to a traced array (or np scalar when fully const);
        caches so a shared schedule entry pays its fold-in add once."""
        if self.var is None:
            return np.uint32(self.const)
        if self.const:
            self.var = self.var + np.uint32(self.const)
            self.const = 0
        return self.var


def _sym_add(*xs: SymU32) -> SymU32:
    c = 0
    var = None
    for x in xs:
        c += x.const
        if x.var is not None:
            var = x.var if var is None else var + x.var
    return SymU32(var, c)


def _sym_sig(x: SymU32, const_fn, var_fn) -> SymU32:
    if x.is_const:
        return SymU32(None, const_fn(x.const))
    return SymU32(var_fn(x.value()))


def _sym_ch(e: SymU32, f: SymU32, g: SymU32) -> SymU32:
    if e.is_const and f.is_const and g.is_const:
        return SymU32(None, g.const ^ (e.const & (f.const ^ g.const)))
    fxg = (
        np.uint32(f.const ^ g.const)
        if f.is_const and g.is_const
        else f.value() ^ g.value()
    )
    return SymU32(g.value() ^ (e.value() & fxg))


def compress_sym(state, w16):
    """One compression under trace-time constant folding.  ``state`` and
    ``w16`` are SymU32 lists (8 and 16 entries); returns 8 SymU32 (feed-
    forward included).  Identical math to :func:`compress` — the cached-XOR
    Maj and rolling 16-entry schedule window carry over."""
    a, b, c, d, e, f, g, h = state
    w = list(w16)
    # Cached-XOR Maj over syms: this round's (b^c) is last round's (a^b).
    if b.is_const and c.is_const:
        ab_prev = SymU32(None, b.const ^ c.const)
    else:
        ab_prev = SymU32(b.value() ^ c.value())
    for t in range(64):
        if t < 16:
            wt = w[t]
        else:
            wt = _sym_add(
                w[t % 16],
                _sym_sig(w[(t - 15) % 16], _sig0_i, small_sigma0),
                w[(t - 7) % 16],
                _sym_sig(w[(t - 2) % 16], _sig1_i, small_sigma1),
            )
            w[t % 16] = wt
        t1 = _sym_add(
            h,
            _sym_sig(e, _bsig1_i, big_sigma1),
            _sym_ch(e, f, g),
            wt,
            SymU32(None, SHA256_K[t]),
        )
        if a.is_const and b.is_const:
            ab = SymU32(None, a.const ^ b.const)
        else:
            ab = SymU32(a.value() ^ b.value())
        if ab.is_const and ab_prev.is_const and b.is_const:
            maj = SymU32(None, b.const ^ (ab.const & ab_prev.const))
        else:
            anded = (
                np.uint32(ab.const & ab_prev.const)
                if ab.is_const and ab_prev.is_const
                else ab.value() & ab_prev.value()
            )
            maj = SymU32(b.value() ^ anded)
        t2 = _sym_add(_sym_sig(a, _bsig0_i, big_sigma0), maj)
        ab_prev = ab
        h, g, f, e = g, f, e, _sym_add(d, t1)
        d, c, b, a = c, b, a, _sym_add(t1, t2)
    s = state
    regs = (a, b, c, d, e, f, g, h)
    return tuple(_sym_add(s[j], regs[j]) for j in range(8))


_IV_SYMS = None


def _iv_syms():
    global _IV_SYMS
    if _IV_SYMS is None:
        _IV_SYMS = [SymU32(None, int(SHA256_IV[j])) for j in range(8)]
    return list(_IV_SYMS)


def finalize_sha256d(state, unroll: bool = True):
    """Second SHA-256 pass over a 32-byte digest held as 8 word arrays:
    one block = the digest + constant FIPS padding (0x80…, bitlen 256).
    The unrolled form const-folds the IV initial state, the padding words
    of rounds 8-15, and every schedule term they reach."""
    if not unroll:
        pad = [jnp.full(jnp.shape(state[0]), np.uint32(PAD_TAIL_32[j]), U32) for j in range(8)]
        return compress(initial_state(state[0]), list(state) + pad, unroll=False)
    w = [SymU32(s) for s in state] + [SymU32(None, int(PAD_TAIL_32[j])) for j in range(8)]
    out = compress_sym(_iv_syms(), w)
    return tuple(x.value() for x in out)


def node_hash_words(left, right, unroll: bool = True):
    """SHA-256d of the 64-byte concatenation of two digests (8 word arrays
    each): data block + constant padding block + finalization pass.  This is
    the Merkle interior-node rule (SHA-256plus.cpp:360-451 equivalents)."""
    if not unroll:
        s = compress(initial_state(left[0]), list(left) + list(right), unroll=False)
        s = compress_const_schedule(s, unroll=False)
        return finalize_sha256d(s, unroll=False)
    syms = compress_sym(_iv_syms(), [SymU32(v) for v in list(left) + list(right)])
    s = compress_const_schedule(tuple(x.value() for x in syms))
    return finalize_sha256d(s)


def leaf_digest_words(w_blocks, unroll: bool = True):
    """SHA-256d of a pre-padded leaf given as a list of 16-word blocks."""
    if not unroll:
        s = initial_state(w_blocks[0][0])
        for block in w_blocks:
            s = compress(s, block, unroll=False)
        return finalize_sha256d(s, unroll=False)
    syms = compress_sym(_iv_syms(), [SymU32(v) for v in w_blocks[0]])
    s = tuple(x.value() for x in syms)
    for block in w_blocks[1:]:
        s = compress(s, block)
    return finalize_sha256d(s)
