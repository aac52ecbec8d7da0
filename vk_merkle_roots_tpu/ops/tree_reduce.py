"""Tree-reduction stage: digests -> slice root, on device.

TPU-native equivalent of the reference's reduction pipeline — the
``SHA-256-2-be*.spv`` shaders (pairwise node hashing,
``/root/reference/src/shaders/SHA-256.comp:307-434``) and the ``Reductions``
manager with its per-level dispatches, odd-element duplication copies, and
phantom-full-height rule for ragged tails (Reductions.cpp:235-547).

Design, rethought for TPU:

* **Bit-reversed storage** replaces strided pairing.  Digests of a 2^k-leaf
  block are stored at the bit-reversal of their leaf index, which turns
  every tree level into ``node_hash(first_half, second_half)`` — a purely
  elementwise fold, perfect for the VPU.  (The Vulkan kernels instead index
  pairs at stride ``1<<pass`` per invocation, SHA-256.comp:395.)
* **Big levels** (>= 2 tiles of 1024 digests) are one elementwise Pallas
  launch each — the analog of the reference's per-level dispatch loop
  (Reductions.cpp:299-342), but with zero barriers to manage: XLA owns the
  hazards.  The **tail** (the last 10 levels, from 1024 digests down to the
  root) runs as ONE fused in-register Pallas kernel (``_tail_kernel`` — the
  TPU counterpart of the subgroup-shuffle subtree shader,
  SHA-256.comp:307-391, with static sublane/lane splits replacing
  ``subgroupShuffleDown``).  Unlike the reference's subgroup path, which its
  README shows *losing* to the plain per-level path on every listed GPU
  (README.md:100-108), the fused tail WINS decisively on TPU: 26 µs/block
  vs 3.1 ms for ten separate XLA level folds (measured on v5e — each tiny
  XLA dispatch costs far more than its 1024 lanes of work).  Only the
  single 1024-digest tail shape is fused (one Mosaic kernel, minutes to
  compile once, persistent-cached); sub-tile perfect blocks from ragged
  decomposition keep the XLA per-level folds, whose latency hides behind
  the 35 ms host readback they feed anyway.  ``VKMR_TAIL=levels`` restores
  the XLA tail everywhere (safety valve; also the benchmark baseline).
* **Odd counts** never reach the device: a ragged (non-power-of-two) slice
  is decomposed into its binary-decomposition blocks — each an aligned,
  perfect subtree reduced on-device — and the <=30 resulting block roots are
  combined on the host with the exact odd-self-pair / phantom-height rules
  (``_combine_ragged``).  This replaces the reference's on-device
  duplicate-last-element buffer copies (Reductions.cpp:299-342).

Every stage is jitted piecewise by shape so compile artifacts are shared
across slice sizes; ``reduce_natural_body`` is also traceable inside a
larger jit for the fused fixed-shape step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import oracle
from ..constants import TILE, TILE_LANE, TILE_SUB
from ..utils.bitmath import bit_reverse_indices, ceil_log2, pow2_env
from ..utils.hexutil import words_to_digest
from . import kdebug, sha256_core


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------- big levels


# Tiles hashed per fold grid step.  One tile is only ~2.9 us of VPU work;
# at B=1 the fixed per-grid-step cost (DMA window swaps, semaphores) eats
# ~35% of the level — measured 13.3 GB/s (B=1) vs 20.8 GB/s (B=8) on the
# 2^23-digest tree; the round-3 re-sweep confirms B=8 optimal (21.9 GB/s
# vs 16.0 at B=16, 11.5 at B=32 — VMEM pressure).  The kernel body is ONE
# node_hash traced on (b, 8, 128) operands, so larger B means larger
# vector shapes, not more Mosaic code.  Override with VKMR_FOLD_TILES to
# re-measure (docs/PERF.md §4); read at import, power-of-two enforced (the
# grid math relies on the knob dividing every pow-2 tile count).
FOLD_BLOCK_TILES = pow2_env("VKMR_FOLD_TILES", 8)

# Grouped-reduction handoff point: in-group folds run while the per-group
# OUTPUT still spans at least this many tiles; below it, one small
# gather+transpose hands the remainder to the standard fold pipeline
# (reduce_grouped_body).  Swept on-chip round 4 at 2^23/G=128:
# {2: 20.24, 4: 18.76, 8: 20.36, 16: 20.45, 32: 18.26} GB/s — 8/16
# equivalent within the ~+-1 GB/s run noise, the extremes regress.
# Defaults to FOLD_BLOCK_TILES so fold blocks never shrink below the
# swept fold optimum.
GROUP_HANDOFF_TILES = pow2_env("VKMR_GROUP_HANDOFF_TILES", FOLD_BLOCK_TILES)


def _fold_kernel(l_ref, r_ref, o_ref):
    """One tree level for one output block of b tiles: b*1024 node hashes.
    Blocks: (8, b, 8, 128) digest words; L block i pairs with R block
    i + T_out/b."""
    left = tuple(l_ref[j] for j in range(8))
    right = tuple(r_ref[j] for j in range(8))
    out = sha256_core.node_hash_words(left, right)
    kdebug.emit("fold_kernel d0[lane0]", out[0][0, 0, 0])
    for j in range(8):
        o_ref[j] = out[j]


def _fold_level_pallas(x, interpret: bool, groups: int = 1):
    """(8, T, 8, 128) -> (8, T/2, 8, 128).

    With ``groups`` == 1 this is one whole-array tree level over bit-reversed
    storage (pair tile i with tile i + T/2).  With ``groups`` == G the array
    is G contiguous, independent bit-reversed subtrees of T/G tiles each
    (the *group-bitrev* layout the engine stores when each flushed batch is
    packed in bit-reversed order): every group folds its own halves, and the
    output keeps groups contiguous.  Requires T/G >= 2; all quantities are
    powers of two."""
    t_out = x.shape[1] // 2
    tpg_out = t_out // groups  # output tiles per group
    b = min(FOLD_BLOCK_TILES, tpg_out)  # powers of two, so b | tpg_out
    return pl.pallas_call(
        _fold_kernel,
        grid=(groups, tpg_out // b),
        in_specs=[
            pl.BlockSpec(
                (8, b, TILE_SUB, TILE_LANE),
                lambda g, i, s=2 * tpg_out // b: (0, g * s + i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, b, TILE_SUB, TILE_LANE),
                lambda g, i, s=2 * tpg_out // b, o=tpg_out // b: (0, g * s + o + i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, b, TILE_SUB, TILE_LANE),
            lambda g, i, s=tpg_out // b: (0, g * s + i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((8, t_out, TILE_SUB, TILE_LANE), jnp.uint32),
        interpret=interpret,
    )(x, x)


def _fold_level_xla(x):
    """(8, n) -> (8, n/2) elementwise fold (rolled compression: the XLA tail
    is runtime noise, so graph size matters more than round unrolling)."""
    half = x.shape[1] // 2
    left = tuple(x[j, :half] for j in range(8))
    right = tuple(x[j, half:] for j in range(8))
    return jnp.stack(sha256_core.node_hash_words(left, right, unroll=False), axis=0)


_fold_level_xla_jit = jax.jit(_fold_level_xla)
_fold_level_pallas_jit = jax.jit(_fold_level_pallas, static_argnums=(1,))


# ----------------------------------------------------------------- tail fuse


def _tail_kernel(x_ref, o_ref, *, log2n: int):
    """Fold all remaining levels of <=1024 bitrev-ordered digests in one
    kernel (the subgroup-subtree analog; SHA-256.comp:307-391 does this with
    ``subgroupShuffleDown``, here it is static sublane/lane splits on
    shrinking register shapes).  x block (8, 8, 128); the root is broadcast
    into o block (8, 1, 128).

    Entries live at flattened (sublane*128 + lane) positions [0, n); folding
    halves the live region: sublane split while more than one sublane is
    live, then lane splits.
    """
    n = 1 << log2n
    rows, cols = max(n // TILE_LANE, 1), min(n, TILE_LANE)
    words = [x_ref[j, :rows, :cols] for j in range(8)]
    for _ in range(log2n):
        if rows > 1:
            left = tuple(w[: rows // 2, :] for w in words)
            right = tuple(w[rows // 2 :, :] for w in words)
            rows //= 2
        else:
            left = tuple(w[:, : cols // 2] for w in words)
            right = tuple(w[:, cols // 2 :] for w in words)
            cols //= 2
        words = list(sha256_core.node_hash_words(left, right))
    kdebug.emit("tail_kernel root_word0", words[0][0, 0])
    for j in range(8):
        o_ref[j] = jnp.broadcast_to(words[j][:1, :1], (1, TILE_LANE))


@partial(jax.jit, static_argnums=(1, 2))
def _tail_reduce_pallas(x, log2n: int, interpret: bool):
    """(8, n<=1024) bitrev word-major -> (8,) root words, one fused launch."""
    n = x.shape[1]
    tile = jnp.zeros((8, TILE_SUB, TILE_LANE), jnp.uint32)
    tile = tile.at[:, : max(n // TILE_LANE, 1), : min(n, TILE_LANE)].set(
        x.reshape(8, max(n // TILE_LANE, 1), min(n, TILE_LANE))
    )
    out = pl.pallas_call(
        partial(_tail_kernel, log2n=log2n),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 1, TILE_LANE), jnp.uint32),
        interpret=interpret,
    )(tile)
    return out[:, 0, 0]


@jax.jit
def _tail_reduce_xla(x):
    while x.shape[1] > 1:
        x = _fold_level_xla(x)
    return x[:, 0]




def _fuse_tail() -> bool:
    """Fused Pallas tail unless disabled (``VKMR_TAIL=levels``)."""
    import os

    return os.environ.get("VKMR_TAIL", "fused") != "levels"


# ------------------------------------------------------------- orchestration


def reduce_words_body(x, log2n: int, use_pallas: bool, interpret: bool):
    """Traceable body: (8, 2^log2n) word-major bit-reversed fold input
    -> (8,) root words.  Usable inside an enclosing jit (fused step).

    Pallas handles every level with >= 2 full tiles (where all the hashes
    are); the last 10 levels (1024 digests -> root) are one fused Pallas
    launch — 26 µs vs 3.1 ms for per-level XLA folds (dispatch-latency
    bound, see module docstring).  Blocks smaller than a tile keep the
    rolled-XLA folds: no extra multi-minute Mosaic compiles, and their
    latency hides behind the host readback that consumes them.
    """
    n = 1 << log2n
    if use_pallas and n >= 2 * TILE:
        tiles = x.reshape(8, n // TILE, TILE_SUB, TILE_LANE)
        while tiles.shape[1] >= 2:
            tiles = _fold_level_pallas(tiles, interpret)
        x = tiles.reshape(8, TILE)
    if use_pallas and not interpret and x.shape[1] == TILE and _fuse_tail():
        return _tail_reduce_pallas(x, 10, interpret)
    while x.shape[1] > 1:
        x = _fold_level_xla(x)  # rolled: the tail is runtime noise, compile time is not
    return x[:, 0]


def reduce_grouped_body(x, log2n: int, group_log2: int, use_pallas: bool, interpret: bool):
    """Traceable: (8, 2^log2n) word-major digest columns in the GROUP-BITREV
    layout -> (8,) root words, with **no permutation anywhere**.

    Group-bitrev layout: the array is 2^(log2n-group_log2) contiguous groups
    of 2^group_log2 digests; groups sit in natural (arrival) order, and each
    group's digests are stored at the bit-reversal of their in-group leaf
    index.  The engine gets this layout for free by packing each flushed
    batch's leaves in bit-reversed order (a host-side index permutation at
    pack time), which removes the factored bit-reversal gather+transpose —
    previously ~20% of the full-dataflow reduction — from the device
    entirely.  (The reference needs no permutation because its shader
    indexes strided pairs per invocation, SHA-256.comp:395; strided minor-
    axis access is exactly what the VPU is bad at, hence this layout.)

    Tree levels 0..group_log2-1 fold within groups (elementwise halves per
    group); the remaining levels pair adjacent groups, handled by a tiny
    bitrev gather over the 2^(log2n-group_log2) group roots.
    """
    n = 1 << log2n
    if group_log2 >= log2n:
        return reduce_words_body(x, log2n, use_pallas, interpret)
    groups = 1 << (log2n - group_log2)
    m = 1 << group_log2  # live digests per group
    if not (use_pallas and m // 2 >= GROUP_HANDOFF_TILES * TILE):
        # Groups too small for in-group Pallas folds (or no Pallas at all):
        # the handoff gather below would move tiny m-element runs across
        # the WHOLE slice — the monolithic-permutation pattern that
        # measured 4.8x off bandwidth.  Normalize to natural order instead
        # (cheap per-group minor gather) and take the measured factored-
        # bitrev path.
        return reduce_natural_body(
            group_bitrev_to_natural(x, log2n, group_log2), log2n, use_pallas, interpret
        )
    # In-group levels fold per-group halves while the per-group output
    # still fills a full fold block — the bulk of the data reduces here
    # with zero permutation.
    tiles = x.reshape(8, n // TILE, TILE_SUB, TILE_LANE)
    while tiles.shape[1] // (2 * groups) >= GROUP_HANDOFF_TILES:
        tiles = _fold_level_pallas(tiles, interpret, groups=groups)
    x = tiles.reshape(8, tiles.shape[1] * TILE)
    m = tiles.shape[1] * TILE // groups
    # Handoff: one small gather+transpose turns the remainder into a plain
    # bit-reversed array, so every remaining level (the rest of the in-group
    # levels, then the cross-group levels) is a standard flat-halves fold on
    # the existing kernels.  Storage index at this point is (g, p') with p'
    # per-group bitrev; the flat bitrev index is (p', rev(g)) — a G-element
    # gather of contiguous m*32 B rows (>= 256 KB each here, by the branch
    # guard above) plus an axis swap, paid at 1/(2^folded) of the slice
    # size (for the default shapes, ~1/8: e.g. 32 MB instead of the 256 MB
    # the round-3 natural path permuted).
    y = x.reshape(8, groups, m)
    if groups > 1:
        y = jnp.take(y, jnp.asarray(_bitrev(log2n - group_log2)), axis=1)
    y = y.transpose(0, 2, 1).reshape(8, groups * m)
    return reduce_words_body(y, ceil_log2(groups * m), use_pallas, interpret)


def reduce_grouped_block(x, log2n: int, group_log2: int, backend: str = "auto"):
    """Jitted wrapper over :func:`reduce_grouped_body` for engine slice
    reduction; returns an async (8,) device array."""
    interpret = _use_interpret()
    use_pallas = backend == "pallas" or (backend == "auto" and not interpret)
    return _reduce_grouped_jit(jnp.asarray(x), log2n, group_log2, use_pallas, interpret)


_reduce_grouped_jit = jax.jit(reduce_grouped_body, static_argnums=(1, 2, 3, 4))


def group_bitrev_to_natural(x, log2n: int, group_log2: int):
    """(8, 2^log2n) group-bitrev columns -> natural-order columns: a
    per-group bit-reversal of the minor axis (no transpose — rev is an
    involution and groups are already in natural order).  Used once per
    stream to normalize a ragged final slice for the binary-decomposition
    path, and by :func:`reduce_grouped_body`'s small-group fallback (where
    the handoff gather's runs would be too fine-grained)."""
    if group_log2 >= log2n:
        return bitrev_fold_words(x, log2n)
    n = 1 << log2n
    y = x.reshape(8, n >> group_log2, 1 << group_log2)
    y = jnp.take(y, jnp.asarray(_bitrev(group_log2)), axis=2)
    return y.reshape(8, n)


def reduce_natural_body(cols_nat, log2n: int, use_pallas: bool, interpret: bool):
    """Traceable: (8, 2^log2n) NATURAL-order word-major digest columns ->
    (8,) root words.  Applies the factored bit-reversal
    (:func:`bitrev_fold_words`) then the fold pipeline — the preferred
    fused hot path (exactly what the mapping stage emits)."""
    return reduce_words_body(
        bitrev_fold_words(cols_nat, log2n), log2n, use_pallas, interpret
    )


def _reduce_words(x, log2n: int, use_pallas: bool, interpret: bool):
    """Piecewise-jitted orchestrator (shared compile artifacts per level
    shape across all slice sizes)."""
    n = 1 << log2n
    if use_pallas and n >= 2 * TILE:
        tiles = x.reshape(8, n // TILE, TILE_SUB, TILE_LANE)
        while tiles.shape[1] >= 2:
            tiles = _fold_level_pallas_jit(tiles, interpret)
        x = tiles.reshape(8, TILE)
    if use_pallas and not interpret and x.shape[1] == TILE and _fuse_tail():
        return _tail_reduce_pallas(x, 10, interpret)
    while x.shape[1] > 1:
        x = _fold_level_xla_jit(x)
    return x[:, 0]


_BITREV_CACHE: dict[int, np.ndarray] = {}


def _bitrev(log2n: int) -> np.ndarray:
    if log2n not in _BITREV_CACHE:
        _BITREV_CACHE[log2n] = bit_reverse_indices(log2n)
    return _BITREV_CACHE[log2n]


# Below this, a single row gather is cheap and the factored form's extra
# reshapes/dispatches aren't worth it.
_BITREV_FACTOR_MIN_LOG2 = 10


def bitrev_fold_words(cols_nat, log2n: int):
    """(8, 2^log2n) natural-order word-major digest columns -> (8, 2^log2n)
    bit-reversed fold input, via the FACTORED permutation.

    ``rev_n`` factors over a (2^a, 2^b) reshape (v = hi*2^b + lo  =>
    rev_n(v) = rev_b(lo)*2^a + rev_a(hi)): permute each axis by its own
    small bit-reversal, then swap the axes.  The axis gathers move whole
    contiguous sub-rows and the swap is a regular transpose, so the whole
    thing runs near HBM bandwidth — measured 0.88 ms vs 4.27 ms for the
    monolithic row gather on 2^20 digests (v5e): random 32-byte-row gathers
    are ~5x off bandwidth and were the single largest overhead in the fused
    root / stream pipeline (VERDICT r1 weak #4).  Since round 3 the input
    is already word-major (the mapping stage emits columns), so the old
    leading (n, 8) -> (8, n) transpose — ~6 ms per 2^23 digests, worse than
    the permutation itself — is gone from the dataflow entirely.
    """
    n = 1 << log2n
    if log2n < _BITREV_FACTOR_MIN_LOG2:
        return jnp.take(cols_nat, jnp.asarray(_bitrev(log2n)), axis=1)
    a = log2n // 2
    b = log2n - a
    y = cols_nat.reshape(8, 1 << a, 1 << b)
    y = jnp.take(y, jnp.asarray(_bitrev(a)), axis=1)
    y = jnp.take(y, jnp.asarray(_bitrev(b)), axis=2)
    return y.transpose(0, 2, 1).reshape(8, n)


_bitrev_fold_words_jit = jax.jit(bitrev_fold_words, static_argnums=(1,))


def reduce_perfect_block(cols_nat, log2n: int, backend: str = "auto"):
    """Root of a perfect 2^log2n-leaf subtree from natural-order word-major
    digest columns (8, 2^log2n).  Returns a (8,) uint32 device array (an
    async future under JAX dispatch — the replacement for the reference's
    fence-tracked in-flight reductions, Ops.h:41-57)."""
    interpret = _use_interpret()
    use_pallas = backend == "pallas" or (backend == "auto" and not interpret)
    cols_nat = jnp.asarray(cols_nat)
    if log2n == 0:
        return cols_nat[:, 0]
    fold = _bitrev_fold_words_jit(cols_nat, log2n)
    return _reduce_words(fold, log2n, use_pallas, interpret)


# ------------------------------------------------------------- ragged slices


def _combine_ragged(block_roots: list[tuple[bytes, int]], height: int) -> bytes:
    """Host-side combine of binary-decomposition block roots.

    ``block_roots``: [(digest, block_height)] in leaf order, strictly
    decreasing heights.  Raises the running right-subtree with self-pairing
    (the phantom rule) to each sibling's height, then joins; finally raises
    to ``height``.  Exactly reproduces odd-self-pair-at-every-level
    semantics (cf. oracle.reduce_slice, SHA-256plus.cpp:525-533)."""
    cur, cur_h = block_roots[-1]
    for root, h in reversed(block_roots[:-1]):
        while cur_h < h:
            cur = oracle.node_hash(cur, cur)
            cur_h += 1
        cur = oracle.node_hash(root, cur)
        cur_h = h + 1
    while cur_h < height:
        cur = oracle.node_hash(cur, cur)
        cur_h += 1
    return cur


def slice_root(cols_nat, count: int, height: int, backend: str = "auto") -> bytes:
    """Root of one slice: ``count`` digests (word-major columns, (8, >=count))
    reduced through exactly ``height`` levels (phantom-full-height for
    ragged tails).  Blocks on the device; meant for slice finalization.  For
    the hot full-slice path use :func:`reduce_perfect_block` directly
    (non-blocking)."""
    if count < 1 or count > (1 << height):
        raise ValueError(f"count={count} out of range for height={height}")
    cols_nat = jnp.asarray(cols_nat)
    if count == (1 << height):
        return words_to_digest(np.asarray(reduce_perfect_block(cols_nat, height, backend)))
    # Binary decomposition: aligned perfect blocks of strictly decreasing
    # size.  Dispatch every block's reduction first (async futures), THEN
    # materialize — otherwise each readback (35 ms RTT through a remote
    # tunnel) serializes before the next block's dispatch.
    futures: list[tuple[object, int]] = []
    start = 0
    remaining = count
    while remaining:
        k = remaining.bit_length() - 1
        futures.append(
            (
                reduce_perfect_block(
                    jax.lax.dynamic_slice_in_dim(cols_nat, start, 1 << k, axis=1), k, backend
                ),
                k,
            )
        )
        start += 1 << k
        remaining -= 1 << k
    blocks = [(words_to_digest(np.asarray(root)), k) for root, k in futures]
    return _combine_ragged(blocks, height)


def merkle_root_of_digest_cols(cols_nat, count: int, backend: str = "auto") -> bytes:
    """Plain Merkle root (odd-self-pair rule) of ``count`` natural-order
    word-major digest columns — the single-slice ``Count()``-levels case."""
    return slice_root(cols_nat, count, ceil_log2(count) if count > 1 else 0, backend)
