"""High-level device Merkle root: leaves -> root in one call.

Convenience orchestration over ``packing`` + ``leaf_hash`` + ``tree_reduce``
for batch (non-streaming) use, plus a fixed-shape fused step function — the
"flagship forward step" — that jits the entire map+reduce for a static leaf
count (the TPU analog of the reference's whole-pipeline run for a known
dataset, SHA-256vk.cpp:288-313)."""

from __future__ import annotations

import jax
import numpy as np

from ..packing import pack_leaves
from ..utils.bitmath import bit_reverse_indices, ceil_log2, is_pow2
from ..utils.hexutil import words_to_digest
from .leaf_hash import TILE, _bucket_hashes, leaf_hashes
from .tree_reduce import (
    _reduce_words,
    merkle_root_of_digest_cols,
    reduce_natural_body,
)


def merkle_root_device(leaves: list[bytes], backend: str = "auto") -> bytes:
    """Byte-exact Merkle root of a list of leaves, computed on device.

    Power-of-two leaf counts are packed in bit-reversed order (a free
    host-side reordering, the same trick the streaming engine plays per
    batch — docs/DESIGN.md §2b), so the reduction runs permutation-free on
    the fold pipeline; other counts take the natural-order path with the
    factored bit-reversal."""
    if not leaves:
        raise ValueError("cannot take the Merkle root of zero leaves")
    count = len(leaves)
    if is_pow2(count) and count >= 2:
        k = ceil_log2(count)
        rev = bit_reverse_indices(k)
        packed = pack_leaves([leaves[i] for i in rev])
        digests = leaf_hashes(packed, backend)[:, :count]  # bitrev order
        interpret = jax.default_backend() != "tpu"
        use_pallas = backend == "pallas" or (backend == "auto" and not interpret)
        return words_to_digest(np.asarray(_reduce_words(digests, k, use_pallas, interpret)))
    packed = pack_leaves(leaves)
    digests = leaf_hashes(packed, backend)  # (8, quantized) word-major
    return merkle_root_of_digest_cols(digests, packed.count, backend)


def fused_root_fn(n_leaves: int, nblocks: int, backend: str = "auto"):
    """Build a jittable fixed-shape step: tile-major packed words
    (n_leaves/1024, nblocks*16, 8, 128) -> (8,) root words, with hashing
    and the full tree reduction in one compiled program.  ``n_leaves`` must
    be a power of two (>= one tile).

    This is the single-chip "forward step" used by ``__graft_entry__`` and
    the benchmarks.
    """
    if not is_pow2(n_leaves):
        raise ValueError("fused_root_fn requires a power-of-two leaf count")
    log2n = ceil_log2(n_leaves) if n_leaves > 1 else 0
    interpret = jax.default_backend() != "tpu"
    use_pallas = backend == "pallas" or (backend == "auto" and not interpret)

    def step(tiles):
        digests = _bucket_hashes(tiles, nblocks, use_pallas, interpret)[:, :n_leaves]
        if log2n == 0:
            return digests[:, 0]
        # Factored bit-reversal: the monolithic row gather was the largest
        # single overhead in the fused step (see bitrev_fold_words).
        return reduce_natural_body(digests, log2n, use_pallas, interpret)

    return step


def example_words(n_leaves: int, leaf_bytes: int, seed: int = 0) -> np.ndarray:
    """Deterministic packed-word input for a (n_leaves, fixed-size) batch —
    benchmark/example feed."""
    rng = np.random.default_rng(seed)
    leaves = [rng.integers(32, 126, size=leaf_bytes, dtype=np.uint8).tobytes() for _ in range(n_leaves)]
    packed = pack_leaves(leaves)
    assert len(packed.buckets) == 1
    return packed.buckets[0].words
