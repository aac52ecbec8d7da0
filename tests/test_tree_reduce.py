"""Tree reduction vs the oracle: perfect blocks, ragged slices with the
phantom-full-height rule, odd promotion at every level."""

import jax.numpy as jnp
import numpy as np
import pytest

from vk_merkle_roots_tpu import oracle
from vk_merkle_roots_tpu.ops.tree_reduce import (
    _bitrev,
    bitrev_fold_words,
    merkle_root_of_digest_cols,
    reduce_natural_body,
    reduce_perfect_block,
    slice_root,
)
from vk_merkle_roots_tpu.utils.hexutil import words_to_digest


def _digest_rows(rng, n):
    """(8, n) word-major columns (the device layout) + raw digest bytes."""
    d = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    return np.ascontiguousarray(d.T), [words_to_digest(d[i]) for i in range(n)]


@pytest.mark.parametrize("log2n", [0, 1, 2, 3, 5, 8])
def test_perfect_block(rng, log2n):
    d, raw = _digest_rows(rng, 1 << log2n)
    got = words_to_digest(np.asarray(reduce_perfect_block(jnp.asarray(d), log2n, "xla")))
    assert got == oracle.merkle_root_of_digests(raw)


@pytest.mark.parametrize("count,height", [(1, 3), (3, 2), (5, 3), (7, 3), (100, 7), (100, 9)])
def test_ragged_slice_phantom_height(rng, count, height):
    d, raw = _digest_rows(rng, count)
    got = slice_root(jnp.asarray(d), count, height, "xla")
    assert got == oracle.reduce_slice(raw, height)


@pytest.mark.parametrize("count", [1, 2, 3, 5, 6, 7, 9, 100, 255, 256, 257])
def test_plain_merkle_root(rng, count):
    d, raw = _digest_rows(rng, count)
    got = merkle_root_of_digest_cols(jnp.asarray(d), count, "xla")
    assert got == oracle.merkle_root_of_digests(raw)


# Sizes straddle _BITREV_FACTOR_MIN_LOG2 (=10): below uses the single
# row gather, at/above the factored axis-gather form; 11 and 13 are odd
# splits (a != b).
@pytest.mark.parametrize("log2n", [1, 4, 9, 10, 11, 12, 13])
def test_factored_bitrev_matches_gather(rng, log2n):
    n = 1 << log2n
    d = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    want = d[_bitrev(log2n)].T
    got = np.asarray(bitrev_fold_words(jnp.asarray(d.T), log2n))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("log2n", [0, 3, 11])
def test_reduce_natural_body(rng, log2n):
    d, raw = _digest_rows(rng, 1 << log2n)
    if log2n == 0:
        got = words_to_digest(np.asarray(jnp.asarray(d)[:, 0]))
    else:
        got = words_to_digest(
            np.asarray(reduce_natural_body(jnp.asarray(d), log2n, False, True))
        )
    assert got == oracle.merkle_root_of_digests(raw)


def test_count_out_of_range(rng):
    d, _ = _digest_rows(rng, 5)
    with pytest.raises(ValueError):
        slice_root(jnp.asarray(d), 5, 2, "xla")
    with pytest.raises(ValueError):
        slice_root(jnp.asarray(d), 0, 2, "xla")
