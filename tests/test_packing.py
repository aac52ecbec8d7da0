"""Packing layout: FIPS padding, word conversion, bucketing, line splitting
(the host equivalents of Batches.cpp:64-121 and the shader's in-kernel
padding, SHA-256.comp:207-285)."""

import numpy as np
import pytest

from vk_merkle_roots_tpu.constants import MAX_LEAF_BYTES, padded_block_count
from vk_merkle_roots_tpu.packing import (
    pack_leaves,
    pack_spans,
    reference_padded_words,
    split_lines,
)


@pytest.mark.parametrize(
    "length", [0, 1, 3, 4, 54, 55, 56, 63, 64, 65, 118, 119, 120, 127, 128, 200, 1024]
)
def test_padding_matches_reference_scalar(rng, length):
    """Every block-boundary edge case packs exactly like the scalar oracle."""
    leaf = rng.integers(0, 256, size=length, dtype=np.uint8).tobytes()
    packed = pack_leaves([leaf])
    assert len(packed.buckets) == 1
    b = packed.buckets[0]
    assert b.nblocks == padded_block_count(length)
    np.testing.assert_array_equal(b.leaf_words(0), reference_padded_words(leaf))


def test_bucketing_and_order(rng):
    leaves = [b"a" * 10, b"b" * 100, b"c" * 10, b"d" * 200, b"e" * 100]
    packed = pack_leaves(leaves)
    assert packed.count == 5
    assert packed.total_bytes == 420
    # Buckets sorted by block count: 10B->1, 100B->2, 200B->4
    assert [b.nblocks for b in packed.buckets] == [1, 2, 4]
    assert [b.count for b in packed.buckets] == [2, 2, 1]
    # order/inverse_order are mutually inverse permutations
    assert sorted(packed.order.tolist()) == list(range(5))
    np.testing.assert_array_equal(packed.order[packed.inverse_order], np.arange(5))
    # Word content of a specific leaf survives the permutation
    bucket2 = [b for b in packed.buckets if b.nblocks == 2][0]
    d_row = int(packed.inverse_order[1])  # leaf "b"*100 is original index 1
    base = packed.buckets[0].count  # concat offset of the nblocks=2 bucket
    np.testing.assert_array_equal(
        bucket2.leaf_words(d_row - base), reference_padded_words(b"b" * 100)
    )


def test_pack_spans_equals_pack_leaves(rng):
    leaves = [rng.integers(0, 256, size=int(n), dtype=np.uint8).tobytes() for n in rng.integers(1, 200, 50)]
    lengths = np.array([len(x) for x in leaves])
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    data = np.frombuffer(b"".join(leaves), dtype=np.uint8)
    a = pack_leaves(leaves)
    b = pack_spans(data, offsets, lengths)
    for ba, bb in zip(a.buckets, b.buckets):
        np.testing.assert_array_equal(ba.words, bb.words)
    np.testing.assert_array_equal(a.order, b.order)


def test_pack_empty():
    packed = pack_leaves([])
    assert packed.count == 0 and packed.buckets == []


def test_max_leaf_rejected():
    with pytest.raises(ValueError):
        pack_spans(
            np.zeros(1, np.uint8),
            np.zeros(1, np.int64),
            np.array([MAX_LEAF_BYTES + 1], np.int64),
        )


class TestSplitLines:
    def test_basic(self):
        data, offs, lens = split_lines(b"ab\ncd\n")
        assert offs.tolist() == [0, 3] and lens.tolist() == [2, 2]

    def test_trailing_fragment_counts(self):
        data, offs, lens = split_lines(b"ab\ncd")
        assert offs.tolist() == [0, 3] and lens.tolist() == [2, 2]

    def test_empty_lines_surface(self):
        _, offs, lens = split_lines(b"\na\n\nb\n")
        assert lens.tolist() == [0, 1, 0, 1]

    def test_empty_buffer(self):
        _, offs, lens = split_lines(b"")
        assert lens.size == 0
