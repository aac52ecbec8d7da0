"""Property-based invariants (hypothesis): the algebraic rules that make the
device pipeline sound, shrunk to minimal counterexamples on failure.

These generalize the parametrized cases in test_oracle/test_tree_reduce:
slice decomposition must be invisible (merkle_root_sliced == merkle_root for
EVERY (n, slice_log2)), packing must round-trip byte-exactly, and proofs
must verify for every index — the semantics of SHA-256plus.cpp:491-556 and
README.md:87-96 of the reference, held as universally-quantified laws."""

import numpy as np
from hypothesis import given, settings, strategies as st

from vk_merkle_roots_tpu import oracle
from vk_merkle_roots_tpu.packing import pack_spans, reference_padded_words

leaf = st.binary(min_size=0, max_size=300)


@settings(max_examples=40, deadline=None)
@given(st.lists(leaf, min_size=1, max_size=64), st.integers(1, 7))
def test_slice_decomposition_invisible(leaves, slice_log2):
    assert oracle.merkle_root_sliced(leaves, slice_log2) == oracle.merkle_root(leaves)


@settings(max_examples=40, deadline=None)
@given(st.lists(leaf, min_size=1, max_size=32))
def test_proofs_verify_for_every_index(leaves):
    root = oracle.merkle_root(leaves)
    for i in range(len(leaves)):
        path = oracle.merkle_proof(leaves, i)
        assert oracle.verify_proof(oracle.leaf_hash(leaves[i]), path) == root


@settings(max_examples=40, deadline=None)
@given(st.lists(leaf, min_size=1, max_size=40), st.integers(1, 16))
def test_pack_spans_matches_scalar_padding(leaves, max_device_blocks):
    lengths = np.array([len(x) for x in leaves], np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    data = np.frombuffer(b"".join(leaves), np.uint8) if lengths.sum() else np.zeros(0, np.uint8)
    packed = pack_spans(data, offsets, lengths, max_device_blocks=max_device_blocks)
    # Reassemble per-leaf padded words from buckets via order and compare to
    # the scalar oracle padding; host-routed leaves carry no words by design.
    row = 0
    rows_by_leaf = {}
    for b in packed.buckets:
        for r in range(b.count):
            rows_by_leaf[int(packed.order[row])] = b.leaf_words(r)
            row += 1
    for i, lf in enumerate(leaves):
        want_blocks = (len(lf) + 9 + 63) // 64
        if want_blocks > max_device_blocks:
            assert i not in rows_by_leaf
        else:
            # Exact buckets hold exactly the padded message; stream buckets
            # (block count > UNROLL_MAX_BLOCKS) zero-extend the row to the
            # quantized capacity rung.
            want = reference_padded_words(lf)
            got = rows_by_leaf[i]
            np.testing.assert_array_equal(got[: want.size], want)
            assert not got[want.size :].any()
    # host_spans covers exactly the long leaves, in order.
    if packed.host_spans is not None:
        _, hoffs, hlens = packed.host_spans
        long_idx = [i for i, lf in enumerate(leaves) if (len(lf) + 9 + 63) // 64 > max_device_blocks]
        assert list(hlens) == [len(leaves[i]) for i in long_idx]


@settings(max_examples=30, deadline=None)
@given(st.lists(leaf, min_size=1, max_size=24), st.integers(0, 6))
def test_phantom_height_equals_padding_with_self_pairs(leaves, extra):
    """reduce_slice(digests, height) == folding the root of the ragged count
    up `extra` phantom levels by self-pairing — the Reductions.cpp:293 rule
    stated as an equation."""
    digests = [oracle.leaf_hash(x) for x in leaves]
    base = (len(digests) - 1).bit_length()
    want = oracle.merkle_root_of_digests(digests)
    for _ in range(extra):
        want = oracle.node_hash(want, want)
    assert oracle.reduce_slice(digests, base + extra) == want
