"""Oracle semantics: leaf/node rules, odd promotion, slice decomposition.

These pin the ground-truth Merkle semantics the device paths must match
(reference: SHA-256plus.cpp:491-563, README.md:87-96)."""

import hashlib

import pytest

from vk_merkle_roots_tpu import oracle
from tests.conftest import random_leaves


def h(b):
    return hashlib.sha256(b).digest()


def sha256d(b):
    return h(h(b))


def test_leaf_is_double_sha256():
    assert oracle.leaf_hash(b"abc") == sha256d(b"abc")
    assert oracle.leaf_hash(b"") == sha256d(b"")


def test_known_sha256d_vector():
    # sha256d("hello") — independently computable with hashlib.
    expect = hashlib.sha256(hashlib.sha256(b"hello").digest()).hexdigest()
    assert oracle.sha256d(b"hello").hex() == expect


def test_single_leaf_root_is_leaf_hash():
    assert oracle.merkle_root([b"x"]) == sha256d(b"x")


def test_two_leaves():
    l0, l1 = sha256d(b"a"), sha256d(b"b")
    assert oracle.merkle_root([b"a", b"b"]) == sha256d(l0 + l1)


def test_odd_promotion_duplicates_last():
    # Three leaves: level1 = [h(01), h(22)]; root = h(level1).
    d = [sha256d(x) for x in (b"a", b"b", b"c")]
    lvl1 = [sha256d(d[0] + d[1]), sha256d(d[2] + d[2])]
    assert oracle.merkle_root([b"a", b"b", b"c"]) == sha256d(lvl1[0] + lvl1[1])


def test_empty_root_raises():
    with pytest.raises(ValueError):
        oracle.merkle_root([])


def test_reduce_slice_phantom_height():
    # One digest reduced through height 2 keeps self-pairing:
    # h(h(x,x), h(x,x)).
    x = sha256d(b"x")
    hx = sha256d(x + x)
    assert oracle.reduce_slice([x], 2) == sha256d(hx + hx)


def test_reduce_slice_capacity_check():
    with pytest.raises(ValueError):
        oracle.reduce_slice([b"0" * 32] * 3, 1)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 33, 64, 100, 255])
@pytest.mark.parametrize("slice_log2", [0, 1, 2, 3, 5])
def test_sliced_equals_flat(rng, n, slice_log2):
    """The slice decomposition (incl. phantom full-height for the ragged
    tail) must reproduce the flat Merkle root for every (n, slice size)."""
    leaves = random_leaves(rng, n, maxlen=40)
    assert oracle.merkle_root_sliced(leaves, slice_log2) == oracle.merkle_root(leaves)


def test_variable_length_leaves(rng):
    leaves = random_leaves(rng, 64, maxlen=300) + [b"", b"a" * 1024]
    # Empty leaves are legal at the oracle level (the CLI filters them).
    root = oracle.merkle_root(leaves)
    assert len(root) == 32
