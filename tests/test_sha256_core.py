"""Shared compression math: rolled == unrolled == hashlib."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from vk_merkle_roots_tpu.ops import sha256_core
from vk_merkle_roots_tpu.packing import reference_padded_words
from vk_merkle_roots_tpu.utils.hexutil import words_to_digest


def _leaf_words_to_digest(leaf: bytes, unroll: bool) -> bytes:
    words = reference_padded_words(leaf)
    blocks = [
        [jnp.asarray(words[b * 16 + t]).reshape(1) for t in range(16)]
        for b in range(words.size // 16)
    ]
    state = sha256_core.leaf_digest_words(blocks, unroll=unroll)
    return words_to_digest(np.stack([np.asarray(s)[0] for s in state]))


@pytest.mark.parametrize("unroll", [False, True])
@pytest.mark.parametrize("leaf", [b"", b"abc", b"x" * 55, b"y" * 56, b"z" * 200])
def test_leaf_digest_matches_hashlib(leaf, unroll):
    want = hashlib.sha256(hashlib.sha256(leaf).digest()).digest()
    assert _leaf_words_to_digest(leaf, unroll) == want


@pytest.mark.parametrize("unroll", [False, True])
def test_node_hash_matches_hashlib(rng, unroll):
    l = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    r = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    lw = [jnp.asarray(np.frombuffer(l, ">u4")[j].astype(np.uint32)).reshape(1) for j in range(8)]
    rw = [jnp.asarray(np.frombuffer(r, ">u4")[j].astype(np.uint32)).reshape(1) for j in range(8)]
    got = sha256_core.node_hash_words(lw, rw, unroll=unroll)
    got_b = words_to_digest(np.stack([np.asarray(g)[0] for g in got]))
    want = hashlib.sha256(hashlib.sha256(l + r).digest()).digest()
    assert got_b == want


def test_constant_pad_schedule_consistency():
    """The precomputed pad-block schedule equals computing it live."""
    from vk_merkle_roots_tpu.constants import (
        PAD_BLOCK_64,
        PAD_BLOCK_64_SCHEDULE_PLUS_K,
        SHA256_K,
    )

    st = sha256_core.initial_state(jnp.zeros((2,), jnp.uint32))
    w16 = [jnp.full((2,), np.uint32(PAD_BLOCK_64[t]), jnp.uint32) for t in range(16)]
    a = sha256_core.compress(st, w16)
    b = sha256_core.compress_const_schedule(st, PAD_BLOCK_64_SCHEDULE_PLUS_K)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
