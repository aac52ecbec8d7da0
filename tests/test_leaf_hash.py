"""Leaf-hash ("mapping") stage vs the hashlib oracle — XLA path on the CPU
test platform; the Pallas path is exercised bit-exactly on TPU hardware by
bench.py and (slowly, via interpret mode) by the `tpu_kernels` marker."""

import numpy as np
import pytest

from vk_merkle_roots_tpu import oracle
from vk_merkle_roots_tpu.ops.leaf_hash import leaf_hashes
from vk_merkle_roots_tpu.packing import pack_leaves
from vk_merkle_roots_tpu.utils.hexutil import words_to_digest
from tests.conftest import random_leaves


def _check(leaves, backend="xla"):
    packed = pack_leaves(leaves)
    digs = np.asarray(leaf_hashes(packed, backend=backend)).T[: packed.count]
    for i, leaf in enumerate(leaves):
        assert words_to_digest(digs[i]) == oracle.leaf_hash(leaf), f"leaf {i}"


def test_single_bucket_fixed_length(rng):
    _check(random_leaves(rng, 10, maxlen=32, minlen=32))


def test_mixed_lengths_multi_bucket(rng):
    _check(random_leaves(rng, 40, maxlen=200))


@pytest.mark.parametrize("length", [1, 55, 56, 63, 64, 65, 119, 120, 127])
def test_block_boundary_lengths(rng, length):
    _check([rng.integers(0, 256, length, np.uint8).tobytes() for _ in range(3)])


def test_empty_leaf_hashes_like_hashlib():
    _check([b"", b"a"])


def test_order_restored_across_buckets(rng):
    # Interleave bucket membership so inverse_order is non-trivial.
    leaves = []
    for i in range(30):
        leaves.append(bytes([i]) * (10 if i % 2 else 100))
    _check(leaves)


def test_host_routed_long_leaves_keep_order(rng):
    """max_device_blocks splits work between device buckets and the host
    SHA path; digests must still come back in input order, byte-exact."""
    from vk_merkle_roots_tpu.packing import pack_spans

    leaves = []
    for i in range(25):
        n = [20, 100, 700, 3000][i % 4]  # nblocks 1, 2, 12, 48
        leaves.append(rng.integers(0, 256, n, np.uint8).tobytes())
    lengths = np.array([len(x) for x in leaves], np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    data = np.frombuffer(b"".join(leaves), np.uint8)
    packed = pack_spans(data, offsets, lengths, max_device_blocks=8)
    assert packed.host_spans is not None
    assert {b.nblocks for b in packed.buckets} == {1, 2}
    digs = np.asarray(leaf_hashes(packed, backend="xla")).T[: packed.count]
    for i, leaf in enumerate(leaves):
        assert words_to_digest(digs[i]) == oracle.leaf_hash(leaf), f"leaf {i}"


def test_all_host_routed(rng):
    from vk_merkle_roots_tpu.packing import pack_spans

    leaves = [rng.integers(0, 256, 1000, np.uint8).tobytes() for _ in range(5)]
    lengths = np.array([len(x) for x in leaves], np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    data = np.frombuffer(b"".join(leaves), np.uint8)
    packed = pack_spans(data, offsets, lengths, max_device_blocks=8)
    assert not packed.buckets and packed.host_spans is not None
    digs = np.asarray(leaf_hashes(packed, backend="xla")).T[: packed.count]
    for i, leaf in enumerate(leaves):
        assert words_to_digest(digs[i]) == oracle.leaf_hash(leaf)


def test_quantized_output_cols(rng):
    leaves = random_leaves(rng, 70, maxlen=30)
    packed = pack_leaves(leaves)
    out = leaf_hashes(packed, backend="xla")
    assert out.shape[0] == 8  # word-major digest columns
    assert out.shape[1] >= packed.count
    assert out.shape[1] & (out.shape[1] - 1) == 0  # power of two


def test_stream_bucket_structure(rng):
    """Leaves past UNROLL_MAX_BLOCKS land in quantized stream buckets with
    per-leaf real block counts; the ladder keeps waste under 25%."""
    from vk_merkle_roots_tpu.packing import UNROLL_MAX_BLOCKS, pack_leaves, stream_capacity

    leaves = [rng.integers(0, 256, n, np.uint8).tobytes() for n in (600, 900, 5_000, 70_000)]
    packed = pack_leaves(leaves)
    stream = [b for b in packed.buckets if b.counts is not None]
    assert stream, "long leaves must form stream buckets"
    for b in stream:
        assert b.nblocks > UNROLL_MAX_BLOCKS
        assert (b.counts <= b.nblocks).all() and (b.counts > UNROLL_MAX_BLOCKS).all()
        from vk_merkle_roots_tpu.packing import quantized_tiles

        assert b.words.shape == (quantized_tiles(b.count), b.nblocks * 16, 8, 128)
    for nb in (9, 17, 100, 1025, 8000):
        cap = stream_capacity(nb)
        assert cap >= nb and cap <= max(-(-nb * 5) // 4, 16), (nb, cap)


def test_stream_path_xla_differential(rng):
    """Long leaves hashed on-device via the block-loop stream path (XLA
    fallback traces the same math as the Pallas kernel)."""
    _check(
        [rng.integers(0, 256, n, np.uint8).tobytes() for n in (513, 600, 640, 1000, 2000, 4096)]
    )


def test_stream_mixed_with_exact_and_host(rng):
    """All three routes live in one batch: exact buckets, stream buckets,
    host spans — order restored, byte-exact."""
    from vk_merkle_roots_tpu.packing import pack_spans

    sizes = [20, 600, 100, 5_000, 40, 900, 200_000, 7, 3_000]
    leaves = [rng.integers(0, 256, n, np.uint8).tobytes() for n in sizes]
    lengths = np.array([len(x) for x in leaves], np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    data = np.frombuffer(b"".join(leaves), np.uint8)
    packed = pack_spans(data, offsets, lengths, max_device_blocks=128)
    assert packed.host_spans is not None  # the 200_000-byte leaf
    assert any(b.counts is not None for b in packed.buckets)
    assert any(b.counts is None for b in packed.buckets)
    digs = np.asarray(leaf_hashes(packed, backend="xla")).T[: packed.count]
    for i, leaf in enumerate(leaves):
        assert words_to_digest(digs[i]) == oracle.leaf_hash(leaf), f"leaf {i}"


def test_stream_counts_do_not_mint_compiled_shapes(rng):
    """Quantized-shapes invariant: hashing stream buckets with different
    exact leaf counts (same tile quantization) must reuse ONE compiled
    program — the per-lane counts array is padded to the quantized column
    count on the host before it reaches the jitted kernel (an exact-length
    counts shape minted a fresh multi-minute Mosaic compile per novel
    count)."""
    from vk_merkle_roots_tpu.ops.leaf_hash import _stream_bucket_hashes, leaf_hashes
    from vk_merkle_roots_tpu.packing import pack_leaves

    def hash_n(n):
        leaves = [rng.integers(0, 256, 700, np.uint8).tobytes() for _ in range(n)]
        packed = pack_leaves(leaves)
        assert packed.buckets[0].counts is not None
        leaf_hashes(packed, backend="xla")

    hash_n(3)  # establish the single quantized shape (may already be cached)
    before = _stream_bucket_hashes._cache_size()
    hash_n(7)
    hash_n(11)
    assert _stream_bucket_hashes._cache_size() == before


def test_kernel_debug_hook_emits_and_gates(monkeypatch, capfd):
    """kdebug.emit prints from inside a Pallas kernel when
    VKMR_KERNEL_DEBUG is set and is a trace-time no-op otherwise.  A tiny
    custom kernel keeps this off the (uselessly slow) interpret path of the
    real SHA kernels; the hook WIRING in those kernels is exercised
    compiled on hardware by test_tpu_onchip.py::test_kernel_debug_on_chip."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from vk_merkle_roots_tpu.ops import kdebug

    def body(x_ref, o_ref):
        v = x_ref[...]
        kdebug.emit("kdebug_probe", v[0, 0])
        o_ref[...] = v + 1

    def run():
        x = jnp.full((8, 128), 41, jnp.uint32)
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            interpret=True,
        )(x)

    monkeypatch.delenv("VKMR_KERNEL_DEBUG", raising=False)
    assert int(np.asarray(run())[0, 0]) == 42
    quiet = capfd.readouterr()
    assert "kdebug_probe" not in quiet.out + quiet.err

    monkeypatch.setenv("VKMR_KERNEL_DEBUG", "1")
    assert int(np.asarray(run())[0, 0]) == 42
    loud = capfd.readouterr()
    assert "kdebug_probe" in loud.out + loud.err
