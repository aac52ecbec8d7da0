"""Native C++ library vs the Python/NumPy implementations (byte equality
everywhere; the .so is a fast path, never a semantic fork)."""

import io

import numpy as np
import pytest

from vk_merkle_roots_tpu import oracle
from vk_merkle_roots_tpu.native import lib as nl
from vk_merkle_roots_tpu.packing import pack_leaves, reference_padded_words
from tests.conftest import random_leaves

pytestmark = pytest.mark.skipif(not nl.native_available(), reason="native lib unavailable")


def test_leaf_hashes_match_oracle(rng):
    leaves = random_leaves(rng, 50, maxlen=300) + [b"", b"x" * 1024]
    got = nl.native_leaf_hashes(leaves)
    assert got == [oracle.leaf_hash(x) for x in leaves]


def test_merkle_root_matches_oracle(rng):
    for n in (1, 2, 3, 7, 64, 100):
        leaves = random_leaves(rng, n, maxlen=50)
        digs = np.frombuffer(
            b"".join(oracle.leaf_hash(x) for x in leaves), np.uint8
        ).reshape(-1, 32)
        assert nl.native_merkle_root(digs) == oracle.merkle_root(leaves)


def test_phantom_height_matches_oracle(rng):
    leaves = random_leaves(rng, 5, maxlen=20)
    digs = np.frombuffer(b"".join(oracle.leaf_hash(x) for x in leaves), np.uint8).reshape(-1, 32)
    want = oracle.reduce_slice([oracle.leaf_hash(x) for x in leaves], 4)
    assert nl.native_merkle_root(digs, height=4) == want


def test_merkle_root_error_codes(rng):
    digs = np.zeros((5, 32), np.uint8)
    with pytest.raises(ValueError):
        nl.native_merkle_root(digs, height=2)  # 5 > 2^2


def test_pack_bucket_matches_numpy(rng):
    for length in (0, 1, 55, 56, 64, 127, 200):
        leaf = rng.integers(0, 256, length, np.uint8).tobytes()
        data = np.frombuffer(leaf, np.uint8) if leaf else np.zeros(0, np.uint8)
        nb = (length + 9 + 63) // 64
        out = nl.native_pack_bucket_tiles(
            data, np.zeros(1, np.int64), np.array([length], np.int64), nb, 1,
        )
        assert out.shape == (1, nb * 16, 8, 128)
        np.testing.assert_array_equal(out[0, :, 0, 0], reference_padded_words(leaf))
        assert not out[0, :, 0, 1:].any() and not out[0, :, 1:].any()


def test_rndm_stream_matches_python():
    from vk_merkle_roots_tpu.tools.rndm import GlibcRand

    stream = nl.native_rndm_stream(1712489279, 32, 50)
    rng = GlibcRand(1712489279)
    expect = bytearray()
    for _ in range(32):
        n = 1 + rng.rand() % 49
        expect += bytes(32 + rng.rand() % 94 for _ in range(n)) + b"\n"
    assert stream == bytes(expect)


def test_rndm_rejects_degenerate_maxlen():
    with pytest.raises(ValueError):
        nl.native_rndm_stream(1, 10, 1)


def test_cpu_engine_uses_native_consistently(rng):
    """CpuSha256D via spans (native path) == per-leaf hashlib path."""
    from vk_merkle_roots_tpu.models.cpu import CpuSha256D

    leaves = random_leaves(rng, 100, maxlen=80)
    lengths = np.array([len(x) for x in leaves])
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    data = np.frombuffer(b"".join(leaves), np.uint8)
    a = CpuSha256D()
    assert a.AddSpans(data, offsets, lengths)
    b = CpuSha256D()
    for leaf in leaves:
        b.Add(leaf)
    assert a.Root() == b.Root() == oracle.merkle_root(leaves).hex()


def test_shani_and_scalar_paths_agree(rng, tmp_path):
    """The SHA-NI and scalar compressions are load-time dispatch alternatives
    of the same function; prove byte-equality by hashing the same stream in a
    subprocess with VKMR_FORCE_SCALAR=1 and comparing against this process's
    (possibly hardware-accelerated) result."""
    import os
    import subprocess
    import sys

    leaves = random_leaves(rng, 64, maxlen=200)
    here = nl.native_leaf_hashes(leaves)
    digs = np.frombuffer(b"".join(here), np.uint8).reshape(-1, 32)
    root_here = nl.native_merkle_root(digs)
    blob = tmp_path / "leaves.bin"
    blob.write_bytes(b"\x00".join(x.hex().encode() for x in leaves))
    code = (
        "import sys, numpy as np\n"
        "from vk_merkle_roots_tpu.native import lib as nl\n"
        "assert not nl.native_shani_active(), 'VKMR_FORCE_SCALAR ignored'\n"
        "leaves = [bytes.fromhex(t.decode()) for t in open(sys.argv[1],'rb').read().split(b'\\x00')]\n"
        "h = nl.native_leaf_hashes(leaves)\n"
        "d = np.frombuffer(b''.join(h), np.uint8).reshape(-1, 32)\n"
        "sys.stdout.write(nl.native_merkle_root(d).hex())\n"
    )
    env = dict(os.environ, VKMR_FORCE_SCALAR="1", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, "-c", code, str(blob)],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout == root_here.hex()


def test_standalone_native_cli(rng, tmp_path):
    """The zero-Python vkmr-cpu binary agrees with the oracle on a stream
    with empty lines and a trailing fragment."""
    import os
    import subprocess

    d = os.path.join(os.path.dirname(nl.__file__))
    r = subprocess.run(["make", "-C", d, "-s", "vkmr-cpu"], capture_output=True, timeout=120)
    if r.returncode != 0:
        pytest.skip(f"native CLI build unavailable: {r.stderr.decode()[:200]}")
    leaves = random_leaves(rng, 50, maxlen=60)
    leaves = [x.replace(b"\n", b"x") or b"y" for x in leaves]
    stream = b"\n\n".join(leaves)  # empty line between every pair, no trailing \n
    out = subprocess.run(
        [os.path.join(d, "vkmr-cpu")], input=stream, capture_output=True, timeout=120
    )
    assert out.returncode == 0
    root = out.stdout.decode().split("=> ")[1].split(" ")[0]
    assert root == oracle.merkle_root(leaves).hex()


def test_packing_native_vs_numpy_fallback(rng, monkeypatch):
    leaves = random_leaves(rng, 60, maxlen=150)
    with_native = pack_leaves(leaves)
    import vk_merkle_roots_tpu.native.lib as nlib

    monkeypatch.setattr(nlib, "_load", lambda: None)
    without = pack_leaves(leaves)
    for a, b in zip(with_native.buckets, without.buckets):
        np.testing.assert_array_equal(a.words, b.words)

def test_grouped_packer_edges_vs_fallback(rng, monkeypatch):
    """The 16-leaf group-transpose packer across its edge cases: partial
    tail groups (n % 16 != 0), multi-tile buckets (n > 1024), and stream
    buckets whose groups mix block counts (the group-max word bound must
    still zero every plane a shorter member's predication reads)."""
    import vk_merkle_roots_tpu.native.lib as nlib
    from vk_merkle_roots_tpu.packing import UNROLL_MAX_BLOCKS, pack_spans

    sizes = [1, 15, 16, 17, 1023, 1024, 1041]
    for n in sizes:
        lens = rng.integers(1, 64 * (UNROLL_MAX_BLOCKS + 40), size=n).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        data = rng.integers(0, 256, size=int(lens.sum()), dtype=np.uint8)
        with_native = pack_spans(data, offs, lens)
        with monkeypatch.context() as m:
            m.setattr(nlib, "_load", lambda: None)
            without = pack_spans(data, offs, lens)
        assert [b.nblocks for b in with_native.buckets] == [
            b.nblocks for b in without.buckets
        ]
        np.testing.assert_array_equal(with_native.order, without.order)
        for a, b in zip(with_native.buckets, without.buckets):
            np.testing.assert_array_equal(a.words, b.words)
            if a.counts is not None:
                np.testing.assert_array_equal(a.counts, b.counts)


def test_grouped_packer_rows_past_n_zero(rng):
    """Rows past the leaf count stay zero (tail scratch rows are zeroed
    before the transpose; tile slack is never touched)."""
    n = 37  # two full groups + a 5-leaf tail, one tile of slack rows
    lens = np.full(n, 119, np.int64)
    offs = np.arange(n, dtype=np.int64) * 119
    data = rng.integers(0, 256, size=119 * n, dtype=np.uint8)
    out = nl.native_pack_bucket_tiles(data, offs, lens, 2, 1)
    flat = out.reshape(1, 32, 1024)  # [tile, word, lane]
    assert flat[0, :, n:].sum() == 0
    for i in range(n):
        np.testing.assert_array_equal(
            flat[0, :, i], reference_padded_words(data[offs[i] : offs[i] + 119].tobytes())
        )
