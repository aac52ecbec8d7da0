"""Group-bitrev slice storage (round 4): each full flushed batch is packed
in bit-reversed order so slice reduction needs no device permutation
(ops/tree_reduce.reduce_grouped_body).  Differential vs the oracle across
flush patterns that exercise every layout branch: full-group appends,
partial scatter appends, natural-layout fallback, ragged tails, proofs,
journals, and the slice-OOM accept-smaller walk."""

import json

import numpy as np
import pytest

from vk_merkle_roots_tpu import oracle
from vk_merkle_roots_tpu.config import EngineConfig
from vk_merkle_roots_tpu.models.tpu import TpuSha256D
from vk_merkle_roots_tpu.ops.tree_reduce import (
    _bitrev,
    group_bitrev_to_natural,
    reduce_grouped_body,
)
from vk_merkle_roots_tpu.utils.hexutil import words_to_digest
from tests.conftest import random_leaves


def _grouped_cfg(**kw):
    kw.setdefault("slice_log2", 6)
    kw.setdefault("batch_leaves", 16)  # power of two -> grouping on
    kw.setdefault("backend", "xla")
    return EngineConfig(**kw)


def _store_grouped(digs: np.ndarray, k: int) -> np.ndarray:
    """Natural (n, 8) digest words -> group-bitrev storage (n, 8)."""
    n = digs.shape[0]
    g = 1 << k
    rev = _bitrev(k)
    store = np.empty_like(digs)
    idx = np.arange(n)
    store[(idx // g) * g + rev[idx % g]] = digs
    return store


@pytest.mark.parametrize(
    "log2n,k", [(4, 2), (6, 6), (8, 4), (10, 10), (11, 8), (12, 9)]
)
def test_reduce_grouped_matches_oracle(rng, log2n, k):
    n = 1 << log2n
    digs = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint32)
    want = oracle.merkle_root_of_digests([words_to_digest(digs[i]) for i in range(n)])
    x = np.ascontiguousarray(_store_grouped(digs, k).T)
    got = words_to_digest(np.asarray(reduce_grouped_body(x, log2n, k, False, True)))
    assert got == want
    nat = np.asarray(group_bitrev_to_natural(x, log2n, k))
    assert np.array_equal(nat, digs.T)


def test_engine_grouped_steady_state(rng):
    """Aligned pow-2 batches -> every flush is a grouped append; roots match
    the oracle across slice boundaries and a ragged tail."""
    for count in (16, 64, 80, 200, 257):
        leaves = random_leaves(rng, count, maxlen=40)
        e = TpuSha256D(name="g", config=_grouped_cfg())
        assert e.AddMany(leaves)
        assert e._slice_grouped in (True, None)  # grouped or already reduced
        assert e.Root() == oracle.merkle_root(leaves).hex()


def test_engine_grouped_partial_scatter(rng):
    """A grouped slice that later receives a partial (sub-group) append must
    scatter through the same layout: group flush of 16, then 6 more leaves
    drained at Root()."""
    leaves = random_leaves(rng, 22, maxlen=40)
    e = TpuSha256D(name="g", config=_grouped_cfg())
    assert e.AddMany(leaves[:16])  # full group -> grouped layout
    # The layout decision is made at pack submission (the dispatch may
    # trail by the pack-ahead depth): the plan must be grouped, and the
    # dispatched state must agree once the batch lands.
    assert e._plan_grouped is True
    assert e._slice_grouped in (None, True)
    assert e.AddMany(leaves[16:])  # 6 pending, below batch: no flush yet
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_engine_partial_first_append_stays_natural(rng):
    """A slice whose FIRST append is smaller than a group keeps the natural
    layout (no scatter, factored-bitrev reduction)."""
    leaves = random_leaves(rng, 7, maxlen=40)
    e = TpuSha256D(name="g", config=_grouped_cfg())
    assert e.AddMany(leaves)
    assert e.Root() == oracle.merkle_root(leaves).hex()
    assert e._slice_grouped is False


def test_engine_grouped_mixed_chunk_sizes(rng):
    """AddSpans chunks that straddle group boundaries (merge path: a group
    assembled from multiple pending chunks)."""
    leaves = random_leaves(rng, 150, maxlen=30)
    e = TpuSha256D(name="g", config=_grouped_cfg())
    for lo in range(0, 150, 7):  # 7-leaf chunks: every group merges chunks
        assert e.AddMany(leaves[lo : lo + 7])
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_engine_grouped_proofs(rng):
    """keep_digests snapshots un-permute group-bitrev storage; proofs verify
    for leaves in full slices, grouped tails, and scatter-appended spans."""
    leaves = random_leaves(rng, 150, maxlen=40)
    e = TpuSha256D(name="g", config=_grouped_cfg(keep_digests=True))
    assert e.AddMany(leaves)
    root = bytes.fromhex(e.Root())
    assert root == oracle.merkle_root(leaves)
    for i in (0, 5, 63, 64, 127, 128, 149):
        assert oracle.verify_proof(oracle.leaf_hash(leaves[i]), e.Proof(i)) == root


def test_engine_grouped_grow_after_root(rng):
    leaves = random_leaves(rng, 100, maxlen=40)
    e = TpuSha256D(name="g", config=_grouped_cfg())
    assert e.AddMany(leaves[:80])
    assert e.Root() == oracle.merkle_root(leaves[:80]).hex()
    assert e.AddMany(leaves[80:])
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_engine_grouped_journal_roundtrip(rng, tmp_path):
    """Journal + resume with grouping enabled (pow-2 batches)."""
    leaves = random_leaves(rng, 200, maxlen=40)
    cfg = _grouped_cfg(journal_path=str(tmp_path / "j.jsonl"))
    e = TpuSha256D(name="gj", config=cfg)
    assert e.AddMany(leaves)
    want = e.Root()
    assert want == oracle.merkle_root(leaves).hex()
    lines = [json.loads(l) for l in open(cfg.journal_path)]
    assert [l["slice"] for l in lines] == [0, 1, 2]

    e2 = TpuSha256D(name="gj2", config=_grouped_cfg())
    e2.PreloadSliceRoots([bytes.fromhex(l["root"]) for l in lines])
    assert e2.AddMany(leaves[192:])
    assert e2.Root() == want


def test_engine_grouped_matches_nongrouped(rng):
    """The same stream through grouped (pow-2 batch) and natural (non-pow-2
    batch) engines yields the same root — storage layout is invisible."""
    leaves = random_leaves(rng, 300, maxlen=50)
    a = TpuSha256D(name="a", config=_grouped_cfg(batch_leaves=32))
    b = TpuSha256D(name="b", config=_grouped_cfg(batch_leaves=30))
    assert a.AddMany(leaves) and b.AddMany(leaves)
    ra, rb = a.Root(), b.Root()
    assert ra == rb == oracle.merkle_root(leaves).hex()
    assert a._group_log2 == 5 and b._group_log2 is None


def test_slice_oom_degrade_walk(rng, monkeypatch):
    """_ensure_buf OOM walks the slice size down (accept-smaller allocation,
    Slices.h:316-384 parity) and still produces the correct root for the
    degraded tree shape."""
    import jax

    real_put = jax.device_put
    max_cols = (1 << 4) + (1 << 17)  # allow 2^4-leaf slices and below

    def fake_put(x, device=None, **kw):
        if hasattr(x, "shape") and len(getattr(x, "shape", ())) == 2:
            if x.shape[0] == 8 and x.shape[1] > max_cols:
                raise RuntimeError("RESOURCE_EXHAUSTED: fake tiny HBM")
        return real_put(x, device, **kw)

    monkeypatch.setattr(jax, "device_put", fake_put)
    monkeypatch.setattr(TpuSha256D, "_SLICE_FLOOR_LOG2", 4)

    leaves = random_leaves(rng, 70, maxlen=30)
    e = TpuSha256D(name="oom", config=_grouped_cfg(slice_log2=10, batch_leaves=16))
    assert e.AddMany(leaves)
    assert e.config.slice_log2 == 4  # walked 10 -> 4
    # Slice decomposition is root-invariant (phantom rule), so the degraded
    # shape still produces the canonical root.
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_slice_oom_degrade_refused_after_commit(rng, monkeypatch):
    """Once a slice has completed, a later OOM cannot silently change the
    tree shape: the walk refuses (fail-soft Add -> False)."""
    import jax

    leaves = random_leaves(rng, 40, maxlen=30)
    e = TpuSha256D(name="oomc", config=_grouped_cfg(slice_log2=5, batch_leaves=16))
    assert e.AddMany(leaves)
    assert e.Drain()  # settle the pack-ahead queue: one full slice committed
    assert e._full_slices >= 1

    real_put = jax.device_put

    def fail_put(x, device=None, **kw):
        raise RuntimeError("RESOURCE_EXHAUSTED: fake")

    e._buf = None  # force re-allocation
    monkeypatch.setattr(jax, "device_put", fail_put)
    monkeypatch.setattr(TpuSha256D, "_SLICE_FLOOR_LOG2", 4)
    assert e.AddMany(random_leaves(rng, 20, maxlen=30)) is False
    assert e.config.slice_log2 == 5  # unchanged
    monkeypatch.setattr(jax, "device_put", real_put)


def test_merge_chunks_sparse_spans(rng):
    """A grouped flush merging chunks whose spans are sparse over a large
    shared buffer must extract O(payload) bytes (vectorized per-span
    gather) and still produce the oracle root."""
    buf = rng.integers(0, 256, size=1 << 20, dtype=np.uint8)
    # 8 leaves scattered across the megabyte, fed as two 4-leaf chunks.
    offsets = np.array([0, 300_000, 600_000, 900_000, 50, 200_001, 700_007, 999_000], np.int64)
    lengths = np.array([10, 20, 30, 40, 11, 21, 31, 24], np.int64)
    e = TpuSha256D(name="sp", config=_grouped_cfg(slice_log2=4, batch_leaves=8))
    assert e.AddSpans(buf, offsets[:4], lengths[:4])
    assert e.AddSpans(buf, offsets[4:], lengths[4:])
    leaves = [buf[int(o) : int(o + l)].tobytes() for o, l in zip(offsets, lengths)]
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_slice_oom_degrade_refused_when_journaling(rng, monkeypatch, tmp_path):
    """A journaling engine must NOT degrade the slice size after ingest has
    begun: the stream-integrity snapshots are keyed to the original slice
    boundaries and cannot be rebased (fail soft instead)."""
    import jax

    def fail_put(x, device=None, **kw):
        raise RuntimeError("RESOURCE_EXHAUSTED: fake")

    monkeypatch.setattr(jax, "device_put", fail_put)
    monkeypatch.setattr(TpuSha256D, "_SLICE_FLOOR_LOG2", 2)
    e = TpuSha256D(
        name="jd",
        config=_grouped_cfg(
            slice_log2=6, batch_leaves=16, journal_path=str(tmp_path / "j.jsonl")
        ),
    )
    assert e.AddMany(random_leaves(rng, 40, maxlen=30)) is False
    assert e.config.slice_log2 == 6  # no silent shape change
