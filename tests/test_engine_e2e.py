"""End-to-end engine differential tests: TpuSha256D (device pipeline on the
CPU test platform) vs the serial oracle engine — the framework's version of
the reference's CPU-vs-GPU printed-root comparison (SURVEY.md §4)."""

import numpy as np
import pytest

from vk_merkle_roots_tpu import CpuSha256D, oracle
from vk_merkle_roots_tpu.config import EngineConfig
from vk_merkle_roots_tpu.models.tpu import TpuSha256D
from tests.conftest import random_leaves


def _tpu_engine(slice_log2=6, batch_leaves=50):
    return TpuSha256D(
        name="test",
        config=EngineConfig(slice_log2=slice_log2, batch_leaves=batch_leaves, backend="xla"),
    )


def test_empty_stream():
    e = _tpu_engine()
    assert e.Root() == ""
    assert CpuSha256D().Root() == ""


def test_single_leaf():
    e = _tpu_engine()
    assert e.Add(b"hello")
    assert e.Root() == oracle.merkle_root([b"hello"]).hex()


@pytest.mark.parametrize("n1,n2", [(3, 4), (70, 5), (100, 200), (64, 64), (130, 1)])
def test_grow_after_root(rng, n1, n2):
    """Root(), then more Adds, then Root() again == oracle over all leaves
    (the provisional ragged-tail root must be reopened, not frozen)."""
    leaves = random_leaves(rng, n1 + n2, maxlen=60)
    e = _tpu_engine()
    assert e.AddMany(leaves[:n1])
    assert e.Root() == oracle.merkle_root(leaves[:n1]).hex()
    assert e.AddMany(leaves[n1:])
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_grow_after_root_with_proofs(rng):
    """keep_digests snapshots follow the reopened tail."""
    leaves = random_leaves(rng, 100, maxlen=40)
    e = TpuSha256D(
        name="t",
        config=EngineConfig(slice_log2=6, batch_leaves=30, backend="xla", keep_digests=True),
    )
    assert e.AddMany(leaves[:80])
    e.Root()
    assert e.AddMany(leaves[80:])
    root = bytes.fromhex(e.Root())
    assert root == oracle.merkle_root(leaves)
    for i in (0, 79, 99):
        assert oracle.verify_proof(oracle.leaf_hash(leaves[i]), e.Proof(i)) == root


@pytest.mark.parametrize("n", [1, 2, 63, 64, 65, 200, 333])
def test_multi_slice_stream_matches_oracle(rng, n):
    """n spanning fewer/equal/more than one 64-leaf slice, incl. ragged."""
    leaves = random_leaves(rng, n, maxlen=100)
    e = _tpu_engine()
    assert e.AddMany(leaves)
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_addspans_bulk(rng):
    leaves = random_leaves(rng, 150, maxlen=60)
    lengths = np.array([len(x) for x in leaves])
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    data = np.frombuffer(b"".join(leaves), dtype=np.uint8)
    e = _tpu_engine()
    assert e.AddSpans(data, offsets, lengths)
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_incremental_adds_cross_flush_boundaries(rng):
    leaves = random_leaves(rng, 130, maxlen=40)
    e = _tpu_engine(slice_log2=5, batch_leaves=7)
    for leaf in leaves:
        assert e.Add(leaf)
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_reset_between_streams(rng):
    a = random_leaves(rng, 70, maxlen=30)
    b = random_leaves(rng, 30, maxlen=30)
    e = _tpu_engine()
    e.AddMany(a)
    r1 = e.Root()
    assert e.Reset()
    e.AddMany(b)
    assert e.Root() == oracle.merkle_root(b).hex()
    assert r1 == oracle.merkle_root(a).hex()


def test_backpressure_bound(rng):
    e = TpuSha256D(
        name="bp",
        config=EngineConfig(slice_log2=3, batch_leaves=8, backend="xla", max_slices_in_flight=2),
    )
    leaves = random_leaves(rng, 100, maxlen=20)
    assert e.AddMany(leaves)
    live = [r for r in e._roots if not isinstance(r, bytes)]
    assert len(live) <= 3
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_long_leaves_route_to_host_hasher(rng):
    """Leaves beyond device_max_blocks hash on the host but land in stream
    order; the root must match the oracle exactly."""
    small = random_leaves(rng, 40, maxlen=100)
    big = [rng.integers(0, 256, size=int(n), dtype=np.uint8).tobytes()
           for n in (600, 5_000, 70_000)]
    # Interleave: big leaves at positions 5, 20, 35.
    leaves = small[:5] + big[:1] + small[5:20] + big[1:2] + small[20:35] + big[2:] + small[35:]
    e = _tpu_engine(slice_log2=5, batch_leaves=16)
    assert e.AddMany(leaves)
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_all_leaves_long(rng):
    leaves = [rng.integers(0, 256, size=1000, dtype=np.uint8).tobytes() for _ in range(10)]
    e = _tpu_engine()
    assert e.AddMany(leaves)
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_batch_larger_than_slack_rejected():
    """batch_leaves beyond the slice slack region would let quantization
    padding clamp-and-corrupt the digest buffer; construction must refuse."""
    with pytest.raises(ValueError, match="slack"):
        TpuSha256D(name="t", config=EngineConfig(batch_leaves=1 << 18))


def test_oversized_leaf_rejected():
    from vk_merkle_roots_tpu.constants import MAX_LEAF_BYTES

    e = _tpu_engine()
    # Fabricate the span without allocating 512 MB.
    assert not e.AddSpans(
        np.zeros(1, np.uint8), np.zeros(1, np.int64), np.array([MAX_LEAF_BYTES + 1])
    )


def test_stats_shape(rng):
    e = _tpu_engine()
    e.AddMany(random_leaves(rng, 80, maxlen=30))
    e.Root()
    stats = e.Stats()
    assert stats["leaves"] == 80
    assert "stages" in stats and "pack" in stats["stages"]


def test_root_is_idempotent(rng):
    """Root() may be called repeatedly without re-folding the ragged tail
    (regression: the trailing slice root used to be appended per call)."""
    leaves = random_leaves(rng, 200, maxlen=40)  # 3 full 64-slices + tail
    e = _tpu_engine()
    e.AddMany(leaves)
    first = e.Root()
    assert first == oracle.merkle_root(leaves).hex()
    assert e.Root() == first
    assert e.Root() == first


def test_stats_device_sampling(rng):
    """1-in-N ops get true device-synchronized timing; those stages report
    GB_per_s, dispatch stages do not (round-1 'misleading stats' fix)."""
    e = TpuSha256D(
        name="ds",
        config=EngineConfig(
            slice_log2=4, batch_leaves=16, backend="xla", stats_sample_every=2
        ),
    )
    leaves = random_leaves(rng, 128, maxlen=30)
    assert e.AddMany(leaves)
    assert e.Root() == oracle.merkle_root(leaves).hex()
    stages = e.Stats()["stages"]
    assert stages["map_device"]["count"] >= 2
    assert "GB_per_s" in stages["map_device"]
    assert "GB_per_s" in stages["reduce_device"]
    assert "GB_per_s" not in stages["map_dispatch"]
    assert "GB_per_s" not in stages["reduce_dispatch"]


def test_device_oom_degrades_to_smaller_batches(rng):
    """Accept-smaller walk (Batches.cpp:352-385 analog): when the device
    rejects allocations above an artificial budget, the engine halves its
    batch cap, retries, and still produces the right root."""
    budget = {"max_rows": 1500, "ooms": 0}
    e = TpuSha256D(
        name="oom",
        config=EngineConfig(slice_log2=12, batch_leaves=4096, backend="xla"),
    )
    orig = e._hash_packed

    def tight(packed):
        if packed.count > budget["max_rows"]:
            budget["ooms"] += 1
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory (simulated)")
        return orig(packed)

    e._hash_packed = tight
    leaves = random_leaves(rng, 5000, maxlen=20)
    assert e.AddMany(leaves)
    assert e.Root() == oracle.merkle_root(leaves).hex()
    assert budget["ooms"] >= 1
    assert e._batch_cap <= 1024


def test_device_oom_at_floor_fails_soft(rng):
    """OOM at the minimum batch size: ingest reports failure (clean stop),
    the reference's Add->false contract (Vkmr.cpp:44-47).  Device dispatch
    trails ingest by the pack-ahead depth, so — like fence-polled async ops
    in the reference — the failure may surface on a *later* call than the
    one that queued the leaves; it must surface within a few batches."""
    e = TpuSha256D(
        name="oomf",
        config=EngineConfig(slice_log2=12, batch_leaves=4096, backend="xla"),
    )

    def always_oom(packed):
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory (simulated)")

    e._hash_packed = always_oom
    leaves = random_leaves(rng, 5000, maxlen=20)
    ok = e.AddMany(leaves)
    for _ in range(8):
        if not ok:
            break
        ok = e.AddMany(leaves)
    assert not ok


def test_host_pending_budget_bounds_queue(rng):
    """The host pending queue never holds more than host_pending_bytes when
    AddSpans returns (the Batches.cpp:294-331 heap-accounting analog): a
    tiny budget forces extra flushes but the root is unaffected."""
    leaves = random_leaves(rng, 400, maxlen=64)
    e = TpuSha256D(
        name="t",
        config=EngineConfig(
            slice_log2=6,
            batch_leaves=1 << 12,  # flush thresholds far above the budget:
            batch_bytes=64 << 20,  # only the budget can trigger drains
            host_pending_bytes=512,
            backend="xla",
        ),
    )
    for i in range(0, 400, 40):
        assert e.AddMany(leaves[i : i + 40])
        assert e._pending.nbytes <= 512
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_tiny_budgets_fuzz(rng):
    """Fuzz: arbitrary tiny slice/batch/host budgets all complete with the
    oracle root (the degrade paths must compose, VERDICT r1 next-step 8)."""
    for trial in range(6):
        n = int(rng.integers(1, 260))
        leaves = random_leaves(rng, n, maxlen=48)
        cfg = EngineConfig(
            slice_log2=int(rng.integers(2, 7)),
            batch_leaves=int(rng.integers(2, 60)),
            batch_bytes=int(rng.integers(64, 4096)),
            host_pending_bytes=int(rng.integers(32, 2048)),
            backend="xla",
        )
        e = TpuSha256D(name="t", config=cfg)
        step = max(1, n // 7)
        for i in range(0, n, step):
            assert e.AddMany(leaves[i : i + step])
        assert e.Root() == oracle.merkle_root(leaves).hex(), f"trial {trial}: {cfg}"


@pytest.mark.parametrize("depth", [0, 1, 3])
def test_pack_ahead_depths_match_oracle(rng, depth):
    """The flush pipeline must be depth-invariant: inline (0), single
    (1), and deep (3) pack-ahead all produce the oracle root over a
    multi-slice stream with ragged tail and mixed chunk sizes."""
    leaves = random_leaves(rng, 700, maxlen=60)
    e = TpuSha256D(
        name="pa",
        config=EngineConfig(
            slice_log2=7, batch_leaves=64, backend="xla", pack_ahead=depth
        ),
    )
    for lo in range(0, 700, 37):  # chunks straddle batch/slice boundaries
        assert e.AddMany(leaves[lo : lo + 37])
    assert e.Root() == oracle.merkle_root(leaves).hex()
    assert e.Reset()
    assert e.AddMany(leaves[:10])
    assert e.Root() == oracle.merkle_root(leaves[:10]).hex()


def test_device_tail_finalize_matches_oracle(rng):
    """host_tail_leaves=0 pins the DEVICE finalize (binary-decomposition
    reduction) so the engine-level wiring of that path stays covered now
    that small tails default to the host reduce."""
    leaves = random_leaves(rng, 333, maxlen=60)
    for slice_log2 in (6, 10):  # multi-slice ragged tail / single slice
        e = TpuSha256D(
            name="dt",
            config=EngineConfig(
                slice_log2=slice_log2, batch_leaves=50, backend="xla",
                host_tail_leaves=0,
            ),
        )
        assert e.AddMany(leaves)
        assert e.Root() == oracle.merkle_root(leaves).hex()
