"""Seeded randomized differential sweep: every engine/config combination
must agree with the oracle on randomized streams (the de-facto test
methodology of the reference — two engines behind one loop, compared by
printed root; SURVEY.md §4 — industrialized)."""

import numpy as np
import pytest

from vk_merkle_roots_tpu import CpuSha256D, oracle
from vk_merkle_roots_tpu.config import EngineConfig
from vk_merkle_roots_tpu.models.tpu import TpuSha256D
from tests.conftest import random_leaves


@pytest.mark.parametrize("trial", range(8))
def test_randomized_stream_all_engines_agree(trial):
    rng = np.random.default_rng(1000 + trial)
    n = int(rng.integers(1, 400))
    maxlen = int(rng.integers(2, 300))
    leaves = [
        rng.integers(0, 256, size=int(rng.integers(1, maxlen)), dtype=np.uint8).tobytes()
        for _ in range(n)
    ]
    # Sprinkle in host-routed long leaves (> device_max_blocks) on some
    # trials so the device/host split is fuzzed too.
    if trial % 2:
        for i in rng.integers(0, n, size=3):
            leaves[int(i)] = rng.integers(
                0, 256, size=int(rng.integers(600, 4000)), dtype=np.uint8
            ).tobytes()
    want = oracle.merkle_root(leaves).hex()

    cpu = CpuSha256D()
    assert cpu.AddMany(leaves)
    assert cpu.Root() == want

    slice_log2 = int(rng.integers(3, 9))
    batch = int(rng.integers(5, 200))
    dev = TpuSha256D(
        name="fuzz",
        config=EngineConfig(slice_log2=slice_log2, batch_leaves=batch, backend="xla"),
    )
    assert dev.AddMany(leaves)
    assert dev.Root() == want, f"slice_log2={slice_log2} batch={batch} n={n}"


def test_pathological_lengths():
    """All leaves exactly at block boundaries, interleaved."""
    leaves = []
    for i in range(60):
        leaves.append(bytes([i]) * [1, 55, 56, 64, 119, 120][i % 6])
    want = oracle.merkle_root(leaves).hex()
    dev = TpuSha256D(name="p", config=EngineConfig(slice_log2=4, batch_leaves=7, backend="xla"))
    dev.AddMany(leaves)
    assert dev.Root() == want


def test_single_byte_leaves_large_count():
    leaves = [bytes([i & 0xFF]) for i in range(1000)]
    want = oracle.merkle_root(leaves).hex()
    dev = TpuSha256D(name="s", config=EngineConfig(slice_log2=7, batch_leaves=333, backend="xla"))
    dev.AddMany(leaves)
    assert dev.Root() == want


@pytest.mark.parametrize("trial", range(6))
def test_randomized_grouped_stream(trial):
    """Pow-2 batches (group-bitrev storage) with randomized chunked
    ingestion: chunk boundaries fall anywhere relative to groups, fuzzing
    the merge, scatter-append, and mixed-layout slice paths."""
    rng = np.random.default_rng(7000 + trial)
    n = int(rng.integers(1, 500))
    leaves = [
        rng.integers(0, 256, size=int(rng.integers(1, 200)), dtype=np.uint8).tobytes()
        for _ in range(n)
    ]
    want = oracle.merkle_root(leaves).hex()
    slice_log2 = int(rng.integers(3, 8))
    batch = 1 << int(rng.integers(2, 7))  # pow-2: grouping on
    dev = TpuSha256D(
        name="gfuzz",
        config=EngineConfig(slice_log2=slice_log2, batch_leaves=batch, backend="xla"),
    )
    i = 0
    while i < n:
        step = int(rng.integers(1, 2 * batch))
        assert dev.AddMany(leaves[i : i + step])
        i += step
    assert dev.Root() == want, f"slice_log2={slice_log2} batch={batch} n={n}"


def test_pack_ahead_churn_fuzz(rng):
    """Random interleavings of AddMany / Drain / mid-stream Root /
    Reset across pack-ahead depths 0-3: the producer/consumer flush
    pipeline must stay oracle-exact through every churn pattern
    (grow-after-Root reopen, drains mid-group, depth-1 and inline
    modes)."""
    from vk_merkle_roots_tpu.config import EngineConfig
    from vk_merkle_roots_tpu.models.tpu import TpuSha256D

    for trial in range(6):
        depth = int(rng.integers(0, 4))
        e = TpuSha256D(
            name=f"churn{trial}",
            config=EngineConfig(
                slice_log2=int(rng.integers(4, 7)),
                batch_leaves=int(1 << rng.integers(3, 6)),
                backend="xla",
                pack_ahead=depth,
            ),
        )
        leaves: list[bytes] = []
        for _ in range(int(rng.integers(6, 14))):
            op = int(rng.integers(0, 10))
            if op < 6:
                chunk = random_leaves(rng, int(rng.integers(1, 90)), maxlen=50)
                leaves.extend(chunk)
                assert e.AddMany(chunk)
            elif op < 8:
                assert e.Drain()
            elif op == 8 and leaves:
                assert e.Root() == oracle.merkle_root(leaves).hex(), (
                    trial, depth, len(leaves))
            else:
                assert e.Reset()
                leaves = []
        if leaves:
            assert e.Root() == oracle.merkle_root(leaves).hex(), (trial, depth)
