"""Opt-in long randomized soak (VKMR_SOAK=1): broader trial counts, chunked
ingestion with mid-stream Root() calls, across grouped and natural engine
configurations.  Not part of the default suite (runtime ~minutes)."""

import os

import numpy as np
import pytest

from vk_merkle_roots_tpu import oracle
from vk_merkle_roots_tpu.config import EngineConfig
from vk_merkle_roots_tpu.models.tpu import TpuSha256D

soak = pytest.mark.skipif(
    os.environ.get("VKMR_SOAK") != "1", reason="set VKMR_SOAK=1 for the long soak"
)


@soak
@pytest.mark.parametrize("trial", range(40))
def test_soak_randomized_engine(trial):
    rng = np.random.default_rng(40000 + trial)
    n = int(rng.integers(1, 700))
    leaves = [
        rng.integers(0, 256, size=int(rng.integers(1, 160)), dtype=np.uint8).tobytes()
        for _ in range(n)
    ]
    if trial % 3 == 0 and n > 4:
        for i in rng.integers(0, n, size=2):
            leaves[int(i)] = rng.integers(
                0, 256, size=int(rng.integers(600, 3000)), dtype=np.uint8
            ).tobytes()
    want = oracle.merkle_root(leaves).hex()
    slice_log2 = int(rng.integers(3, 9))
    batch = 1 << int(rng.integers(2, 8))  # pow-2: group-bitrev storage
    e = TpuSha256D(
        name="soak",
        config=EngineConfig(slice_log2=slice_log2, batch_leaves=batch, backend="xla"),
    )
    i = 0
    while i < n:
        step = int(rng.integers(1, 3 * batch))
        assert e.AddMany(leaves[i : i + step])
        i += step
        if rng.random() < 0.1:
            e.Root()  # exercise grow-after-root mid-stream
    assert e.Root() == want, f"slice_log2={slice_log2} batch={batch} n={n}"
