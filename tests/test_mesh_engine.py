"""Streaming multi-device engine on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from vk_merkle_roots_tpu import oracle
from vk_merkle_roots_tpu.config import EngineConfig
from vk_merkle_roots_tpu.models.mesh import MeshSha256D
from tests.conftest import random_leaves


def _engine(slice_log2=6, batch_leaves=40):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >1 device")
    return MeshSha256D(
        config=EngineConfig(slice_log2=slice_log2, batch_leaves=batch_leaves, backend="xla")
    )


@pytest.mark.parametrize("n", [10, 64, 200, 513])
def test_mesh_stream_matches_oracle(rng, n):
    leaves = random_leaves(rng, n, maxlen=90)
    e = _engine()
    assert e.AddMany(leaves)
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_work_actually_round_robins(rng):
    e = _engine(slice_log2=5, batch_leaves=16)
    leaves = random_leaves(rng, 200, maxlen=30)
    assert e.AddMany(leaves)
    assert e._batch_rr > 1  # multiple devices saw batches
    assert e._slice_rr > 1  # multiple devices reduced slices
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_mesh_stats_and_reset(rng):
    e = _engine()
    e.AddMany(random_leaves(rng, 80, maxlen=30))
    e.Root()
    assert e.Stats()["devices"] >= 2
    assert e.Reset()
    assert e._batch_rr == 0


def test_mesh_engine_sharded_reduce(rng):
    """MESH --sharded: full slices reduce via shard_map across the 8-device
    mesh; root byte-exact vs oracle across multiple slices + ragged tail."""
    from vk_merkle_roots_tpu.config import EngineConfig
    from vk_merkle_roots_tpu.models.mesh import MeshSha256D
    from tests.conftest import random_leaves

    leaves = random_leaves(rng, 300, maxlen=60)
    e = MeshSha256D(
        config=EngineConfig(
            slice_log2=6, batch_leaves=48, backend="xla", sharded_reduce=True
        )
    )
    assert e.AddMany(leaves)
    assert e.Root() == oracle.merkle_root(leaves).hex()
    assert e.Stats()["devices"] == 8


def test_mesh_engine_sharded_reduce_grouped(rng):
    """MESH --sharded with a pow-2 batch: slices land in group-bitrev
    storage and must be normalized (group_bitrev_to_natural) before the
    shard_map reducer; root byte-exact vs oracle."""
    leaves = random_leaves(rng, 300, maxlen=60)
    e = MeshSha256D(
        config=EngineConfig(
            slice_log2=6, batch_leaves=32, backend="xla", sharded_reduce=True
        )
    )
    assert e.AddMany(leaves)
    assert e._group_log2 == 5
    assert e.Root() == oracle.merkle_root(leaves).hex()


def test_mesh_engine_grouped_round_robin(rng):
    """Grouped slices on the round-robin (non-sharded) path reduce via
    reduce_grouped_block on whichever device gets the slice."""
    leaves = random_leaves(rng, 200, maxlen=60)
    e = _engine(batch_leaves=16)
    assert e.AddMany(leaves)
    assert e.Root() == oracle.merkle_root(leaves).hex()
