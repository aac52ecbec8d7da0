"""Multi-device sharding on the virtual 8-device CPU mesh: DP over leaf
sub-slices, all-gather of sub-roots, replicated top merge (SURVEY.md §2.4's
TPU distribution story)."""

import numpy as np
import pytest

from vk_merkle_roots_tpu import oracle
from vk_merkle_roots_tpu.packing import pack_leaves
from vk_merkle_roots_tpu.parallel.mesh import make_mesh, make_sharded_root_fn, shard_words
from vk_merkle_roots_tpu.utils.hexutil import words_to_digest


def _fixed_leaves(rng, n, size=24):
    return [rng.integers(32, 126, size=size, dtype=np.uint8).tobytes() for _ in range(n)]


@pytest.fixture(scope="module")
def mesh8():
    import jax

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices (XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    return make_mesh(devices=devs, n_devices=8)


@pytest.mark.parametrize("n_leaves", [1024, 8192, 16384])
def test_sharded_root_matches_oracle(rng, mesh8, n_leaves):
    leaves = _fixed_leaves(rng, n_leaves)
    packed = pack_leaves(leaves)
    words = packed.buckets[0].words
    fn = make_sharded_root_fn(mesh8, n_leaves, nblocks=1, backend="xla")
    root = words_to_digest(np.asarray(fn(shard_words(mesh8, words))))
    assert root == oracle.merkle_root(leaves)


def test_two_device_mesh(rng):
    import jax

    mesh = make_mesh(devices=jax.devices(), n_devices=2)
    leaves = _fixed_leaves(rng, 2048)
    packed = pack_leaves(leaves)
    fn = make_sharded_root_fn(mesh, 2048, nblocks=1, backend="xla")
    root = words_to_digest(np.asarray(fn(shard_words(mesh, packed.buckets[0].words))))
    assert root == oracle.merkle_root(leaves)


def test_single_device_mesh_degenerates(rng):
    import jax

    mesh = make_mesh(devices=jax.devices(), n_devices=1)
    leaves = _fixed_leaves(rng, 1024)
    packed = pack_leaves(leaves)
    fn = make_sharded_root_fn(mesh, 1024, nblocks=1, backend="xla")
    root = words_to_digest(np.asarray(fn(shard_words(mesh, packed.buckets[0].words))))
    assert root == oracle.merkle_root(leaves)


def test_invalid_shapes_rejected(mesh8):
    with pytest.raises(ValueError):
        make_sharded_root_fn(mesh8, 100, nblocks=1)  # not a power of two
    with pytest.raises(ValueError):
        # Sub-1024 counts pad the single tile, so shards would cover a
        # different leaf range than the tree assigns their device.
        make_sharded_root_fn(mesh8, 512, nblocks=1)


def test_dryrun_multichip_entrypoint():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_reduce_fn_matches_oracle(rng):
    """Digest-level shard_map reduction over the 8-device mesh."""
    import jax.numpy as jnp

    from vk_merkle_roots_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_reduce_fn,
        shard_digests,
    )
    from vk_merkle_roots_tpu.utils.hexutil import words_to_digest

    log2n = 9
    n = 1 << log2n
    digs = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint32)
    mesh = make_mesh(n_devices=8)
    fn = make_sharded_reduce_fn(mesh, log2n)
    got = words_to_digest(np.asarray(fn(shard_digests(mesh, jnp.asarray(digs.T)))))
    want = oracle.merkle_root_of_digests([words_to_digest(digs[i]) for i in range(n)])
    assert got == want


def test_sharded_root_16_devices_subprocess(rng):
    """Meshes wider than the suite's 8 virtual devices: 16-way DP in a
    fresh subprocess (2 tiles/device), root byte-exact vs the oracle."""
    import os
    import subprocess
    import sys

    code = (
        "import numpy as np\n"
        "from vk_merkle_roots_tpu import oracle\n"
        "from vk_merkle_roots_tpu.packing import pack_leaves\n"
        "from vk_merkle_roots_tpu.parallel.mesh import make_mesh, "
        "make_sharded_root_fn, shard_words\n"
        "from vk_merkle_roots_tpu.utils.hexutil import words_to_digest\n"
        "rng = np.random.default_rng(11)\n"
        "n = 32768\n"
        "leaves = [rng.integers(32, 126, size=24, dtype=np.uint8).tobytes()"
        " for _ in range(n)]\n"
        "packed = pack_leaves(leaves)\n"
        "mesh = make_mesh(n_devices=16)\n"
        "fn = make_sharded_root_fn(mesh, n, nblocks=1, backend='xla')\n"
        "root = words_to_digest(np.asarray(fn(shard_words(mesh, "
        "packed.buckets[0].words))))\n"
        "assert root == oracle.merkle_root(leaves), 'mismatch'\n"
        "print('OK16')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=16")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=600, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "OK16" in out.stdout
