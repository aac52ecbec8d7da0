"""Multi-host (multi-process) initialization over DCN.

The reference has no distributed communication backend at all — no
NCCL/MPI/Gloo/UCX appears anywhere in its tree (SURVEY.md §2.4, §5.8); its
only "communication" is host<->device fences and barriers.  The TPU-native
scaling story therefore follows BASELINE.json's north star rather than the
reference: ``jax.distributed.initialize`` performs DCN rendezvous, after
which ``jax.devices()`` spans every chip of every host and the same
data-parallel mesh (``parallel.mesh``) covers the pod slice — per-chip
sub-slice roots still merge with one 32 B/chip all-gather that rides ICI
within a host and DCN across hosts.

Only one real chip is reachable in this development environment, so this
module is exercised structurally (argument plumbing, single-process mode)
and the cross-host path compiles via the virtual-mesh dry run.
"""

from __future__ import annotations

import os


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Rendezvous with the other hosts of a pod slice.

    Arguments default to the standard JAX environment variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``)
    or cloud auto-detection.  Returns True when running multi-process,
    False when single-process (no-op).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if coordinator_address is None and num_processes in (None, 1):
        return False  # single process; nothing to rendezvous
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh():
    """Data-parallel mesh over every chip of every host (call after
    :func:`initialize_distributed`)."""
    from .mesh import make_mesh

    return make_mesh()


def demo_main(argv=None) -> int:
    """Multi-process demo/verification entry: every process rendezvouses,
    contributes its shard of a deterministic leaf set, and computes the
    sharded stream root (per-chip subtrees + all_gather merge).  Run one
    copy per host/process::

        python -m vk_merkle_roots_tpu.parallel.distributed \\
            --coordinator host0:9876 --num-processes 2 --process-id 0

    Prints ``sharded_root <hex>`` (identical on every process).  The
    2-process CPU-backend test (tests/test_distributed.py) drives this to
    prove the cross-process collective path end-to-end without a pod.
    """
    import argparse

    p = argparse.ArgumentParser(description=demo_main.__doc__)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--leaves", type=int, default=8192)
    p.add_argument("--leaf-bytes", type=int, default=24)
    p.add_argument("--seed", type=int, default=7)
    a = p.parse_args(argv)

    initialize_distributed(a.coordinator, a.num_processes, a.process_id)
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..packing import pack_leaves
    from ..utils.hexutil import words_to_digest
    from .mesh import DATA_AXIS, make_mesh, make_sharded_reduce_fn, make_sharded_root_fn

    nproc = jax.process_count()
    rng = np.random.default_rng(a.seed)
    leaves = [
        rng.integers(32, 126, size=a.leaf_bytes, dtype=np.uint8).tobytes()
        for _ in range(a.leaves)
    ]
    # Whole 1024-leaf tiles per *device* (not per process): the sharded
    # words path splits along the tile axis, and a multi-device process
    # would otherwise pass here and then fail inside make_sharded_root_fn
    # with an opaque mesh error.
    if a.leaves % (1024 * jax.device_count()):
        raise SystemExit("--leaves must be a multiple of 1024 * total device count")
    packed = pack_leaves(leaves)
    assert len(packed.buckets) == 1, "demo uses one fixed-size bucket"
    words = packed.buckets[0].words  # tile-major (t, W, 8, 128)
    nblocks = packed.buckets[0].nblocks

    mesh = make_mesh()
    sharding = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    tiles_local = words.shape[0] // nproc
    pid = jax.process_index()
    local = words[pid * tiles_local : (pid + 1) * tiles_local]
    garr = jax.make_array_from_process_local_data(sharding, local, global_shape=words.shape)
    fn = make_sharded_root_fn(mesh, a.leaves, nblocks)
    root = words_to_digest(np.asarray(fn(garr)))
    print(f"sharded_root {root.hex()}", flush=True)

    # Digest-level sharded reduction (the engine's --sharded slice path):
    # same tree, computed from pre-hashed word-major digest columns sharded
    # across processes.
    from .. import oracle

    cols = np.ascontiguousarray(
        np.stack(
            [np.frombuffer(oracle.leaf_hash(x), ">u4").astype(np.uint32) for x in leaves]
        ).T
    )
    log2n = a.leaves.bit_length() - 1
    rfn = make_sharded_reduce_fn(mesh, log2n)
    rows = a.leaves // nproc
    gdig = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(None, DATA_AXIS)),
        np.ascontiguousarray(cols[:, pid * rows : (pid + 1) * rows]),
        global_shape=cols.shape,
    )
    root2 = words_to_digest(np.asarray(rfn(gdig)))
    print(f"sharded_reduce_root {root2.hex()}", flush=True)
    return 0 if root == root2 else 1


if __name__ == "__main__":
    import sys

    sys.exit(demo_main())
