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
