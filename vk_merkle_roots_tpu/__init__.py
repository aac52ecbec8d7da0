"""vk_merkle_roots_tpu — a TPU-native SHA-256d Merkle-root engine.

A from-scratch JAX/Pallas re-imagining of the capabilities of
``viathefalcon/vk_merkle_roots`` (mounted read-only at ``/root/reference``):
stream newline-separated byte strings, hash every leaf with double SHA-256 on
the device, reduce the Merkle tree on-chip, and emit the root — with ingest,
host→device transfer, hashing and reduction all overlapped, and with
data-parallel scaling over a multi-chip ``jax.sharding.Mesh``.

Layer map (TPU-first, cf. SURVEY.md §1):

* ``cli`` / ``models.base``   — process contract & engine interface (L5)
* ``models.cpu`` / ``models.tpu`` — interchangeable engines (L4)
* ``ops``                     — Pallas SHA-256d leaf-hash ("mapping") and
                                tree-reduce kernels + XLA fallbacks (L0/L3)
* ``packing`` / ``ingest``    — host staging: FIPS padding, word packing,
                                bucketing, bit-reversed layout (L2)
* ``parallel``                — mesh sharding: DP over slices, all-gather of
                                slice roots, replicated merge
* ``oracle``                  — hashlib ground truth (the correctness gate)
* ``native``                  — C++ fast paths (ingest/packing, scalar
                                SHA-256d) loaded via ctypes
"""

__version__ = "0.1.0"

from .models.base import Sha256dEngine
from .models.cpu import CpuSha256D
from .oracle import merkle_root, merkle_root_sliced, sha256d

__all__ = [
    "Sha256dEngine",
    "CpuSha256D",
    "merkle_root",
    "merkle_root_sliced",
    "sha256d",
    "__version__",
]
