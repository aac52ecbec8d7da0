"""Multi-chip data parallelism over a ``jax.sharding.Mesh``.

The reference is strictly single-GPU — it *enumerates* all Vulkan devices
but hands exactly one to an engine (``/root/reference/src/vkmr/
SHA-256vk.cpp:224-229``; SURVEY.md §2.4 records DP/TP/PP as absent).  Its
own scaling construct is the pow-2 **slice** decomposition with host-side
merge of sub-tree roots (README.md:87-96).  That construct is exactly what
distributes across a TPU mesh:

* leaves are sharded over the ``data`` axis in equal pow-2 sub-slices
  (pure DP — one shader-invocation-per-leaf becomes one lane-per-leaf per
  chip);
* each chip hashes its shard and reduces its sub-slice to a root entirely
  locally (no communication — sub-slices are aligned perfect subtrees);
* the per-chip roots ride one tiny ``all_gather`` over ICI (ndev x 32 B),
  and every chip computes the identical top ``log2(ndev)`` levels of the
  tree, replicated.

This replaces the reference's *CPU* merge of slice roots
(Reductions.cpp:670-713, acknowledged in README.md:81 as a contravention of
the GPU-only goal) with an on-device merge.  Communication volume is
independent of input size, so scaling efficiency is limited only by the
ragged tail of the leaf-hash work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import TILE
from ..utils.bitmath import ceil_log2, is_pow2
from ..ops import leaf_hash as _lh
from ..ops import tree_reduce as _tr

DATA_AXIS = "data"


def make_mesh(devices=None, n_devices: int | None = None) -> Mesh:
    """A 1-D data-parallel mesh (the framework's only parallelism axis —
    leaves are i.i.d. work, so DP is the whole story; cf. SURVEY.md §2.4)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def _mesh_ndev(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


def _merge_local_roots(root, log2dev: int, rev_dev):
    """Per-chip subtree root -> replicated stream root: one 32 B/chip
    ``all_gather`` rides ICI, then every chip computes the identical top
    ``log2dev`` levels (replacing the reference's CPU merge of slice roots,
    Reductions.cpp:670-713)."""
    if not log2dev:
        return root
    roots = jax.lax.all_gather(root, DATA_AXIS)  # (ndev, 8) — 32 B/chip
    x = jnp.take(roots, rev_dev, axis=0).T
    from ..ops import tree_reduce as _tr

    while x.shape[1] > 1:
        x = _tr._fold_level_xla(x)
    return x[:, 0]


def make_sharded_reduce_fn(mesh: Mesh, log2n: int, backend: str = "auto"):
    """Build a jittable sharded reduction: (2^log2n, 8) digest rows sharded
    over the mesh -> replicated (8,) root words.

    The digest-level counterpart of :func:`make_sharded_root_fn`: each chip
    reduces its aligned perfect subtree locally, per-chip roots merge via
    one tiny all_gather.  Because it operates on digests, it serves any leaf
    mixture — this is what the streaming engine's ``--sharded`` mode uses to
    reduce full slices across the mesh (SURVEY.md §5.7: the slice
    decomposition *is* the distribution unit)."""
    ndev = _mesh_ndev(mesh)
    n = 1 << log2n
    if n % ndev or not is_pow2(ndev):
        raise ValueError("slice size must be a power of two divisible by the mesh")
    per = n // ndev
    log2per = ceil_log2(per) if per > 1 else 0
    log2dev = ceil_log2(ndev) if ndev > 1 else 0
    interpret = jax.default_backend() != "tpu"
    use_pallas = backend == "pallas" or (backend == "auto" and not interpret)
    rev_dev = jnp.asarray(_tr._bitrev(log2dev)) if log2dev else None

    def local_step(digests_shard):
        if log2per:
            root = _tr.reduce_natural_body(digests_shard, log2per, use_pallas, interpret)
        else:
            root = digests_shard[:, 0]
        return _merge_local_roots(root, log2dev, rev_dev)

    sharded = _shard_map(local_step, mesh, in_specs=P(None, DATA_AXIS), out_specs=P())
    return jax.jit(sharded)


def shard_digests(mesh: Mesh, digests):
    """Place (8, n) word-major digest columns column-sharded over the mesh
    (32 B/leaf moves once over ICI; every subsequent reduction step is
    communication-free until the 32 B/chip root gather)."""
    return jax.device_put(digests, NamedSharding(mesh, P(None, DATA_AXIS)))


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map

        kw = {"check_vma": False}
    except ImportError:  # older JAX
        from jax.experimental.shard_map import shard_map

        kw = {"check_rep": False}
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)


def _words_spec(ndev: int, tiles: int) -> P:
    """PartitionSpec for a tile-major packed word array (t, W, 8, 128):
    shard whole tiles when the mesh divides them, else split the sublane
    axis of the single tile (each sublane is 128 consecutive leaves, so
    every shard is still an aligned contiguous leaf range)."""
    if tiles % ndev == 0:
        return P(DATA_AXIS, None, None, None)
    if tiles == 1 and 8 % ndev == 0:
        return P(None, None, DATA_AXIS, None)
    raise ValueError(
        f"cannot shard {tiles} tile(s) over {ndev} device(s): each device "
        f"needs a whole number of 1024-leaf tiles (or a single tile split "
        f"by sublanes when ndev | 8)"
    )


def make_sharded_root_fn(mesh: Mesh, n_leaves: int, nblocks: int, backend: str = "auto"):
    """Build a jittable sharded step: tile-major packed words
    (n_leaves/1024, nblocks*16, 8, 128) sharded over the mesh ->
    replicated (8,) root words.

    ``n_leaves`` must be a power of two divisible by the mesh size; each
    shard is then an aligned perfect subtree, so per-chip roots merge with
    zero phantom/odd handling (ragged streams are closed out by the host
    engine, which only ever ships aligned batches here).
    """
    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if not is_pow2(n_leaves) or n_leaves % ndev or not is_pow2(ndev):
        raise ValueError("n_leaves and mesh size must be powers of two with ndev | n_leaves")
    if n_leaves % TILE:
        # The tile-major wire format pads the last tile with zero rows; a
        # padded shard would cover a different leaf range than the tree
        # assigns its device.  Whole-tile multiples keep shards exact.
        raise ValueError("sharded root requires n_leaves to be a multiple of 1024")
    tiles = n_leaves // TILE
    spec = _words_spec(ndev, tiles)
    per = n_leaves // ndev
    log2per = ceil_log2(per) if per > 1 else 0
    log2dev = ceil_log2(ndev) if ndev > 1 else 0
    interpret = jax.default_backend() != "tpu"
    # Sub-tile shards (a single tile split along sublanes) take the XLA
    # fallback — the Pallas kernel's block shapes assume whole (8,128)
    # tiles; real multi-chip runs shard whole tiles and keep Pallas.
    whole_tiles = spec[0] == DATA_AXIS or ndev == 1
    use_pallas = (backend == "pallas" or (backend == "auto" and not interpret)) and whole_tiles
    rev_dev = jnp.asarray(_tr._bitrev(log2dev)) if log2dev else None

    def local_step(words_shard):
        if use_pallas or words_shard.shape[2] == 8:
            digests = _lh._bucket_hashes(words_shard, nblocks, use_pallas, interpret)
        else:
            # Sub-tile shard (a single tile split along sublanes): the
            # shared word-column XLA path handles any sublane count.
            digests = _lh.words_to_digest_cols_xla(words_shard, nblocks)
        digests = digests[:, :per]
        if log2per:
            root = _tr.reduce_natural_body(digests, log2per, use_pallas, interpret)
        else:
            root = digests[:, 0]
        return _merge_local_roots(root, log2dev, rev_dev)

    sharded = _shard_map(local_step, mesh, in_specs=spec, out_specs=P())
    return jax.jit(sharded)


def shard_words(mesh: Mesh, words: np.ndarray):
    """Place a tile-major packed word array sharded over the mesh."""
    ndev = _mesh_ndev(mesh)
    return jax.device_put(words, NamedSharding(mesh, _words_spec(ndev, words.shape[0])))
