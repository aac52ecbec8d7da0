"""Leaf-hash ("mapping") stage: SHA-256d of every input string, batched.

TPU-native equivalent of the reference's mapping pipeline — the
``SHA-256-n.spv`` shader (one invocation per string,
``/root/reference/src/shaders/SHA-256.comp:178-303``) plus the ``Mappings``
dispatch machinery (Mappings.cpp:135-232).  Design differences, on purpose:

* Padding happens on the host (``packing.py``), not in-kernel: the reference
  byte-twiddles the 0x80 bit and length footer per invocation
  (SHA-256.comp:254-283); a TPU kernel wants perfectly regular uint32 math,
  so the kernel sees only whole big-endian message blocks.
* Variable length is handled by *bucketing* leaves by message-block count —
  each bucket compiles to a kernel with a static block loop — instead of
  per-invocation data-dependent loops.
* Layout: one leaf per VPU lane, with the wire format already tile-major
  ``(tiles, words, 8, 128)`` (the host packer scatters words at pack time,
  ``packing.Bucket``), so message word t of a tile is a full (8,128) vector
  register the moment it lands in HBM.  Nothing is transposed on device —
  the round-2 leaf-major wire format paid a ~170 GB/s on-device transpose
  (1.2 ms per 2^20x127 B batch, ~27% of the whole mapping stage).
* Digests leave the kernel **word-major**: ``(8, n)`` columns, which is what
  the tree-reduction stage consumes directly (tree_reduce operates on word
  planes).  Row-major ``(n, 8)`` digests exist only on the host (oracle,
  proofs).
* A grid step hashes ``MAP_BLOCK_TILES`` tiles at once: one tile is only a
  couple of microseconds of VPU work, and the fixed per-grid-step cost
  otherwise eats ~25% of the stage (measured 42.5 -> 57.9 GB/s on
  2^20 x 127 B when going from 1 to 4 tiles per step).  The kernel body is
  traced once on ``(bt, 8, 128)`` operands — bigger vectors, not more code.

Both a Pallas kernel and a pure-XLA fallback trace the same
``sha256_core`` math, so they are bit-identical by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import TILE, TILE_LANE, TILE_SUB
from ..utils.bitmath import pow2_env
from ..packing import PackedLeaves, quantized_tiles
from . import kdebug, sha256_core

# Tiles hashed per mapping grid step (see module docstring).  Swept on-chip:
# 4 -> 56.3 GB/s, 8 -> 56.2, 16 -> 48.6 (VMEM pressure); override with
# VKMR_MAP_TILES to re-measure (docs/PERF.md §4) — read at import, traced
# into the jitted kernels.
MAP_BLOCK_TILES = pow2_env("VKMR_MAP_TILES", 4)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _leaf_kernel(x_ref, o_ref, *, nblocks: int):
    """Hash bt*1024 leaves: x_ref block (bt, nblocks*16, 8, 128) tile-major
    message words, o_ref block (8, bt, 8, 128) word-major digests.  All
    state ops are traced on (bt, 8, 128) operands."""
    state = sha256_core.initial_state(x_ref[:, 0])
    for b in range(nblocks):
        w16 = [x_ref[:, b * 16 + t] for t in range(16)]
        state = sha256_core.compress(state, w16)
    state = sha256_core.finalize_sha256d(state)
    kdebug.emit("leaf_kernel d0[lane0]", state[0][0, 0, 0])
    for j in range(8):
        o_ref[j] = state[j]


def words_to_digest_cols_xla(words, nblocks: int):
    """(t, nblocks*16, s, 128) tile-major words -> (8, t*s*128) word-major
    digest columns via the rolled-XLA path.  Shared by the fallback branch
    of :func:`_bucket_hashes` (s == 8) and the mesh engine's sub-tile
    shards (s < 8, ``parallel/mesh.py``) so the two XLA dataflows cannot
    drift apart."""
    t, wcount, s, lanes = words.shape
    cols = words.transpose(1, 0, 2, 3).reshape(wcount, t * s * lanes)
    blocks = [[cols[b * 16 + i] for i in range(16)] for b in range(nblocks)]
    return jnp.stack(sha256_core.leaf_digest_words(blocks, unroll=False), axis=0)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _bucket_hashes(tiles, nblocks: int, use_pallas: bool, interpret: bool):
    """(t, nblocks*16, 8, 128) tile-major big-endian words -> (8, t*1024)
    word-major digest columns."""
    t = tiles.shape[0]
    wcount = nblocks * 16
    if not use_pallas:
        return words_to_digest_cols_xla(tiles, nblocks)

    bt = min(MAP_BLOCK_TILES, t)  # t is a power of two, so bt | t
    out = pl.pallas_call(
        partial(_leaf_kernel, nblocks=nblocks),
        grid=(t // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, wcount, TILE_SUB, TILE_LANE),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (8, bt, TILE_SUB, TILE_LANE), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, t, TILE_SUB, TILE_LANE), jnp.uint32),
        interpret=interpret,
    )(tiles)
    return out.reshape(8, t * TILE)


@partial(jax.jit, static_argnums=(3, 4, 5), donate_argnums=(1,))
def bucket_hash_append(tiles, buf, offset, nblocks: int, use_pallas: bool, interpret: bool):
    """Fused steady-state flush: hash one exact bucket AND append its
    digest columns into the slice buffer in a single compiled dispatch —
    the separate hash + append jit calls each paid per-dispatch overhead
    on the engine's hot path (~1.3 ms/flush through the dev tunnel, the
    largest host cost after packing once the pack path was fixed).  Same
    traced math as ``_bucket_hashes`` + ``dynamic_update_slice``, so
    byte-identical by construction."""
    digs = _bucket_hashes(tiles, nblocks, use_pallas, interpret)
    return jax.lax.dynamic_update_slice(buf, digs, (0, offset))


def _stream_kernel(x_ref, c_ref, o_ref, state_ref, *, nsteps: int):
    """Hash 1024 long leaves, one message block per grid step.

    The TPU answer to the reference mapping shader's data-dependent block
    loop (``/root/reference/src/shaders/SHA-256.comp:207-285``): the grid's
    minor dimension walks the (quantized) block capacity while the 8-word
    hash state rides in VMEM scratch across steps, so the Mosaic body is ONE
    compression (+ the finalization pass on the last step) no matter how
    long the leaves are — compile size and count stay bounded while leaves
    of any length hash at full VPU width.  Lanes whose leaf has fewer than
    ``nsteps`` real blocks keep their state unchanged past their last block
    (predicated select), exactly like a shader invocation exiting its loop.

    Blocks: x (1, 16, 8, 128) message words of block b; c (1, 1, 8, 128)
    per-lane real block counts; o (8, 1, 8, 128) word-major digests (written
    on the last step); state scratch (8, 8, 128).
    """
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        for j in range(8):
            state_ref[j] = jnp.full(
                (TILE_SUB, TILE_LANE), np.uint32(sha256_core.SHA256_IV[j]), jnp.uint32
            )

    state = tuple(state_ref[j] for j in range(8))
    w16 = [x_ref[0, t] for t in range(16)]
    new = sha256_core.compress(state, w16)
    active = c_ref[0, 0] > b
    for j in range(8):
        state_ref[j] = jnp.where(active, new[j], state[j])

    @pl.when(b == nsteps - 1)
    def _finalize():
        out = sha256_core.finalize_sha256d(tuple(state_ref[j] for j in range(8)))
        kdebug.emit("stream_kernel d0[lane0]", out[0][0, 0])
        for j in range(8):
            o_ref[j, 0] = out[j]


@partial(jax.jit, static_argnums=(2, 3, 4))
def _stream_bucket_hashes(tiles, counts, cap_blocks: int, use_pallas: bool, interpret: bool):
    """(t, cap_blocks*16, 8, 128) tile-major big-endian words + (n,) int32
    real block counts -> (8, t*1024) word-major digest columns.  One
    compiled shape per (tile count, capacity rung) pair; the Mosaic body is
    capacity-independent."""
    t = tiles.shape[0]
    wcount = cap_blocks * 16
    if not use_pallas:
        cols = tiles.transpose(1, 0, 2, 3).reshape(wcount, t * TILE)
        state = sha256_core.initial_state(cols[0])
        padded_counts = jnp.pad(counts.astype(jnp.int32), (0, t * TILE - counts.shape[0]))

        def body(b, st):
            w = jax.lax.dynamic_slice_in_dim(cols, b * 16, 16, axis=0)
            new = sha256_core.compress(st, [w[i] for i in range(16)], unroll=False)
            active = padded_counts > b
            return tuple(jnp.where(active, nw, s) for nw, s in zip(new, st))

        state = jax.lax.fori_loop(0, cap_blocks, body, state)
        state = sha256_core.finalize_sha256d(state, unroll=False)
        return jnp.stack(state, axis=0)

    c = jnp.pad(counts.astype(jnp.int32), (0, t * TILE - counts.shape[0])).reshape(
        t, 1, TILE_SUB, TILE_LANE
    )
    out = pl.pallas_call(
        partial(_stream_kernel, nsteps=cap_blocks),
        grid=(t, cap_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 16, TILE_SUB, TILE_LANE),
                lambda i, b: (i, b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, TILE_SUB, TILE_LANE),
                lambda i, b: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, 1, TILE_SUB, TILE_LANE), lambda i, b: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, t, TILE_SUB, TILE_LANE), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((8, TILE_SUB, TILE_LANE), jnp.uint32)],
        interpret=interpret,
    )(tiles, c)
    return out.reshape(8, t * TILE)


def _host_leaf_digest_cols(data, offsets, lengths) -> np.ndarray:
    """SHA-256d digest columns of long leaves on the host (native SHA-NI
    when built, hashlib otherwise), tile-quantized like the device buckets.
    One message is a serial block chain, so the host hardware-SHA path is
    the honest fast path for rare long leaves; see packing.pack_spans."""
    from .. import oracle
    from ..native.lib import native_leaf_hashes_spans

    n = int(lengths.size)
    out = native_leaf_hashes_spans(data, offsets, lengths)
    if out is None:
        out = np.empty((n, 32), np.uint8)
        for i in range(n):
            span = data[int(offsets[i]) : int(offsets[i]) + int(lengths[i])].tobytes()
            out[i] = np.frombuffer(oracle.leaf_hash(span), np.uint8)
    # Digest bytes -> big-endian word columns (8, quantized).
    words = out.view(">u4").astype(np.uint32).reshape(n, 8)
    cols = np.zeros((8, quantized_tiles(n) * TILE), np.uint32)
    cols[:, :n] = words.T
    return cols


def leaf_hashes(packed: PackedLeaves, backend: str = "auto", device=None) -> jax.Array:
    """Hash all packed leaves; returns (8, quantized_cols) uint32 word-major
    digest columns whose first ``packed.count`` columns are the digests in
    original input order (trailing columns are padding garbage — column
    counts are quantized to power-of-two tile counts so compiled programs
    are reused across batches; callers slice or track ``packed.count``).

    ``backend``: "pallas", "xla", or "auto" (pallas on TPU, xla elsewhere —
    interpret-mode pallas is reserved for the kernel unit tests).
    """
    if packed.count == 0:
        return jnp.zeros((8, 0), jnp.uint32)
    interpret = _use_interpret()
    use_pallas = backend == "pallas" or (backend == "auto" and not interpret)

    def _put(arr):
        return jax.device_put(arr, device) if device is not None else jnp.asarray(arr)

    parts = []
    bases = []  # padded-concat column of each bucket's first real column
    counts = []  # real columns per part
    base = 0
    for b in packed.buckets:
        if b.counts is not None:  # stream bucket: block-loop kernel
            # Pad the per-lane block counts to the quantized column count on
            # the HOST: the jitted kernel caches per argument shape, and an
            # exact-length counts array would mint a fresh XLA+Mosaic
            # compile for every novel leaf count in the stream (violating
            # the quantized-shapes invariant; first compiles cost minutes).
            lane_counts = np.zeros(quantized_tiles(b.count) * TILE, np.int32)
            lane_counts[: b.count] = b.counts
            parts.append(
                _stream_bucket_hashes(
                    _put(b.words), _put(lane_counts), b.nblocks, use_pallas, interpret
                )
            )
        else:
            parts.append(_bucket_hashes(_put(b.words), b.nblocks, use_pallas, interpret))
        bases.append(base)
        counts.append(b.count)
        base += parts[-1].shape[1]
    if packed.host_spans is not None:
        parts.append(_put(_host_leaf_digest_cols(*packed.host_spans)))
        bases.append(base)
        counts.append(int(packed.host_spans[2].size))
        base += parts[-1].shape[1]
    if len(parts) == 1:
        cat = parts[0]
        if np.array_equal(packed.inverse_order, np.arange(packed.count)):
            return cat
    else:
        cat = jnp.concatenate(parts, axis=1)
    # Map unpadded concat columns -> padded concat columns, then restore
    # input order; the gather index is itself padded to a quantized length.
    u2p = np.concatenate(
        [np.arange(c, dtype=np.int64) + bases[i] for i, c in enumerate(counts)]
    )
    idx = u2p[packed.inverse_order]
    out_cols = quantized_tiles(packed.count) * TILE
    if out_cols != idx.size:
        idx = np.concatenate([idx, np.zeros(out_cols - idx.size, dtype=np.int64)])
    return jnp.take(cat, _put(idx), axis=1)
