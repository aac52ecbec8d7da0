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
* Layout: one leaf per VPU lane.  A grid step owns a (8,128) tile of 1024
  leaves; message word t of the tile is a full (8,128) vector register, so
  every round of the compression runs at full VPU width.  The host uploads
  leaf-major words (zero reshuffling on CPU) and XLA transposes to the
  word-major tile layout on-device at HBM bandwidth.

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

from ..packing import PackedLeaves
from . import sha256_core

TILE_SUB = 8
TILE_LANE = 128
TILE = TILE_SUB * TILE_LANE  # leaves per grid step


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _leaf_kernel(x_ref, o_ref, *, nblocks: int):
    """Hash 1024 leaves: x_ref block (1, nblocks*16, 8, 128) word-major,
    o_ref block (1, 8, 8, 128) digest words."""
    state = sha256_core.initial_state(x_ref[0, 0])
    for b in range(nblocks):
        w16 = [x_ref[0, b * 16 + t] for t in range(16)]
        state = sha256_core.compress(state, w16)
    state = sha256_core.finalize_sha256d(state)
    for j in range(8):
        o_ref[0, j] = state[j]


@partial(jax.jit, static_argnums=(1, 2, 3))
def _bucket_hashes(words, nblocks: int, use_pallas: bool, interpret: bool):
    """(n, nblocks*16) big-endian words -> (n, 8) digest words."""
    n = words.shape[0]
    wcount = nblocks * 16
    if not use_pallas:
        cols = words.T
        blocks = [[cols[b * 16 + t] for t in range(16)] for b in range(nblocks)]
        state = sha256_core.leaf_digest_words(blocks, unroll=False)
        return jnp.stack(state, axis=1)

    t = -(-n // TILE)
    padded = jnp.pad(words, ((0, t * TILE - n), (0, 0)))
    # leaf-major -> word-major tiles: (T, W, 8, 128), all on device.
    tiles = padded.reshape(t, TILE_SUB, TILE_LANE, wcount).transpose(0, 3, 1, 2)
    out = pl.pallas_call(
        partial(_leaf_kernel, nblocks=nblocks),
        grid=(t,),
        in_specs=[
            pl.BlockSpec(
                (1, wcount, TILE_SUB, TILE_LANE),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 8, TILE_SUB, TILE_LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, 8, TILE_SUB, TILE_LANE), jnp.uint32),
        interpret=interpret,
    )(tiles)
    return out.transpose(0, 2, 3, 1).reshape(-1, 8)[:n]


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
    per-lane real block counts; o (1, 8, 8, 128) digest words (written on
    the last step); state scratch (8, 8, 128).
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
        for j in range(8):
            o_ref[0, j] = out[j]


@partial(jax.jit, static_argnums=(2, 3, 4))
def _stream_bucket_hashes(words, counts, cap_blocks: int, use_pallas: bool, interpret: bool):
    """(n, cap_blocks*16) big-endian words + (n,) int32 real block counts
    -> (n, 8) digest words.  One compiled shape per (row-quantized n,
    capacity rung) pair; the Mosaic body is capacity-independent."""
    n = words.shape[0]
    wcount = cap_blocks * 16
    if not use_pallas:
        cols = words.T  # (wcount, n) word-major
        state = sha256_core.initial_state(cols[0])

        def body(b, st):
            w = jax.lax.dynamic_slice_in_dim(cols, b * 16, 16, axis=0)
            new = sha256_core.compress(st, [w[t] for t in range(16)], unroll=False)
            active = counts > b
            return tuple(jnp.where(active, nw, s) for nw, s in zip(new, st))

        state = jax.lax.fori_loop(0, cap_blocks, body, state)
        state = sha256_core.finalize_sha256d(state, unroll=False)
        return jnp.stack(state, axis=1)

    t = -(-n // TILE)
    padded = jnp.pad(words, ((0, t * TILE - n), (0, 0)))
    tiles = padded.reshape(t, TILE_SUB, TILE_LANE, wcount).transpose(0, 3, 1, 2)
    c = jnp.pad(counts.astype(jnp.int32), (0, t * TILE - n)).reshape(
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
            (1, 8, TILE_SUB, TILE_LANE), lambda i, b: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, 8, TILE_SUB, TILE_LANE), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((8, TILE_SUB, TILE_LANE), jnp.uint32)],
        interpret=interpret,
    )(tiles, c)
    return out.transpose(0, 2, 3, 1).reshape(-1, 8)[:n]


def _host_leaf_digest_words(data, offsets, lengths) -> np.ndarray:
    """SHA-256d digest words of long leaves on the host (native SHA-NI when
    built, hashlib otherwise), row-quantized like the device buckets.  One
    message is a serial block chain, so the host hardware-SHA path is the
    honest fast path for rare long leaves; see packing.pack_spans."""
    from .. import oracle
    from ..native.lib import native_leaf_hashes_spans

    n = int(lengths.size)
    out = native_leaf_hashes_spans(data, offsets, lengths)
    if out is None:
        out = np.empty((n, 32), np.uint8)
        for i in range(n):
            span = data[int(offsets[i]) : int(offsets[i]) + int(lengths[i])].tobytes()
            out[i] = np.frombuffer(oracle.leaf_hash(span), np.uint8)
    # Digest bytes -> big-endian words, vectorized (hexutil.digest_to_words
    # row-at-a-time would be quadratic-ish here; same convention).
    words = out.view(">u4").astype(np.uint32).reshape(n, 8)
    rows = _quantized_rows(n)
    if rows != n:
        words = np.concatenate([words, np.zeros((rows - n, 8), np.uint32)])
    return words


def _quantized_rows(n: int) -> int:
    """Pad bucket row counts to the next power of two (>= 64) so compiled
    kernels are shared across batches instead of recompiling per exact
    count.  Wasted rows hash zero blocks and are never gathered."""
    if n >= 64:
        return 1 << (n - 1).bit_length()
    return 64


def leaf_hashes(packed: PackedLeaves, backend: str = "auto", device=None) -> jax.Array:
    """Hash all packed leaves; returns (quantized_rows, 8) uint32 digest
    words whose first ``packed.count`` rows are the digests in original
    input order (trailing rows are padding garbage — row counts are
    quantized to powers of two so compiled programs are reused across
    batches; callers slice or track ``packed.count``).

    ``backend``: "pallas", "xla", or "auto" (pallas on TPU, xla elsewhere —
    interpret-mode pallas is reserved for the kernel unit tests).
    """
    if packed.count == 0:
        return jnp.zeros((0, 8), jnp.uint32)
    interpret = _use_interpret()
    use_pallas = backend == "pallas" or (backend == "auto" and not interpret)

    def _put(arr):
        return jax.device_put(arr, device) if device is not None else jnp.asarray(arr)

    parts = []
    bases = []  # padded-concat row of each bucket's first real row
    counts = []  # real rows per part
    base = 0
    for b in packed.buckets:
        rows = _quantized_rows(b.count)
        words = b.words
        if rows != b.count:
            words = np.zeros((rows, words.shape[1]), dtype=np.uint32)
            words[: b.count] = b.words
        if b.counts is not None:  # stream bucket: block-loop kernel
            blk = b.counts
            if rows != b.count:
                blk = np.zeros(rows, np.int32)
                blk[: b.count] = b.counts
            parts.append(
                _stream_bucket_hashes(_put(words), _put(blk), b.nblocks, use_pallas, interpret)
            )
        else:
            parts.append(_bucket_hashes(_put(words), b.nblocks, use_pallas, interpret))
        bases.append(base)
        counts.append(b.count)
        base += rows
    if packed.host_spans is not None:
        parts.append(_put(_host_leaf_digest_words(*packed.host_spans)))
        bases.append(base)
        counts.append(int(packed.host_spans[2].size))
        base += parts[-1].shape[0]
    if len(parts) == 1:
        cat = parts[0]
        if np.array_equal(packed.inverse_order, np.arange(packed.count)):
            return cat
    else:
        cat = jnp.concatenate(parts, axis=0)
    # Map unpadded concat rows -> padded concat rows, then restore input
    # order; the gather index is itself padded to a quantized length.
    u2p = np.concatenate(
        [np.arange(c, dtype=np.int64) + bases[i] for i, c in enumerate(counts)]
    )
    idx = u2p[packed.inverse_order]
    out_rows = _quantized_rows(packed.count)
    if out_rows != idx.size:
        idx = np.concatenate([idx, np.zeros(out_rows - idx.size, dtype=np.int64)])
    return jnp.take(cat, _put(idx), axis=0)
