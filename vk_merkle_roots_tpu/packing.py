"""Host-side staging: FIPS-180 padding, big-endian word packing, bucketing.

This is the TPU-idiomatic replacement for the reference's ``Batch`` staging
buffers (``/root/reference/src/vkmr/Batches.cpp:64-121`` packs raw strings
word-aligned with ``{start,size}`` metadata and leaves padding to the shader,
SHA-256.comp:207-285).  On TPU we keep the device kernels perfectly regular
instead: the host pre-pads every leaf to whole 64-byte message blocks
(0x80 bit, zero fill, 64-bit big-endian bit length), converts to big-endian
u32 words, and groups leaves into *buckets* by block count so each kernel
launch is a static shape.  Everything is vectorized NumPy — no per-leaf
Python loop on the hot path.

The bucket outputs concatenate to a leaf order different from the input
order; ``PackedLeaves.inverse_order`` is the gather that restores it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .constants import BLOCK_BYTES, MAX_LEAF_BYTES, padded_block_count


@dataclass
class Bucket:
    """All leaves whose padded message is exactly ``nblocks`` blocks long."""

    nblocks: int
    words: np.ndarray  # (count, nblocks*16) uint32, big-endian word values
    count: int


@dataclass
class PackedLeaves:
    """Bucketed, padded, word-packed leaves plus the restore permutation."""

    buckets: list[Bucket]
    order: np.ndarray  # original leaf index of row i of the bucket concat
    inverse_order: np.ndarray  # bucket-concat row holding original leaf i
    count: int
    total_bytes: int  # payload bytes (pre-padding)
    # Long leaves routed to the host hasher (see pack_spans
    # ``max_device_blocks``): (data, offsets, lengths) spans, ordered after
    # every device bucket in the concat that ``order`` indexes.
    host_spans: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None


def split_lines(buffer: np.ndarray | bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split a newline-separated byte buffer into (data, offsets, lengths).

    Matches the reference's line protocol (Inputs.cpp:75-101 reads to '\\n' or
    EOF): a trailing fragment without a final newline still counts as a line;
    empty lines are *kept* here (callers filter, as Vkmr.cpp:40-43 does).
    """
    data = np.frombuffer(buffer, dtype=np.uint8) if isinstance(buffer, (bytes, bytearray, memoryview)) else buffer
    if data.size == 0:
        return data, np.zeros(0, np.int64), np.zeros(0, np.int64)
    newlines = np.flatnonzero(data == 0x0A)
    if newlines.size and newlines[-1] == data.size - 1:
        starts = np.concatenate(([0], newlines[:-1] + 1))
        ends = newlines
    else:
        starts = np.concatenate(([0], newlines + 1))
        ends = np.concatenate((newlines, [data.size]))
    return data, starts.astype(np.int64), (ends - starts).astype(np.int64)


def pack_spans(
    data: np.ndarray,
    offsets: np.ndarray,
    lengths: np.ndarray,
    max_device_blocks: int | None = None,
) -> PackedLeaves:
    """Pack leaves given as (offset, length) spans over one u8 buffer.

    ``max_device_blocks`` bounds the per-leaf message-block count sent to the
    device: longer leaves become ``host_spans`` and are hashed by the host
    SHA-256 (one message is a serial block chain — there is no parallelism
    to win on any device; the reference likewise runs one shader invocation
    per string however long, SHA-256.comp:207-285).  Bounding it also bounds
    how many distinct kernel shapes a mixed-length stream can compile."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    count = int(lengths.size)
    if count == 0:
        return PackedLeaves([], np.zeros(0, np.int64), np.zeros(0, np.int64), 0, 0)
    if int(lengths.max(initial=0)) > MAX_LEAF_BYTES:
        raise ValueError(f"leaf exceeds MAX_LEAF_BYTES={MAX_LEAF_BYTES}")

    try:
        from .native.lib import native_pack_bucket
    except Exception:
        native_pack_bucket = None

    nblocks = (lengths + 9 + BLOCK_BYTES - 1) // BLOCK_BYTES
    host_spans = None
    host_idx = np.zeros(0, np.int64)
    device_blocks = np.unique(nblocks)
    if max_device_blocks is not None:
        host_idx = np.flatnonzero(nblocks > max_device_blocks)
        if host_idx.size:
            host_spans = (data, offsets[host_idx], lengths[host_idx])
            device_blocks = device_blocks[device_blocks <= max_device_blocks]
    buckets: list[Bucket] = []
    order_parts: list[np.ndarray] = []
    for b in device_blocks:
        idx = np.flatnonzero(nblocks == b)
        lens = lengths[idx]
        offs = offsets[idx]
        pitch = int(b) * BLOCK_BYTES
        words = None
        if native_pack_bucket is not None:
            words = native_pack_bucket(data, offs, lens, int(b))
        if words is None:
            buf = np.zeros((idx.size, pitch), dtype=np.uint8)
            total = int(lens.sum())
            if total:
                # Ragged gather/scatter: copy each leaf's bytes into its row.
                row = np.repeat(np.arange(idx.size, dtype=np.int64), lens)
                cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
                within = np.arange(total, dtype=np.int64) - np.repeat(cum, lens)
                src = np.repeat(offs, lens) + within
                buf.reshape(-1)[row * pitch + within] = data[src]
            # FIPS-180 padding: 0x80 directly after the payload, bit length in
            # the final 8 bytes (big-endian; top word zero for len < 2^29).
            buf.reshape(-1)[np.arange(idx.size, dtype=np.int64) * pitch + lens] = 0x80
            be = buf.view(">u4").reshape(idx.size, pitch // 4)
            be[:, -1] = (lens << 3).astype(np.uint32)
            words = np.ascontiguousarray(be).astype(np.uint32)
        buckets.append(Bucket(int(b), words, int(idx.size)))
        order_parts.append(idx)

    if host_spans is not None:
        order_parts.append(host_idx)
    order = np.concatenate(order_parts)
    inverse_order = np.empty(count, dtype=np.int64)
    inverse_order[order] = np.arange(count, dtype=np.int64)
    return PackedLeaves(
        buckets, order, inverse_order, count, int(lengths.sum()), host_spans
    )


def pack_leaves(leaves: list[bytes]) -> PackedLeaves:
    """Pack a Python list of byte strings (convenience path for tests and the
    per-leaf ``Add`` API; the streaming path uses ``split_lines``+``pack_spans``
    on a single buffer)."""
    if not leaves:
        return PackedLeaves([], np.zeros(0, np.int64), np.zeros(0, np.int64), 0, 0)
    lengths = np.fromiter((len(x) for x in leaves), dtype=np.int64, count=len(leaves))
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    data = np.frombuffer(b"".join(leaves), dtype=np.uint8)
    return pack_spans(data, offsets, lengths)


def reference_padded_words(leaf: bytes) -> np.ndarray:
    """Scalar (slow) padding of one leaf — the oracle for ``pack_spans``."""
    n = padded_block_count(len(leaf))
    buf = bytearray(n * BLOCK_BYTES)
    buf[: len(leaf)] = leaf
    buf[len(leaf)] = 0x80
    buf[-8:] = (len(leaf) * 8).to_bytes(8, "big")
    return np.frombuffer(bytes(buf), dtype=">u4").astype(np.uint32)
