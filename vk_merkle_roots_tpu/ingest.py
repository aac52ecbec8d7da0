"""Streaming stdin ingest.

Replaces the reference's byte-at-a-time ``fgetc`` reader
(``/root/reference/src/vkmr/Inputs.cpp:75-101`` — a known host bottleneck)
with chunked binary reads split by newline in vectorized NumPy (fast enough
that packing/hashing, not ingest, bound the host).  Line semantics match the
reference exactly: lines are newline-separated, a trailing fragment without
a final newline is still a line, empty lines are surfaced so the caller can
warn and skip them (Vkmr.cpp:40-43).
"""

from __future__ import annotations

from typing import BinaryIO, Iterator

import numpy as np

from .packing import split_lines

DEFAULT_CHUNK = 8 << 20


def iter_line_spans(
    stream: BinaryIO, chunk_bytes: int = DEFAULT_CHUNK
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (data, offsets, lengths) span batches for newline-separated
    lines read from a binary stream.  Lengths may include 0 for empty
    lines — callers filter."""
    # The carry (bytes after the last newline) accumulates as a LIST of
    # chunks, joined only when a newline finally arrives: rebuilding a
    # bytes carry on every read would be O(line^2) for lines much larger
    # than the chunk size (a 1 GB host-routed leaf would memcpy ~64 GB).
    carry: list[bytes] = []
    while True:
        block = stream.read(chunk_bytes)
        if not block:
            break
        if b"\n" not in block:
            carry.append(block)
            continue
        buf = b"".join(carry) + block if carry else block
        carry.clear()
        last_nl = buf.rfind(b"\n")
        complete, rest = buf[: last_nl + 1], buf[last_nl + 1 :]
        if rest:
            carry.append(rest)
        data, offs, lens = split_lines(complete)
        if lens.size:
            yield data, offs, lens
    if carry:
        data, offs, lens = split_lines(b"".join(carry))
        if lens.size:
            yield data, offs, lens
