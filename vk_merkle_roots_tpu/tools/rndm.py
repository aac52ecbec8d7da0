"""``rndm`` — deterministic random line-stream generator.

Reproduces the behavior of the reference's fixture generator
(``/root/reference/src/rndm/Rndm.cpp:20-71``): given ``seed count maxlen``,
emit ``count`` newline-terminated strings of printable ASCII (codes 32..125),
each of length ``1 + rand() % (maxlen - 1)``, and print stats to stderr.

The reference calls C ``rand()``; on the glibc platforms it was benchmarked
on, that is the TYPE_3 additive-feedback generator.  We vendor a
from-scratch implementation of that public algorithm (``GlibcRand``) so the
canonical stream ``rndm 1712489279 1024 127`` is byte-identical to the
reference binary built against glibc — and fully deterministic across our
platforms, which the C standard does not guarantee for ``rand()`` itself.

A fast ``numpy`` mode (not reference-compatible, but deterministic) is
provided for generating multi-gigabyte benchmark streams.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


class GlibcRand:
    """glibc ``srand``/``rand`` (TYPE_3 additive feedback, period ~2^63).

    State: 34 seeded values; r[i] = r[i-31] + r[i-3] (mod 2^32); the first
    310 outputs after seeding are discarded; each output is the new state
    value shifted right by one.
    """

    def __init__(self, seed: int) -> None:
        seed = seed & 0xFFFFFFFF
        if seed == 0:
            seed = 1
        r = [0] * 344
        r[0] = seed
        # Lehmer LCG seeding of the first 31 entries, computed with the
        # overflow-free Schrage decomposition of 16807 * x mod (2^31 - 1).
        for i in range(1, 31):
            prev = r[i - 1]
            if prev >= 0x80000000:  # interpret as signed
                prev -= 0x100000000
            # C integer division truncates toward zero (unlike Python's //).
            hi = int(prev / 127773)
            lo = prev - hi * 127773
            word = 16807 * lo - 2836 * hi
            if word < 0:
                word += 0x7FFFFFFF
            r[i] = word
        for i in range(31, 34):
            r[i] = r[i - 31]
        for i in range(34, 344):
            r[i] = (r[i - 31] + r[i - 3]) & 0xFFFFFFFF
        # Keep only the rolling window; subsequent values are produced on
        # demand from a ring buffer of the last 31 values.
        self._ring = r[344 - 31 :]
        self._pos = 0  # index of r[i-31] within the ring

    def rand(self) -> int:
        ring = self._ring
        pos = self._pos
        val = (ring[pos] + ring[(pos + 28) % 31]) & 0xFFFFFFFF
        ring[pos] = val
        self._pos = (pos + 1) % 31
        return val >> 1


def generate_glibc(seed: int, count: int, maxlen: int, out) -> int:
    """Write the reference-compatible stream; returns total payload bytes."""
    if maxlen < 2:
        # Lengths are 1 + rand() % (maxlen - 1); the reference hits C
        # undefined behavior (x % 0) here — we refuse cleanly instead.
        raise ValueError("maxlen must be >= 2")
    try:
        from ..native.lib import native_rndm_stream

        stream = native_rndm_stream(seed, count, maxlen)
        if stream is not None:
            out.write(stream)
            return len(stream) - count  # payload excludes the newlines
    except Exception:
        pass
    rng = GlibcRand(seed)
    total = 0
    chunk = bytearray()
    for _ in range(count):
        length = 1 + rng.rand() % (maxlen - 1)
        for _ in range(length):
            chunk.append(32 + rng.rand() % 94)
        chunk.append(0x0A)
        total += length
        if len(chunk) >= 1 << 20:
            out.write(bytes(chunk))
            chunk.clear()
    if chunk:
        out.write(bytes(chunk))
    return total


def generate_numpy(seed: int, count: int, maxlen: int, out) -> int:
    """Fast vectorized stream (PCG64-based; NOT byte-compatible with the
    reference ``rndm`` — use for large benchmark feeds)."""
    rng = np.random.default_rng(seed)
    total = 0
    batch = 1 << 16
    for start in range(0, count, batch):
        n = min(batch, count - start)
        lens = 1 + rng.integers(0, maxlen - 1, size=n, endpoint=False)
        payload = rng.integers(32, 126, size=int(lens.sum()), dtype=np.uint8)
        # Interleave newline terminators at the ragged row boundaries.
        outbuf = np.empty(payload.size + n, dtype=np.uint8)
        ends = np.cumsum(lens + 1)
        newline_pos = ends - 1
        mask = np.ones(outbuf.size, dtype=bool)
        mask[newline_pos] = False
        outbuf[newline_pos] = 0x0A
        outbuf[mask] = payload
        out.write(outbuf.tobytes())
        total += int(lens.sum())
    return total


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="rndm", description=__doc__)
    parser.add_argument("seed", type=int, nargs="?", default=None)
    parser.add_argument("count", type=int, nargs="?", default=None)
    parser.add_argument("maxlen", type=int, nargs="?", default=None)
    parser.add_argument("--algo", choices=["glibc", "numpy"], default="glibc")
    args = parser.parse_args(argv)

    import time

    seed = args.seed if args.seed is not None else int(time.time())
    print(f"Using seed: {seed}", file=sys.stderr)
    if args.count is None:
        print("Usage: rndm [seed] [number of strings] [max string length]", file=sys.stderr)
        return 1
    count = args.count
    maxlen = args.maxlen if args.maxlen is not None else min(16384, count)
    if maxlen < 2:
        print(
            f"rndm: max string length must be >= 2 (got {maxlen}; string "
            "lengths are 1 + rand() % (maxlen - 1))",
            file=sys.stderr,
        )
        return 1

    out = sys.stdout.buffer
    if args.algo == "glibc":
        total = generate_glibc(seed, count, maxlen, out)
    else:
        total = generate_numpy(seed, count, maxlen, out)
    out.flush()
    print(f"Wrote {count} string(s) in a total of {total} byte(s).\n", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
