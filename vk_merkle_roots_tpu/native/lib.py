"""ctypes loader for the native host library (graceful fallback).

The reference is 100% native C++; this framework keeps its *host-side* hot
paths native too (scalar SHA-256d engine, bucket packer, fixture generator)
while the device path is JAX/Pallas.  If the shared library is missing, we
try one best-effort ``make``; on failure every entry point degrades to the
pure-Python/NumPy implementations (correctness never depends on the .so).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvkmr_native.so")


@lru_cache(maxsize=1)
def tune_host_allocator() -> bool:
    """Keep large freed staging buffers in the malloc arena instead of
    returning them to the kernel.  Every packed flush allocates a fresh
    ~12 MB wire-format buffer; with glibc defaults that is a fresh mmap
    (M_MMAP_THRESHOLD=128 KB) whose first-touch page faults cost 7x the
    packing work itself (measured: 8.5 ms faulting vs 1.2 ms packing for a
    2^16 x 127 B batch).  Raising M_MMAP_THRESHOLD alone does not help —
    the arena top gets trimmed back on free (M_TRIM_THRESHOLD) and faults
    return — so both knobs move together: measured 8.5 -> 2.6 ms per batch
    (3.2 GB/s payload).  Cost: RSS stays at the staging high-water mark
    (bounded by host_pending_bytes + pack-ahead depth).  Set
    VKMR_NO_MALLOPT=1 to keep glibc defaults."""
    if os.environ.get("VKMR_NO_MALLOPT"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = libc.mallopt(-3, 256 << 20) == 1  # M_MMAP_THRESHOLD
        ok = libc.mallopt(-1, 1 << 30) == 1 and ok  # M_TRIM_THRESHOLD
        return ok
    except Exception:
        return False


@lru_cache(maxsize=1)
def _load():
    tune_host_allocator()  # the packer path allocates a large buffer per flush
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    if lib.vkmr_native_abi() != 5:
        # Stale build: rebuild, then load the fresh .so through a unique
        # temporary copy — dlopen caches handles by pathname, so re-opening
        # the same path would hand back the already-loaded stale library.
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s", "clean", "all"],
                check=True, capture_output=True, timeout=120,
            )
            import shutil
            import tempfile

            tmp = tempfile.NamedTemporaryFile(
                prefix="libvkmr_native_", suffix=".so", delete=False
            )
            tmp.close()
            try:
                shutil.copy2(_SO, tmp.name)
                lib = ctypes.CDLL(tmp.name)
            finally:
                # The dlopen mapping persists after unlink; without this,
                # every stale-ABI process leaks one copy into the tmp dir.
                try:
                    os.unlink(tmp.name)
                except OSError:
                    pass
        except Exception:
            import warnings

            warnings.warn(
                "vkmr native library has a stale ABI and the rebuild/reload "
                "failed; falling back to pure Python (slower)",
                RuntimeWarning,
            )
            return None
        if lib.vkmr_native_abi() != 5:
            return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.vkmr_leaf_hashes.argtypes = [u8p, i64p, i64p, ctypes.c_int64, u8p]
    lib.vkmr_merkle_root.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32, u8p]
    lib.vkmr_merkle_root.restype = ctypes.c_int32
    lib.vkmr_pack_bucket_tiles.argtypes = [
        u8p, i64p, i64p, ctypes.c_int64, ctypes.c_int32, u32p, ctypes.c_int64
    ]
    lib.vkmr_pack_stream_bucket_tiles.argtypes = [
        u8p, i64p, i64p, ctypes.c_int64, ctypes.c_int32, u32p, ctypes.c_int64
    ]
    lib.vkmr_rndm_stream.argtypes = [
        ctypes.c_uint32,
        ctypes.c_int64,
        ctypes.c_int32,
        u8p,
        ctypes.c_int64,
    ]
    lib.vkmr_rndm_stream.restype = ctypes.c_int64
    return lib


def native_available() -> bool:
    return _load() is not None


def native_shani_active() -> bool:
    """True when the library dispatched to the hardware SHA-256 (SHA-NI)
    compression at load time (VKMR_FORCE_SCALAR=1 pins the scalar form)."""
    lib = _load()
    return bool(lib is not None and lib.vkmr_shani_active())


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _aligned_zeros(shape, dtype, align=64):
    """Zeroed ndarray whose data pointer is ``align``-byte aligned.  numpy
    only guarantees 16-byte alignment, which would silently disable the
    packer's non-temporal store fast path (vkmr_host_util.cpp requires
    32-byte alignment for vmovntdq); over-allocate and slice so the NT
    path is deterministic (ADVICE r3)."""
    dtype = np.dtype(dtype)
    count = int(np.prod(shape))
    buf = np.zeros(count * dtype.itemsize + align, np.uint8)
    off = (-buf.ctypes.data) % align
    return buf[off : off + count * dtype.itemsize].view(dtype).reshape(shape)


def _aligned_empty(shape, dtype, align=64):
    """Uninitialized aligned ndarray for the ABI-5 packers, which write
    every output row themselves (real rows with data, the quantization
    tail with zeros) — a calloc here cost more than the packing itself
    (full-buffer read+write memset; measured ~1.3 ms per 12 MB batch)."""
    dtype = np.dtype(dtype)
    count = int(np.prod(shape))
    buf = np.empty(count * dtype.itemsize + align, np.uint8)
    off = (-buf.ctypes.data) % align
    return buf[off : off + count * dtype.itemsize].view(dtype).reshape(shape)


def native_leaf_hashes_spans(data: np.ndarray, offsets: np.ndarray, lengths: np.ndarray):
    """(n,) spans -> (n, 32) uint8 digests, or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    n = int(lengths.size)
    out = np.empty((n, 32), np.uint8)
    lib.vkmr_leaf_hashes(
        _ptr(data, ctypes.c_uint8),
        _ptr(offsets, ctypes.c_int64),
        _ptr(lengths, ctypes.c_int64),
        n,
        _ptr(out, ctypes.c_uint8),
    )
    return out


def native_leaf_hashes(leaves) -> list[bytes] | None:
    lib = _load()
    if lib is None:
        return None
    leaves = list(leaves)
    if not leaves:
        return []
    lengths = np.fromiter((len(x) for x in leaves), np.int64, count=len(leaves))
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    data = np.frombuffer(b"".join(leaves), np.uint8)
    out = native_leaf_hashes_spans(data, offsets, lengths)
    return [out[i].tobytes() for i in range(len(leaves))]


def native_merkle_root(digests: np.ndarray, height: int = -1) -> bytes | None:
    """Root of (n, 32) uint8 digest rows; height=-1 reduces to one node,
    height>=0 runs exactly that many levels (phantom rule)."""
    lib = _load()
    if lib is None:
        return None
    digests = np.ascontiguousarray(digests, np.uint8)
    out = np.empty(32, np.uint8)
    rc = lib.vkmr_merkle_root(
        _ptr(digests, ctypes.c_uint8),
        int(digests.shape[0]),
        int(height),
        _ptr(out, ctypes.c_uint8),
    )
    if rc != 0:
        raise ValueError(f"vkmr_merkle_root failed: rc={rc}")
    return out.tobytes()


def native_pack_bucket_tiles(
    data: np.ndarray, offsets: np.ndarray, lengths: np.ndarray, nblocks: int, tiles: int
) -> np.ndarray | None:
    """Pack an exact bucket into the tile-major device wire format
    (tiles, nblocks*16, 8, 128) — see packing.pack_spans.  Rows past
    ``lengths.size`` are zeroed by the packer (ABI 5: the output buffer
    is handed over uninitialized)."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    n = int(lengths.size)
    out = _aligned_empty((tiles, nblocks * 16, 8, 128), np.uint32)
    lib.vkmr_pack_bucket_tiles(
        _ptr(data, ctypes.c_uint8),
        _ptr(offsets, ctypes.c_int64),
        _ptr(lengths, ctypes.c_int64),
        n,
        nblocks,
        _ptr(out, ctypes.c_uint32),
        tiles * 1024,
    )
    return out


def native_pack_stream_bucket_tiles(
    data: np.ndarray, offsets: np.ndarray, lengths: np.ndarray, cap_blocks: int, tiles: int
) -> np.ndarray | None:
    """Stream-bucket packer, tile-major: FIPS padding at each leaf's real
    block boundary, zero words up to ``cap_blocks`` blocks
    (packing._pack_stream_tiles contract; the packer writes the zeros —
    the buffer is handed over uninitialized, ABI 5)."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    n = int(lengths.size)
    out = _aligned_empty((tiles, cap_blocks * 16, 8, 128), np.uint32)
    lib.vkmr_pack_stream_bucket_tiles(
        _ptr(data, ctypes.c_uint8),
        _ptr(offsets, ctypes.c_int64),
        _ptr(lengths, ctypes.c_int64),
        n,
        cap_blocks,
        _ptr(out, ctypes.c_uint32),
        tiles * 1024,
    )
    return out


def native_rndm_stream(seed: int, count: int, maxlen: int) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    cap = count * (maxlen + 1)
    out = np.empty(cap, np.uint8)
    written = lib.vkmr_rndm_stream(seed & 0xFFFFFFFF, count, maxlen, _ptr(out, ctypes.c_uint8), cap)
    if written < 0:
        raise ValueError(f"vkmr_rndm_stream failed: rc={written}")
    return out[:written].tobytes()
