"""Configuration layer.

The reference hardcodes its policy constants (256 MB preferred slice/batch
size ``MegaX`` at SHA-256vk.cpp:23, fallback workgroup 64 at
Reductions.cpp:772) and derives the rest from device limits
(Slices.h:421-454).  Here the same knobs are an explicit dataclass, settable
from the CLI."""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class EngineConfig:
    """Tuning knobs for the TPU streaming engine.

    * ``slice_log2`` — leaves per slice (2^slice_log2); a slice's digest
      buffer is the reduction unit, the analog of the reference's
      device-local ``Slice`` sized to the largest single-pass-reducible
      power of two (Slices.h:421-454).  2^20 leaves = 32 MB of digests.
    * ``batch_leaves`` / ``batch_bytes`` — host-side flush thresholds, the
      analog of ``Batch`` capacity (Batches.h:31-124).
    * ``backend`` — "pallas" (TPU kernels), "xla" (portable fallback), or
      "auto".
    * ``max_slices_in_flight`` — backpressure bound: block on the oldest
      slice root instead of queueing unboundedly (this is the reference's
      acknowledged TODO at README.md:110-116, fixed here).
    """

    slice_log2: int = 20
    batch_leaves: int = 1 << 16
    batch_bytes: int = 64 << 20
    # Hard ceiling on bytes held in the host pending queue: ingest drains to
    # the device until the queue is back under this budget before AddSpans
    # returns, and fails soft (False) if the device cannot absorb the
    # overflow.  This is the explicit host-side analog of the reference's
    # heap-budget accounting for staging batches (MaxBatchCount sums
    # heapSize/batchSize per heap, Batches.cpp:294-331) — there the budget
    # is discovered from the driver; here it is a declared policy knob.
    host_pending_bytes: int = 256 << 20
    # Pack-ahead depth: number of flush batches packed on a background
    # thread ahead of device dispatch.  This reproduces the reference's
    # defining asynchrony — the GPU hashes while the host keeps reading
    # stdin (SHA-256vk.cpp:315-346, README.md:75-83): with depth >= 1 the
    # caller's thread only dispatches (async) device work while the packer
    # thread prepares the next batch, so ingest, packing, and device
    # hashing all overlap.  0 packs inline on the caller's thread (the
    # round-4 serial behavior, kept for debugging).  Packed-but-undispatched
    # payload counts against ``host_pending_bytes``.
    pack_ahead: int = 2
    backend: str = "auto"
    max_slices_in_flight: int = 8
    # Per-leaf message-block bound for device hashing; longer leaves hash on
    # the host (SHA-NI/hashlib).  Leaves past packing.UNROLL_MAX_BLOCKS run
    # through the block-loop stream kernel (one small Mosaic body for any
    # length), so this bound is about *occupancy*, not compile size: one
    # message is a serial block chain, so a leaf occupies one VPU lane for
    # its whole length — past ~128 KB a typical batch can't fill a 1024-lane
    # tile and the serial host SHA-NI is honestly faster.  It also bounds
    # the packed row pitch (HBM per tile = 64 KB x blocks).
    device_max_blocks: int = 2048
    # Sample true device execution time for 1-in-N flushes (map) and
    # 1-in-(N/8) slice reductions: drain the dispatch queue (tiny readback),
    # run the work, block on its result, and record the bracketed time.
    # This is the QueryPoolTimers role (/root/reference/src/vkmr/
    # QueryPoolTimers.cpp:52-93) — per-op device execution ms — paid for by
    # serializing the async pipeline at each sample point, hence the
    # cadence.  A whole flush (up to batch_leaves) is bracketed per sample
    # so the sync round-trip amortizes.  0 disables.
    stats_sample_every: int = 16
    # MESH engine: reduce each full slice via shard_map across the device
    # mesh (per-chip aligned subtrees + one 32 B/chip all_gather + replicated
    # top) instead of round-robining whole slices to single devices.  This
    # is the multi-chip/multi-host data-parallel path (SURVEY.md §2.4 north
    # star); requires a power-of-two device count.
    sharded_reduce: bool = False
    # Retain materialized slice digests so authentication paths (Merkle
    # proofs) can be generated after Root() — the reference lists proofs as
    # unimplemented future work (README.md:118-120).  Costs 32 B/leaf host
    # memory; off by default.
    keep_digests: bool = False
    # Append each completed slice's root to this JSONL file as it
    # materializes, making multi-hour streams resumable (SURVEY.md §5.4
    # stretch; the reference has no checkpoint story).  None disables.
    journal_path: str | None = None
    # Finalize ragged tails at or below this leaf count on the HOST (one
    # 32 B/leaf readback + native SHA-NI reduce, ~1 ms for 2^13) instead
    # of the device's binary-decomposition chain: a tiny tail costs ~10
    # distinct small device programs whose per-process load/dispatch
    # round-trips dwarf the work (measured ~19 s of finalize for a
    # 1024-leaf stream through the dev tunnel; milliseconds on the host).
    # 0 forces the device path (kept for tests and benchmarks).
    host_tail_leaves: int = 8192


def auto_slice_log2(max_fraction: float = 0.125, default: int = 20, cap: int = 26) -> int:
    """Derive the slice size from the device memory budget, the role of the
    reference's ``Slices::New`` sizing formula (min of largest
    single-pass-reducible size, allocation limits, and a preferred 256 MB —
    Slices.h:421-454): the largest power-of-two leaf count whose 32 B/leaf
    digest buffer stays under ``max_fraction`` of device memory."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
    except Exception:
        limit = 0
    if limit <= 0:
        return default
    budget = int(limit * max_fraction)
    k = max((budget // 32).bit_length() - 1, 10)
    return min(k, cap)


def auto_host_pending_bytes(
    max_fraction: float = 0.25, default: int = 256 << 20, cap: int = 1 << 30
) -> int:
    """Discover the host staging budget from actually-available memory —
    the role of the reference's ``MaxBatchCount``, which sums
    heapSize/batchSize over the driver-reported host-visible heaps
    (``/root/reference/src/vkmr/Batches.cpp:294-331``) rather than
    declaring a policy number.  Reads ``MemAvailable`` from /proc/meminfo
    (kernel's estimate of allocatable-without-swapping memory) and budgets
    ``max_fraction`` of it for the pending-leaves queue + pack-ahead
    buffers, clamped to [64 MB, cap].  Falls back to the declared default
    off Linux."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    kb = int(line.split()[1])
                    budget = int(kb * 1024 * max_fraction)
                    return max(64 << 20, min(budget, cap))
    except OSError:
        pass
    return default


def enable_persistent_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache so kernel compiles are
    paid once per machine, not once per process (the role the reference's
    precompiled ``.spv`` artifacts play, Shaders.cpp:19-38)."""
    import jax

    if jax.default_backend() != "tpu":
        # XLA:CPU AOT cache entries record exact machine features and may
        # SIGILL when loaded on a slightly different host; the cache only
        # pays for itself on the TPU path anyway.  Guard on the actual
        # backend, not the JAX_PLATFORMS env var (frequently unset).
        return
    cache_dir = path or os.environ.get(
        "VKMR_COMPILE_CACHE", os.path.expanduser("~/.cache/vkmr_tpu_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
