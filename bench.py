"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: SHA-256d leaf-hash ("mapping") throughput on one chip, in GB/s of
payload, against the reference's best published mapping row (Intel Iris Xe,
~3.039 GB/s — /root/reference/README.md:105; see BASELINE.md).  Extras
report reduction throughput (vs the reference's best reduction rows) and
wall-clock root latency for 2^20 leaves.

Measurement notes (this environment):
* data is generated ON DEVICE — host<->device transfers through the remote
  tunnel are pathologically slow and would measure the tunnel, not the chip;
* ``block_until_ready`` is unreliable under the remote plugin, so timing
  uses K dependent iterations inside one jitted ``fori_loop`` (the carry
  perturbs one input element per iteration, forcing re-execution) bracketed
  by a tiny checksum readback; per-iteration time = (loop - readback RTT)/K;
* a small correctness gate (root vs hashlib oracle) runs before any timing.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _correctness_gate():
    import jax

    from vk_merkle_roots_tpu import oracle
    from vk_merkle_roots_tpu.ops.merkle import merkle_root_device

    rng = np.random.default_rng(1712489279)
    leaves = [
        rng.integers(0, 256, size=int(rng.integers(1, 128)), dtype=np.uint8).tobytes()
        for _ in range(1024)
    ]
    got = merkle_root_device(leaves, backend="auto")
    want = oracle.merkle_root(leaves)
    assert got == want, f"correctness gate failed: {got.hex()} != {want.hex()}"


def _timed_loop(step_fn, init, iters: int) -> float:
    """Median per-iteration seconds of a jitted dependent loop.

    The remote tunnel's readback RTT is noisy (tens of ms, occasional
    spikes); when the K-iteration run is not clearly distinguishable from
    the 0-iteration RTT baseline the whole measurement is retried — one
    polluted baseline otherwise yields absurd (even negative-clamped)
    rates, as seen in a round-2 bench run."""
    out = step_fn(init, 1)  # warm/compile
    _ = np.asarray(out[1])
    best = None
    for _attempt in range(4):
        rtts, times = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(step_fn(init, 0)[1])
            rtts.append(time.perf_counter() - t0)
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(step_fn(init, iters)[1])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times) - np.median(rtts))
        if best is None or dt > best:
            best = dt
        if dt > 0.15 * float(np.median(times)):
            return dt / iters
    return max(best, 1e-9) / iters


def bench_leaf_hash(n_leaves: int, nblocks: int, iters: int = 20):
    """Mapping throughput: one bucket of fixed-size leaves, in the tile-major
    wire format the host packer emits (the kernel's real input — round 2's
    leaf-major rows paid an on-device transpose this format eliminates)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from vk_merkle_roots_tpu.ops.leaf_hash import TILE, _bucket_hashes

    use_pallas = jax.default_backend() == "tpu"

    @partial(jax.jit, static_argnums=(1,))
    def step(tiles, iters):
        def body(_, carry):
            w, acc = carry
            d = _bucket_hashes(w, nblocks, use_pallas, not use_pallas)
            # Dependency chain: fold one digest word back into the input.
            w = w.at[0, 0, 0, 0].add(d[0, 0])
            return (w, acc ^ d[1, 0])

        w, acc = jax.lax.fori_loop(0, iters, body, (tiles, jnp.uint32(0)))
        return w, acc

    key = jax.random.PRNGKey(0)
    tiles = jax.random.randint(
        key, (n_leaves // TILE, nblocks * 16, 8, 128), 0, 1 << 30, dtype=jnp.int32
    ).astype(jnp.uint32)
    sec = _timed_loop(step, tiles, iters)
    return sec


def bench_leaf_hash_stream(leaf_bytes: int = 65536, n_leaves: int = 2048, iters: int = 16):
    """Long-leaf mapping throughput via the block-loop stream kernel — the
    path the reference serves with its data-dependent per-string block loop
    (SHA-256.comp:207-285); round 1 routed these to the host and collapsed
    to the 2-core SHA-NI rate (VERDICT r1 missing #1, fixed in round 2)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from vk_merkle_roots_tpu.constants import padded_block_count
    from vk_merkle_roots_tpu.ops.leaf_hash import _stream_bucket_hashes
    from vk_merkle_roots_tpu.packing import stream_capacity

    use_pallas = jax.default_backend() == "tpu"
    nb = padded_block_count(leaf_bytes)
    cap = stream_capacity(nb)
    counts = jnp.full((n_leaves,), nb, jnp.int32)

    from vk_merkle_roots_tpu.ops.leaf_hash import TILE

    @partial(jax.jit, static_argnums=(1,))
    def step(tiles, iters):
        def body(_, carry):
            w, acc = carry
            d = _stream_bucket_hashes(w, counts, cap, use_pallas, not use_pallas)
            w = w.at[0, 0, 0, 0].add(d[0, 0])
            return (w, acc ^ d[1, 0])

        return jax.lax.fori_loop(0, iters, body, (tiles, jnp.uint32(0)))

    key = jax.random.PRNGKey(3)
    tiles = jax.random.randint(
        key, (n_leaves // TILE, cap * 16, 8, 128), 0, 1 << 30, dtype=jnp.int32
    ).astype(jnp.uint32)
    sec = _timed_loop(step, tiles, iters)
    return n_leaves * leaf_bytes / sec / 1e9


def bench_reduce(log2n: int, iters: int = 10, natural: bool = False, group_log2: int | None = None):
    """Reduction throughput: full tree over 2^log2n digests (the
    reference's 256 MB reduction benchmark shape at log2n=23), from
    word-major digest columns — the layout the mapping stage actually
    leaves in HBM.  ``natural=True`` starts from natural-order columns and
    includes the factored bit-reversal permutation (the round-3 dataflow,
    kept for comparison); ``group_log2`` measures the round-4 group-bitrev
    layout (the engine's steady-state storage: leaves packed bit-reversed
    per batch, so reduction needs NO device permutation); the default times
    the fold pipeline alone (input already fully bit-reversed)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from vk_merkle_roots_tpu.ops.tree_reduce import (
        reduce_grouped_body,
        reduce_natural_body,
        reduce_words_body,
    )

    use_pallas = jax.default_backend() == "tpu"
    reduce_fn = (
        (lambda d, n, p, i: reduce_grouped_body(d, n, group_log2, p, i))
        if group_log2 is not None
        else (reduce_natural_body if natural else reduce_words_body)
    )

    @partial(jax.jit, static_argnums=(1,))
    def step(digests, iters):
        def body(_, carry):
            d, acc = carry
            root = reduce_fn(d, log2n, use_pallas, not use_pallas)
            d = d.at[0, 0].add(root[0])
            return (d, acc ^ root[1])

        d, acc = jax.lax.fori_loop(0, iters, body, (digests, jnp.uint32(0)))
        return d, acc

    key = jax.random.PRNGKey(1)
    digests = jax.random.randint(key, (8, 1 << log2n), 0, 1 << 30, dtype=jnp.int32).astype(
        jnp.uint32
    )
    sec = _timed_loop(step, digests, iters)
    return sec


def bench_root_latency(n_leaves: int, leaf_bytes: int, iters: int = 40):
    """Wall-clock root latency: fused hash+reduce, single dispatch.

    ``iters`` must put well over ~100 ms of device work inside the timed
    loop: round 3 recorded 10.2 ms for this shape at iters=5 (≈25 ms of
    work against a ~24 ms, spiky RTT baseline); at iters=40 the same chip
    measures a stable 4.05 ms, matching the map+reduce component sum
    (VERDICT r3 next-round #1)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from vk_merkle_roots_tpu.utils.bitmath import ceil_log2
    from vk_merkle_roots_tpu.constants import padded_block_count
    from vk_merkle_roots_tpu.ops.leaf_hash import _bucket_hashes
    from vk_merkle_roots_tpu.ops.tree_reduce import reduce_grouped_body

    from vk_merkle_roots_tpu.ops.leaf_hash import TILE

    nblocks = padded_block_count(leaf_bytes)
    log2n = ceil_log2(n_leaves)
    # The engine's steady-state dataflow: batches packed bit-reversed on the
    # host (free), slices stored group-bitrev, reduction permutation-free.
    group_log2 = min(16, log2n)
    use_pallas = jax.default_backend() == "tpu"

    @partial(jax.jit, static_argnums=(1,))
    def step(tiles, iters):
        def body(_, carry):
            w, acc = carry
            d = _bucket_hashes(w, nblocks, use_pallas, not use_pallas)
            root = reduce_grouped_body(d, log2n, group_log2, use_pallas, not use_pallas)
            w = w.at[0, 0, 0, 0].add(root[0])
            return (w, acc ^ root[1])

        return jax.lax.fori_loop(0, iters, body, (tiles, jnp.uint32(0)))

    key = jax.random.PRNGKey(2)
    tiles = jax.random.randint(
        key, (n_leaves // TILE, nblocks * 16, 8, 128), 0, 1 << 30, dtype=jnp.int32
    ).astype(jnp.uint32)
    return _timed_loop(step, tiles, iters=iters)


def bench_stream_pipeline(slice_log2: int = 20, batch_log2: int = 16, n_slices: int = 4):
    """Streamed multi-slice pipeline throughput (BASELINE config "2^20
    leaves x 127B, single host — multi-slice HBM pipeline"), with ingest
    simulated on-device: batches of packed words are appended into the
    slice buffer and each filled slice is reduced, exactly the engine's
    dataflow, but without the development tunnel's 1 MB/s host link."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from vk_merkle_roots_tpu.ops.leaf_hash import TILE, _bucket_hashes
    from vk_merkle_roots_tpu.ops.tree_reduce import reduce_grouped_body

    nblocks = 3  # 127-byte leaves
    cap = 1 << slice_log2
    batch = 1 << batch_log2
    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def slice_pipeline(tiles, buf):
        # One whole slice: cap/batch dependent batch-hash+append steps, then
        # the full tree reduce — exactly the engine's per-slice dataflow in a
        # single dispatch (per-call dispatch RTT through the development
        # tunnel would otherwise dominate).  Batches land contiguously and
        # the slice reduces through the group-bitrev layout (each batch is
        # packed bit-reversed by the host at zero cost), so no permutation
        # appears anywhere — the engine's round-4 steady state.
        def body(i, b):
            w = tiles.at[0, 0, 0, 0].add(i.astype(jnp.uint32))
            digs = _bucket_hashes(w, nblocks, use_pallas, not use_pallas)
            return jax.lax.dynamic_update_slice(b, digs, (0, i * batch))

        buf = jax.lax.fori_loop(0, cap // batch, body, buf)
        root = reduce_grouped_body(buf, slice_log2, batch_log2, use_pallas, not use_pallas)
        return buf, root

    @partial(jax.jit, static_argnums=(2,))
    def stream(tiles, buf, n):
        # The whole stream in one dispatch: per-call RTT through the
        # development tunnel (~35-100 ms) would otherwise swamp the
        # ~10 ms/slice of real device work.
        def slice_body(s, carry):
            b, acc = carry
            b, root = slice_pipeline(tiles.at[0, 1, 0, 0].add(s.astype(jnp.uint32)), b)
            return (b, acc ^ root)

        return jax.lax.fori_loop(0, n, slice_body, (buf, jnp.zeros(8, jnp.uint32)))

    key = jax.random.PRNGKey(4)
    words = jax.random.randint(
        key, (batch // TILE, nblocks * 16, 8, 128), 0, 1 << 30, dtype=jnp.int32
    ).astype(jnp.uint32)
    buf = jnp.zeros((8, cap), jnp.uint32)
    # Warm/compile BOTH static-n programs before timing (n is a static arg:
    # each value is a separate compilation, and a compile inside the timed
    # region would swamp the ~10 ms/slice of device work).
    _ = np.asarray(stream(words, buf, 1)[1])
    _ = np.asarray(stream(words, buf, n_slices + 1)[1])

    # (n_slices+1)-run minus 1-run leaves exactly n_slices of pipeline work;
    # retry when the two are not clearly distinguishable (noisy tunnel RTT —
    # same discipline as _timed_loop).
    best = None
    for _attempt in range(4):
        rtts, times = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(stream(words, buf, 1)[1])
            rtts.append(time.perf_counter() - t0)
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(stream(words, buf, n_slices + 1)[1])
            times.append(time.perf_counter() - t0)
        sec = float(np.median(times) - np.median(rtts))
        if best is None or sec > best:
            best = sec
        if sec > 0.15 * float(np.median(times)):
            break
    sec = max(best, 1e-9)
    leaves = n_slices * cap
    return leaves * 127 / sec / 1e9, leaves / sec


def bench_engine(
    slice_log2: int = 20,
    batch_log2: int = 16,
    n_batches: int = 32,
    leaf_bytes: int = 127,
    stats_sample_every: int = 0,
    return_stats: bool = False,
):
    """The REAL ``TpuSha256D`` object driven through ``AddSpans``/``Root``
    (VERDICT r3 #5): Python host loop, real per-flush packing, real slice
    appends/reductions and backpressure — everything the fused replica
    (:func:`bench_stream_pipeline`) abstracts away.

    The only substitution is the H2D upload: the stream repeats one batch,
    whose packed words are staged to the device once and reused, because
    this development tunnel moves ~1 MB/s (a production host uploads at
    PCIe/ICI rates).  The device still re-hashes every batch.  The root is
    checked byte-exact against the oracle over the full repeated stream.
    Returns (payload_GBps, leaves_per_sec, ok).

    Defaults are the engine's production shapes (2^20-leaf slices fed by
    2^16-leaf batches).  The result is HOST-bound on this 2-core VM —
    pack-ahead threading, the fused flush dispatch, and the ABI-5 packer
    put it at 1.6-1.8 GB/s here (2.8+ on longer streams as the finalize
    RTT amortizes), against a device that maps+reduces the same stream at
    30+ GB/s (see stream_pipeline).  docs/PERF.md §7 has the breakdown."""
    import jax

    from vk_merkle_roots_tpu import oracle
    from vk_merkle_roots_tpu.config import EngineConfig
    from vk_merkle_roots_tpu.models.tpu import TpuSha256D
    from vk_merkle_roots_tpu.native.lib import native_leaf_hashes_spans

    B = 1 << batch_log2
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=B * leaf_bytes, dtype=np.uint8)
    offs = np.arange(B, dtype=np.int64) * leaf_bytes
    lens = np.full(B, leaf_bytes, np.int64)

    class StagedEngine(TpuSha256D):
        """H2D-staged variant: identical packed words upload once.  The
        staging hook covers BOTH the fused hash+append fast path and the
        general leaf_hashes path."""

        _staged_words = None

        def _stage_words(self, b):
            if StagedEngine._staged_words is None:
                put = jax.device_put(b.words, self._device)
                np.asarray(put[0, 0, 0, :1])  # settle the one real upload
                StagedEngine._staged_words = put
            return StagedEngine._staged_words

        def _hash_packed(self, packed):
            assert len(packed.buckets) == 1 and packed.host_spans is None
            b = packed.buckets[0]
            b.words = self._stage_words(b)
            return super()._hash_packed(packed)

    StagedEngine._staged_words = None
    cfg = EngineConfig(
        slice_log2=slice_log2,
        batch_leaves=B,
        # 0 by default: each sample costs a ~35 ms tunnel RTT.  The on-chip
        # stats-validation test turns sampling on and reads Stats() back.
        stats_sample_every=stats_sample_every,
        backend="auto",
    )
    eng = StagedEngine(name="bench", config=cfg)
    # Warm the compile caches (and the staged upload) outside the timing —
    # including TWO full slices so the grouped slice-reduction program AND
    # the multi-slice finalize (stacked root readback) compile here, not
    # inside the timed loop (a first Mosaic compile costs minutes and would
    # read as a ~200x throughput collapse; the finalize stack is a small
    # XLA compile but still ~100 ms of timed pollution).
    for _ in range(2 << (slice_log2 - batch_log2)):
        assert eng.AddSpans(data, offs, lens)
    eng.Root()
    eng.Reset()  # the staged upload persists: it happens once, pre-timing

    t0 = time.perf_counter()
    for _ in range(n_batches):
        if not eng.AddSpans(data, offs, lens):
            if return_stats:
                return 0.0, 0.0, False, eng.Stats()
            return 0.0, 0.0, False
    got = eng.Root()
    sec = time.perf_counter() - t0

    digs = native_leaf_hashes_spans(data, offs, lens)
    if digs is None:
        digs = np.stack(
            [
                np.frombuffer(
                    oracle.leaf_hash(data[i * leaf_bytes : (i + 1) * leaf_bytes].tobytes()),
                    np.uint8,
                )
                for i in range(B)
            ]
        )
    from vk_merkle_roots_tpu.native.lib import native_merkle_root

    want = native_merkle_root(np.tile(digs, (n_batches, 1)))
    if want is None:
        want = oracle.merkle_root_of_digests(
            [digs[i % B].tobytes() for i in range(B * n_batches)]
        )
    ok = got == want.hex()
    n_leaves = B * n_batches
    rate = n_leaves * leaf_bytes / sec / 1e9
    if return_stats:
        return rate, n_leaves / sec, ok, eng.Stats()
    return rate, n_leaves / sec, ok


def bench_host_pack(n_leaves: int = 1 << 18, maxlen: int = 1024):
    """Host-side packing throughput over variable-length leaves (BASELINE
    config "variable-length leaves — padding/bucketing path").  Sustained
    rate: one warm-up run (ctypes load + first-touch page faults on ~200 MB
    of fresh output buffers cost ~5x on the first call), then the median of
    three — what a long-running stream's staging path actually sees."""
    from vk_merkle_roots_tpu.packing import pack_spans

    rng = np.random.default_rng(5)
    lens = rng.integers(1, maxlen + 1, size=n_leaves)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    data = rng.integers(0, 256, size=int(lens.sum()), dtype=np.uint8)
    assert pack_spans(data, offs, lens).count == n_leaves  # warm-up
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        pack_spans(data, offs, lens)
        times.append(time.perf_counter() - t0)
    return int(lens.sum()) / float(np.median(times)) / 1e6  # MB/s


def bench_tail_variant(log2n: int = 10):
    """Fused in-register tail kernel (the subgroup-shuffle analog,
    SHA-256.comp:307-391) vs XLA per-level tail folds, on one 2^log2n
    block.  On TPU the fused shape WINS ~120x (26 µs vs 3.1 ms — ten tiny
    XLA dispatches are latency-bound) and is the default hot-path tail;
    this mode re-measures both.  Contrast: the reference's own README shows
    its subgroup variant losing on every listed GPU (README.md:100-108).
    First Mosaic compile of the fused body takes minutes (cached after)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from vk_merkle_roots_tpu import oracle
    from vk_merkle_roots_tpu.ops.tree_reduce import (
        _bitrev,
        _tail_reduce_pallas,
        _tail_reduce_xla,
    )
    from vk_merkle_roots_tpu.utils.hexutil import words_to_digest

    interpret = jax.default_backend() != "tpu"
    if interpret:
        raise SystemExit(
            "--tail-variant requires the TPU backend: interpret-mode Pallas "
            "is orders of magnitude too slow to be meaningful"
        )
    n = 1 << log2n
    rng = np.random.default_rng(4)
    digs = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint32)
    fold = jnp.asarray(digs[_bitrev(log2n)]).T  # (8, n) bitrev word-major

    # Correctness gate for BOTH variants.
    want = oracle.merkle_root_of_digests(
        [words_to_digest(digs[i]) for i in range(n)]
    )
    got_fused = words_to_digest(np.asarray(_tail_reduce_pallas(fold, log2n, interpret)))
    got_xla = words_to_digest(np.asarray(_tail_reduce_xla(fold)))
    assert got_fused == want and got_xla == want, "tail variant mismatch"

    out = {}
    for name, fn in (
        ("fused_pallas", lambda w: _tail_reduce_pallas(w, log2n, interpret)),
        ("xla_levels", _tail_reduce_xla),
    ):

        @partial(jax.jit, static_argnums=(1,))
        def step(w, iters, fn=fn):
            def body(_, carry):
                w, acc = carry
                root = fn(w)
                w = w.at[0, 0].add(root[0])
                return (w, acc ^ root[1])

            return jax.lax.fori_loop(0, iters, body, (w, jnp.uint32(0)))

        sec = _timed_loop(step, fold, iters=50)
        out[name] = {"us_per_block": round(sec * 1e6, 2),
                     "node_hashes_per_sec": round((n - 1) / sec)}
    return out


def bench_perf_model():
    """Auditable roofline: jaxpr-traced ALU op counts per compression
    variant, the measured VPU uint32 issue ceiling (Pallas probe of 16
    independent chains), and mapping/reduction throughput expressed as a
    fraction of that ceiling.  This is the derivation behind docs/PERF.md —
    run it to re-verify every number there on the current chip."""
    from vk_merkle_roots_tpu.ops.perf_probe import (
        alu_issue_probe,
        count_vector_ops,
        rot_issue_probe,
    )

    counts = count_vector_ops()
    probe = alu_issue_probe()
    ceiling = probe["lane_ops_per_sec"]
    rot = rot_issue_probe()

    # Measured kernel rates (same shapes as the headline bench).
    map_sec = bench_leaf_hash(1 << 20, 3)
    map_leaves_s = (1 << 20) / map_sec
    map_ops_s = map_leaves_s * counts["leaf_127B"]["total"]

    red_sec = bench_reduce(23)
    red_nodes_s = ((1 << 23) - 1) / red_sec
    red_ops_s = red_nodes_s * counts["node_hash"]["total"]

    return {
        "metric": "perf_model",
        "alu_probe_lane_ops_per_sec": round(ceiling),
        "rot_probe_jaxpr_lane_ops_per_sec": round(rot["jaxpr_lane_ops_per_sec"]),
        "rotate_fusion_ratio": round(rot["jaxpr_lane_ops_per_sec"] / ceiling, 3),
        "op_counts_per_lane": {k: v["total"] for k, v in counts.items()},
        "mapping": {
            "leaves_per_sec": round(map_leaves_s),
            "lane_ops_per_sec": round(map_ops_s),
            "fraction_of_probe_ceiling": round(map_ops_s / ceiling, 3),
        },
        "reduction": {
            "node_hashes_per_sec": round(red_nodes_s),
            "lane_ops_per_sec": round(red_ops_s),
            "fraction_of_probe_ceiling": round(red_ops_s / ceiling, 3),
        },
    }


def bench_cpu_engine(n_leaves: int = 1 << 18, leaf_bytes: int = 127):
    """Native CPU engine leaf-hash rate (SHA-NI x2 when available) — the
    reference's serial CPU engine is the comparison point (SURVEY.md §2.1
    row 5)."""
    from vk_merkle_roots_tpu.native.lib import native_available, native_leaf_hashes_spans

    if not native_available():
        return 0.0
    rng = np.random.default_rng(6)
    data = rng.integers(0, 256, size=n_leaves * leaf_bytes, dtype=np.uint8)
    offs = np.arange(n_leaves, dtype=np.int64) * leaf_bytes
    lens = np.full(n_leaves, leaf_bytes, np.int64)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        native_leaf_hashes_spans(data, offs, lens)
        best = min(best, time.perf_counter() - t0)
    return n_leaves / best / 1e6  # Mh/s


def _spread(samples) -> dict:
    """{median, min, max, n} over repeated runs of one metric — run-to-run
    tunnel-RTT noise is ±17% here (VERDICT r4 weak #2), so a point value
    without its spread is not an honest measurement."""
    arr = sorted(float(s) for s in samples)
    return {
        "median": round(float(np.median(arr)), 3),
        "min": round(arr[0], 3),
        "max": round(arr[-1], 3),
        "n": len(arr),
    }


def bench_wire_cost():
    """Wire-format H2D cost: packed bytes per payload byte for each bucket
    shape (structural — the tile-major format pads every leaf to whole
    64-byte message blocks, so short leaves inflate), plus a measured
    one-shot ``device_put`` rate.  Through the development tunnel that rate
    measures the tunnel (~1 MB/s), not production PCIe/ICI — the structural
    ratios are the transferable numbers (VERDICT r4 next-round #6)."""
    import jax

    from vk_merkle_roots_tpu.constants import padded_block_count
    from vk_merkle_roots_tpu.packing import UNROLL_MAX_BLOCKS, stream_capacity

    ratios = {}
    for leaf_bytes in (24, 64, 127, 256, 512, 1024, 4096, 65536):
        nb = padded_block_count(leaf_bytes)
        # Exact buckets pack nb blocks; stream buckets pack the quantized
        # capacity rung (zero tail blocks are still transferred).
        packed = (nb if nb <= UNROLL_MAX_BLOCKS else stream_capacity(nb)) * 64
        ratios[f"{leaf_bytes}B"] = round(packed / leaf_bytes, 2)

    # One-shot upload rate of a production-shaped batch (2^16 x 127 B
    # packed = 12 MB of tile-major words).
    rng = np.random.default_rng(8)
    words = rng.integers(0, 1 << 32, size=(64, 48, 8, 128), dtype=np.uint32)
    t0 = time.perf_counter()
    put = jax.device_put(words)
    np.asarray(put[0, 0, 0, :1])  # settle
    sec = time.perf_counter() - t0
    return {
        "packed_bytes_per_payload_byte": ratios,
        "h2d_one_shot_MBps": round(words.nbytes / sec / 1e6, 2),
        "h2d_note": "measured through the development tunnel; production "
        "hosts upload at PCIe/ICI rates — use the structural ratios",
    }


def bench_scaling(mesh_sizes=None, n_leaves_per_dev: int = 1 << 16, leaf_bytes: int = 64):
    """Sharded-root throughput at increasing mesh sizes (BASELINE.json's
    scaling-efficiency config).  Uses every local device; on a single-chip
    host this reports the 1-chip row only."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from vk_merkle_roots_tpu.constants import padded_block_count
    from vk_merkle_roots_tpu.parallel.mesh import make_mesh, make_sharded_root_fn, shard_words

    ndev_all = len(jax.devices())
    sizes = mesh_sizes or [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev_all]
    nblocks = padded_block_count(leaf_bytes)
    rows = []
    per_device_base = None
    for ndev in sizes:
        n_leaves = n_leaves_per_dev * ndev
        mesh = make_mesh(n_devices=ndev)
        fn = make_sharded_root_fn(mesh, n_leaves, nblocks)
        rng = np.random.default_rng(3)
        words = shard_words(
            mesh,
            rng.integers(
                0, 1 << 32, size=(n_leaves // 1024, nblocks * 16, 8, 128), dtype=np.uint32
            ),
        )

        # Dependent-loop timing with RTT baseline (same discipline as
        # _timed_loop): a single timed dispatch would mostly measure the
        # host readback round-trip, not the chips.
        @partial(jax.jit, static_argnums=(1,))
        def step(w, iters, fn=fn):
            def body(_, carry):
                w, acc = carry
                root = fn(w)
                w = w.at[0, 0, 0, 0].add(root[0])
                return (w, acc ^ root[1])

            return jax.lax.fori_loop(0, iters, body, (w, jnp.uint32(0)))

        sec = _timed_loop(step, words, iters=8)
        leaves_per_s = n_leaves / sec
        if per_device_base is None:
            per_device_base = leaves_per_s / ndev
        rows.append(
            {
                "devices": ndev,
                "leaves_per_sec": round(leaves_per_s),
                "efficiency": round(leaves_per_s / (per_device_base * ndev), 3),
            }
        )
    return rows


def main():
    import argparse

    from vk_merkle_roots_tpu.config import enable_persistent_cache

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--scaling", action="store_true", help="mesh-scaling rows instead")
    parser.add_argument(
        "--tail-variant",
        action="store_true",
        help="fused in-register tail kernel vs XLA level folds (first TPU "
        "compile of the fused body takes minutes; cached afterwards)",
    )
    parser.add_argument(
        "--perf-model",
        action="store_true",
        help="auditable roofline: jaxpr op counts + measured VPU issue "
        "ceiling + mapping/reduction as a fraction of it (docs/PERF.md)",
    )
    parser.add_argument(
        "--wire-cost",
        action="store_true",
        help="wire-format H2D cost: packed-bytes/payload-byte per bucket "
        "shape + a one-shot device_put rate",
    )
    parser.add_argument("--profile", metavar="DIR", default=None, help="write a jax.profiler trace")
    args = parser.parse_args()

    enable_persistent_cache()

    if args.perf_model:
        print(json.dumps(bench_perf_model()))
        return

    if args.scaling:
        rows = bench_scaling()
        out = {"metric": "scaling", "rows": rows}
        if len(rows) == 1:
            # A one-row table normalized to itself carries zero scaling
            # information (VERDICT r4 weak #3) — say so, and give the
            # analytic communication model so the BASELINE 2-host target is
            # at least derivable: the sharded root exchanges ONE all_gather
            # of 32 B per device (volume independent of leaf count,
            # parallel/mesh.py), so the communication share at N devices is
            # t_allgather(32*N B) over ~10 ms of per-slice local work —
            # sub-0.1% on ICI, i.e. projected efficiency > 99% to 2 hosts.
            out["note"] = (
                "single-chip environment: multi-chip efficiency is "
                "unmeasurable here; the row is the 1-chip rate, and its "
                "efficiency field is 1.0 by construction"
            )
            out["comm_model"] = {
                "allgather_bytes_per_device": 32,
                "volume_vs_leaf_count": "independent",
                "projected_efficiency_2_hosts": "> 0.99 (32 B/chip "
                "all_gather vs ~10 ms/slice local reduce; DCN hop ~10-100 us)",
            }
        print(json.dumps(out))
        return

    if args.tail_variant:
        print(json.dumps({"metric": "tail_variant", **bench_tail_variant()}))
        return

    if args.wire_cost:
        print(json.dumps({"metric": "wire_cost", **bench_wire_cost()}))
        return

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
    _correctness_gate()

    # Every headline metric is sampled REPEATS times and reported as
    # {median, min, max, n}: single points drifted ±17% run-to-run through
    # the tunnel (55.5 vs 61.5 GB/s mapping across r4 runs, VERDICT r4
    # weak #2), so spread fields are part of the artifact now.
    REPEATS = 3

    # Mapping: 2^20 leaves x 127 B (the canonical leaf size; 3 blocks).
    n_leaves, leaf_bytes, nblocks = 1 << 20, 127, 3
    map_gbps_runs = [
        n_leaves * leaf_bytes / bench_leaf_hash(n_leaves, nblocks) / 1e9
        for _ in range(REPEATS)
    ]
    payload_gbps = float(np.median(map_gbps_runs))
    leaf_hashes_per_s = payload_gbps * 1e9 / leaf_bytes

    # Reduction: 2^23 digests = 256 MB, the reference's benchmark shape.
    red_gbps_runs = [(1 << 23) * 32 / bench_reduce(23) / 1e9 for _ in range(REPEATS)]
    red_gbps = float(np.median(red_gbps_runs))
    red_nodes_per_s = red_gbps * 1e9 / 32 * ((1 << 23) - 1) / (1 << 23)
    # Full dataflow from the engine's group-bitrev storage (round 4): the
    # mapping stage emits batches packed bit-reversed, so this is the real
    # slice-reduction rate with NO device permutation.
    red_grp_runs = [
        (1 << 23) * 32 / bench_reduce(23, group_log2=16) / 1e9 for _ in range(REPEATS)
    ]
    red_grp_gbps = float(np.median(red_grp_runs))
    # Round-3 dataflow (natural order + factored bitrev), kept for contrast.
    red_nat_gbps = (1 << 23) * 32 / bench_reduce(23, natural=True) / 1e9

    stream_map_gbps = bench_leaf_hash_stream()
    lat_runs = [bench_root_latency(1 << 20, 127) * 1e3 for _ in range(REPEATS)]
    lat_ms = float(np.median(lat_runs))
    lat64_sec = bench_root_latency(1 << 16, 64, iters=400)
    stream_runs = [bench_stream_pipeline() for _ in range(REPEATS)]
    stream_gbps = float(np.median([r[0] for r in stream_runs]))
    stream_leaves = float(np.median([r[1] for r in stream_runs]))
    # 3 runs: the FIRST engine run of a process is reproducibly ~40%
    # slower (the malloc arena keeps growing through its timed phase as
    # JAX releases staged buffers late; later runs live inside the
    # established high-water mark) — the median reports steady state and
    # the spread keeps the cold run visible.
    engine_runs = [bench_engine() for _ in range(3)]
    engine_ok = all(r[2] for r in engine_runs)
    engine_gbps = float(np.median([r[0] for r in engine_runs]))
    engine_leaves = float(np.median([r[1] for r in engine_runs]))
    pack_runs = [bench_host_pack() for _ in range(2)]
    pack_mbps = float(np.median(pack_runs))

    # Baselines: reference's best published rows (BASELINE.md).
    base_map_gbps = 3.039  # Iris Xe mapping
    base_red_gbps = 16.0  # RTX 4070 Super reduction

    result = {
        "metric": "sha256d_leaf_hash_throughput",
        "value": round(payload_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(payload_gbps / base_map_gbps, 2),
        "extras": {
            "leaf_hashes_per_sec": round(leaf_hashes_per_s),
            "leaf_shape": f"2^20 x {leaf_bytes}B",
            "reduction_GBps_2^23_digests": round(red_gbps, 3),
            "reduction_grouped_GBps_2^23": round(red_grp_gbps, 3),
            "reduction_natural_GBps_2^23": round(red_nat_gbps, 3),
            "reduction_vs_best_baseline": round(red_gbps / base_red_gbps, 2),
            "reduction_node_hashes_per_sec": round(red_nodes_per_s),
            "mapping_GBps_64KB_leaves_stream": round(stream_map_gbps, 3),
            "root_latency_ms_2^20x127B": round(lat_ms, 3),
            "root_latency_ms_2^16x64B": round(lat64_sec * 1e3, 3),
            "stream_pipeline_GBps_4x2^20x127B": round(stream_gbps, 3),
            "stream_pipeline_leaves_per_sec": round(stream_leaves),
            "engine_GBps_2^21x127B": round(engine_gbps, 3),
            "engine_leaves_per_sec": round(engine_leaves),
            "engine_root_ok": engine_ok,
            "host_pack_MBps_varlen": round(pack_mbps, 1),
            "cpu_engine_Mhps_127B": round(bench_cpu_engine(), 1),
            "backend": __import__("jax").default_backend(),
            "spread": {
                "mapping_GBps": _spread(map_gbps_runs),
                "reduction_GBps": _spread(red_gbps_runs),
                "reduction_grouped_GBps": _spread(red_grp_runs),
                "root_latency_ms_2^20x127B": _spread(lat_runs),
                "stream_pipeline_GBps": _spread([r[0] for r in stream_runs]),
                "engine_GBps": _spread([r[0] for r in engine_runs]),
                "host_pack_MBps": _spread(pack_runs),
            },
            "wire_cost": bench_wire_cost(),
        },
    }
    if args.profile:
        import jax

        jax.profiler.stop_trace()
        result["extras"]["profile_dir"] = args.profile
    print(json.dumps(result))


if __name__ == "__main__":
    main()
