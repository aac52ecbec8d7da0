"""Auditable performance model: op counts + an empirical VPU issue probe.

Round 1 claimed the mapping kernel runs at "~92% of the v5e VPU's
theoretical int-op issue rate" without showing the arithmetic.  This module
makes both sides of that ratio measurable on the actual machine:

* :func:`count_vector_ops` traces the real kernel bodies with
  ``jax.make_jaxpr`` and counts the uint32 vector ALU primitives that
  reach the compiler — adds, xors, ands, ors, shifts.  Because the Pallas
  kernels trace the *same* ``sha256_core`` functions, these counts are the
  per-lane op cost of one compression as actually emitted (including
  everything the SymU32 constant folder deleted), not a hand-derived
  estimate.
* :func:`alu_issue_probe` measures the chip's achievable uint32 vector-op
  issue rate with a Pallas kernel of 16 independent add/xor/rotate chains
  (enough ILP to saturate issue, no memory traffic in the loop).  This is
  the empirical "speed of light" that mapping/reduction throughput is
  compared against in docs/PERF.md — the role of a vendor datasheet number,
  except measured, on this chip, through this compiler.

The reference has no analog (its README reports GB/s without a roofline,
/root/reference/README.md:100-108); BASELINE.md's numbers are taken at face
value there too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import TILE_LANE, TILE_SUB
from . import sha256_core

# Primitives that map 1:1 to a VPU uint32 vector ALU op.  Everything else a
# SHA jaxpr contains (broadcasts of host-folded constants, reshapes) is
# either free or amortized noise.
_ALU_PRIMS = {
    "add",
    "sub",
    "xor",
    "and",
    "or",
    "shift_right_logical",
    "shift_left",
}


def _count_jaxpr_ops(closed) -> dict[str, int]:
    counts: dict[str, int] = {}
    for eqn in closed.jaxpr.eqns:
        name = eqn.primitive.name
        if name in _ALU_PRIMS:
            counts[name] = counts.get(name, 0) + 1
    counts["total"] = sum(v for k, v in counts.items() if k != "total")
    return counts


def count_vector_ops() -> dict[str, dict[str, int]]:
    """Per-lane uint32 ALU op counts of each compression variant, traced
    from the same functions the kernels run.  Keys:

    * ``compress`` — generic 64-round compression (message block of leaf
      data or the first block of a node pair).
    * ``compress_const_schedule`` — the constant padding block of every
      64-byte message (schedule pre-folded with K on the host).
    * ``finalize_sha256d`` — second SHA-256 pass over a 32-byte digest
      (IV + padding words const-folded by the SymU32 partial evaluator).
    * ``node_hash`` — one full interior-node hash: sym-folded first
      compression + const-schedule block + finalization.
    * ``leaf_127B`` — one full 127-byte (3-block) leaf SHA-256d.
    """
    shape = (TILE_SUB, TILE_LANE)
    v = jnp.zeros(shape, jnp.uint32)
    s8 = (v,) * 8
    w16 = [v] * 16

    out = {}
    out["compress"] = _count_jaxpr_ops(
        jax.make_jaxpr(lambda s, w: sha256_core.compress(s, w))(s8, w16)
    )
    out["compress_const_schedule"] = _count_jaxpr_ops(
        jax.make_jaxpr(sha256_core.compress_const_schedule)(s8)
    )
    out["finalize_sha256d"] = _count_jaxpr_ops(
        jax.make_jaxpr(sha256_core.finalize_sha256d)(s8)
    )
    out["node_hash"] = _count_jaxpr_ops(
        jax.make_jaxpr(lambda l, r: sha256_core.node_hash_words(l, r))(s8, s8)
    )
    out["leaf_127B"] = _count_jaxpr_ops(
        jax.make_jaxpr(lambda blocks: sha256_core.leaf_digest_words(blocks))(
            [w16, w16, w16]
        )
    )
    return out


# ------------------------------------------------------------------- probe

_PROBE_ROUNDS = 1024  # unrolled ALU ops per chain per in-kernel pass
_PROBE_PASSES = 32  # in-kernel fori_loop trips over the unrolled block

# Why the pass loop: one 1024-op unrolled block is only ~0.2 us of VPU work,
# so a kernel that runs it once per grid step is dominated by the fixed
# per-grid-step cost and *understates* the issue ceiling — round 2's probes
# did exactly that (3.78e12 "ceiling" while production kernels measured
# 5.9e12 after their own per-step overhead was amortized away).  Looping the
# block 32x in-kernel (the unrolled body is traced once; the loop carry is
# the 16 registers) makes each grid step ~6 us of pure ALU work.


def _probe_kernel(x_ref, o_ref):
    """16 independent chains of dependent add/xor/rotate uint32 vector ops.

    Each chain step is ONE ALU op on an (8,128) vreg; chains only read each
    other's values from >= 8 steps ago, so at least 16 ops are always
    independent — far beyond the VPU pipeline depth.  No loads or stores in
    the loop; nothing is a trace-time constant, so Mosaic cannot fold any
    of it away.
    """
    import jax

    def chain_pass(_, regs):
        regs = list(regs)
        for t in range(_PROBE_ROUNDS):
            j = t % 16
            k = (t + 5) % 16
            op = t % 4
            if op == 0:
                regs[j] = regs[j] + regs[k]
            elif op == 1:
                regs[j] = regs[j] ^ regs[k]
            elif op == 2:
                regs[j] = regs[j] >> ((j % 7) + 1)
            else:
                regs[j] = regs[j] | regs[k]
        return tuple(regs)

    regs = jax.lax.fori_loop(
        0, _PROBE_PASSES, chain_pass, tuple(x_ref[0, j] for j in range(16))
    )
    acc = regs[0]
    for r in regs[1:]:
        acc = acc ^ r
    o_ref[0, 0] = acc


def _make_probe_step(kernel):
    """Jitted dependent-loop driver shared by both probes: ``iters``
    back-to-back kernel launches chained through one scalar so the device
    cannot overlap or elide them (bench.py's timing discipline)."""

    @partial(jax.jit, static_argnums=(1,))
    def step(x, iters: int):
        t = x.shape[0]
        call = pl.pallas_call(
            kernel,
            grid=(t,),
            in_specs=[
                pl.BlockSpec(
                    (1, 16, TILE_SUB, TILE_LANE),
                    lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 1, TILE_SUB, TILE_LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((t, 1, TILE_SUB, TILE_LANE), jnp.uint32),
        )

        def body(_, carry):
            w, acc = carry
            out = call(w)
            w = w.at[0, 0, 0, 0].add(out[0, 0, 0, 0])
            return (w, acc ^ out[0, 0, 0, 1])

        return jax.lax.fori_loop(0, iters, body, (x, jnp.uint32(0)))

    return step


def _rot_probe_kernel(x_ref, o_ref):
    """Rotate-heavy variant: each round is ``rotr(x, c) ^ y`` — 4 jaxpr ops
    (two shifts, an or, a xor).  Comparing this probe's jaxpr-ops/s against
    the plain probe reveals whether Mosaic lowers the rotate idiom to fewer
    hardware ops (a fused rotate would make this probe's apparent jaxpr rate
    HIGHER); SHA-256 is ~53% rotate idiom by jaxpr ops, so this bounds the
    model error.  Same in-kernel pass loop as ``_probe_kernel`` (see note
    above) so the fixed per-grid-step cost does not pollute the reading."""
    import jax

    def chain_pass(_, regs):
        regs = list(regs)
        for t in range(_PROBE_ROUNDS // 4):
            j = t % 16
            k = (t + 5) % 16
            c = (t % 7) + 1
            x = regs[j]
            regs[j] = ((x >> c) | (x << (32 - c))) ^ regs[k]
        return tuple(regs)

    regs = jax.lax.fori_loop(
        0, _PROBE_PASSES, chain_pass, tuple(x_ref[0, j] for j in range(16))
    )
    acc = regs[0]
    for r in regs[1:]:
        acc = acc ^ r
    o_ref[0, 0] = acc


_probe_step = _make_probe_step(_probe_kernel)
_rot_probe_step = _make_probe_step(_rot_probe_kernel)


def _timed_probe(step, seed: int, tiles: int, iters: int) -> float:
    """Seconds per probe pass: dependent-loop timing with RTT subtraction
    and the retry-until-distinguishable discipline shared with bench.py
    (the remote tunnel's readback RTT would otherwise dominate)."""
    import time

    key = jax.random.PRNGKey(seed)
    x = jax.random.randint(
        key, (tiles, 16, TILE_SUB, TILE_LANE), 0, 1 << 30, dtype=jnp.int32
    ).astype(jnp.uint32)
    _ = np.asarray(step(x, 1)[1])  # compile + warm
    best = None
    for _attempt in range(4):
        rtts, times = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(step(x, 0)[1])
            rtts.append(time.perf_counter() - t0)
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(step(x, iters)[1])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times) - np.median(rtts))
        if best is None or dt > best:
            best = dt
        if dt > 0.15 * float(np.median(times)):
            break
    return max(best, 1e-9) / iters


def alu_issue_probe(tiles: int = 256, iters: int = 20) -> dict[str, float]:
    """Measured uint32 vector-op issue rate, in lane-ops/s (one lane-op =
    one uint32 ALU operation on one of the 1024 lanes of a vreg)."""
    sec = _timed_probe(_probe_step, 7, tiles, iters)
    lane_ops = tiles * _PROBE_PASSES * _PROBE_ROUNDS * TILE_SUB * TILE_LANE
    return {
        "lane_ops_per_sec": lane_ops / sec,
        "sec_per_pass": sec,
        "tiles": tiles,
        "rounds_per_tile": _PROBE_PASSES * _PROBE_ROUNDS,
    }


def rot_issue_probe(tiles: int = 256, iters: int = 20) -> dict[str, float]:
    """Jaxpr-ops/s of the rotate-idiom probe (see ``_rot_probe_kernel``).
    If this comes out close to :func:`alu_issue_probe`'s rate, shifts/ors
    of the rotate idiom cost one hw op each (no fusion) and the plain probe
    IS the ceiling for SHA; if materially higher, Mosaic fuses rotates and
    the model's fraction-of-ceiling overestimates by up to that ratio."""
    sec = _timed_probe(_rot_probe_step, 9, tiles, iters)
    # 4 jaxpr ops per round, _PROBE_ROUNDS//4 rounds -> _PROBE_ROUNDS ops.
    lane_ops = tiles * _PROBE_PASSES * _PROBE_ROUNDS * TILE_SUB * TILE_LANE
    return {"jaxpr_lane_ops_per_sec": lane_ops / sec, "sec_per_pass": sec}
