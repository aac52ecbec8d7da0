"""Auditable speed-of-light model for the SHA-256d kernels.

The reference publishes GB/s tables (``/root/reference/README.md:100-108``)
but never derives a hardware ceiling, so "is this fast?" is unanswerable
there.  This tool makes the claim auditable for the TPU build:

1. **Op counts** — trace the exact kernel math (``ops/sha256_core.py``, the
   same functions the Pallas kernels trace) with ``jax.make_jaxpr`` and
   count VPU vector primitives.  Nothing is estimated from pencil-and-paper
   round math; the count includes every fold the SymU32 partial evaluator
   removed and every op the 3-op Ch / cached-XOR Maj forms saved.
2. **VPU issue rate** — measure sustained uint32 ALU ops/s on the actual
   chip with a pure-ALU Pallas microbenchmark (independent chains of
   add/xor over (8,128) registers, no memory traffic in the timed loop).
   This sidesteps spec-sheet ambiguity (clock x ALU-count is not public
   for v5e) and measures the bound the kernels actually compete against.
3. **Speed of light** — ceiling bytes/s = issue_rate / (ops per byte);
   report each bench metric as a % of its ceiling.

Run ``python -m vk_merkle_roots_tpu.tools.perf_model`` (CPU: op counts
only; TPU: adds the microbenchmark and ceilings).  ``docs/PERF.md`` records
the derivation and the measured numbers.
"""

from __future__ import annotations

import json

import numpy as np

# Primitives that issue one VPU op per element-lane on TPU.  Everything the
# SHA round math emits lands in this set (uint32 adds, rotate = 2 shifts +
# or, sigma xors, Ch/Maj bitwise ops); ``select_n`` appears only in masked
# stream-kernel variants.
VPU_OPS = {
    "add",
    "sub",
    "xor",
    "and",
    "or",
    "shift_left",
    "shift_right_logical",
    "shift_right_arithmetic",
    "select_n",
    "not",
}
# Free at runtime: layout/metadata ops and host-side constant folding.
FREE_OPS = {
    "broadcast_in_dim",
    "reshape",
    "convert_element_type",
    "squeeze",
    "transpose",
    "slice",
    "concatenate",
    "iota",
    "copy",
    "pjit",  # recursed into
    "custom_jvp_call",
}


def count_vpu_ops(fn, *args) -> dict[str, int]:
    """Count VPU vector primitives in ``fn``'s jaxpr, recursing into inner
    jaxprs (pjit/closed calls).  All traced arrays in these kernels share
    one shape, so each primitive = one vector issue."""
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args)
    counts: dict[str, int] = {}

    def walk(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                walk(inner.jaxpr if hasattr(inner, "jaxpr") else inner)
                continue
            if name in VPU_OPS:
                counts[name] = counts.get(name, 0) + 1
            elif name not in FREE_OPS:
                counts.setdefault(f"other:{name}", 0)
                counts[f"other:{name}"] += 1
    walk(jaxpr.jaxpr)
    counts["total_vpu"] = sum(v for k, v in counts.items() if k in VPU_OPS)
    return counts


def kernel_op_counts() -> dict:
    """Vector-op counts for each compression the kernels execute, traced
    from the same functions the Pallas bodies trace."""
    import jax.numpy as jnp

    from ..ops import sha256_core as core

    reg = lambda: jnp.zeros((8, 128), jnp.uint32)  # noqa: E731
    st8 = tuple(reg() for _ in range(8))
    w16 = [reg() for _ in range(16)]

    generic = count_vpu_ops(lambda s, w: core.compress(tuple(s), list(w)), st8, w16)
    const_sched = count_vpu_ops(lambda s: core.compress_const_schedule(tuple(s)), st8)
    finalize = count_vpu_ops(lambda s: core.finalize_sha256d(tuple(s)), st8)
    first_iv = count_vpu_ops(
        lambda w: tuple(
            x.value()
            for x in core.compress_sym(
                core._iv_syms(), [core.SymU32(v) for v in list(w)]
            )
        ),
        w16,
    )
    node = count_vpu_ops(
        lambda l, r: core.node_hash_words(tuple(l), tuple(r)), st8, st8
    )
    leaf3 = count_vpu_ops(
        lambda a, b, c: core.leaf_digest_words([list(a), list(b), list(c)]),
        w16, w16, w16,
    )
    return {
        "compress_generic": generic["total_vpu"],
        "compress_first_block_iv_folded": first_iv["total_vpu"],
        "compress_const_schedule_pad": const_sched["total_vpu"],
        "finalize_sha256d_folded": finalize["total_vpu"],
        "node_hash_ops": node["total_vpu"],
        "leaf127B_ops": leaf3["total_vpu"],
        "node_hash_breakdown": {k: v for k, v in node.items() if k != "total_vpu"},
    }


# ------------------------------------------------------- VPU issue ceiling


def measure_vpu_issue_rate(chains: int = 8, depth: int = 510, steps: int = 64,
                           iters: int = 8) -> float:
    """Sustained uint32 VPU ops/s: ``chains`` independent dependency chains
    on (8,128) u32 registers, ``depth`` ops deep, repeated ``steps`` times
    per kernel via fori_loop, timed over a dependent outer loop (same
    discipline as bench.py).  With >= 8 independent chains the VPU pipeline
    is saturated and this measures issue bandwidth, not latency.

    The chain unit is ``v = rotr(v ^ c1, k) + c2`` — 2 shifts, or, xor,
    add — matching the SHA round mix (the node-hash breakdown is ~37%
    shifts, ~22% xor, ~19% add, ~17% or, ~4% and), so a unit whose ops
    issue at different rates is weighted the way the real kernels weight
    it."""
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert depth % 5 == 0, "depth counts individual ops; the chain unit is 5"

    def kern(x_ref, o_ref):
        def body(_, regs):
            out = []
            for c, r in enumerate(regs):
                v = r
                for d in range(depth // 5):
                    t = v ^ np.uint32(c * depth + d + 1)
                    k = 1 + (d % 31)
                    v = ((t >> k) | (t << (32 - k))) + np.uint32(c + d)
                out.append(v)
            return tuple(out)

        regs = tuple(x_ref[c] for c in range(chains))
        regs = jax.lax.fori_loop(0, steps, body, regs)
        for c in range(chains):
            o_ref[c] = regs[c]

    @partial(jax.jit, static_argnums=(1,))
    def step(x, n):
        def body(_, carry):
            x, acc = carry
            y = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((chains, 8, 128), jnp.uint32),
            )(x)
            return (x.at[0, 0, 0].add(y[0, 0, 1]), acc ^ y[0, 0, 0])

        return jax.lax.fori_loop(0, n, body, (x, jnp.uint32(0)))

    x = jnp.arange(chains * 8 * 128, dtype=jnp.uint32).reshape(chains, 8, 128)
    _ = np.asarray(step(x, 1)[1])  # compile
    rtts, times = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(step(x, 0)[1])
        rtts.append(time.perf_counter() - t0)
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(step(x, iters)[1])
        times.append(time.perf_counter() - t0)
    sec = max(float(np.median(times) - np.median(rtts)), 1e-9) / iters
    lane_ops = chains * depth * steps * 8 * 128
    return lane_ops / sec


def main() -> None:
    import jax

    counts = kernel_op_counts()
    out: dict = {"op_counts": counts}

    # Per-metric op budgets (ops are per (8,128)-register primitive; each
    # primitive does 1024 u32 lane-ops).
    LANES = 8 * 128
    leaf_ops = counts["leaf127B_ops"] * LANES  # per 1024... per-leaf: /1024
    node_ops = counts["node_hash_ops"] * LANES
    out["lane_ops_per_127B_leaf"] = counts["leaf127B_ops"]
    out["lane_ops_per_node_hash"] = counts["node_hash_ops"]
    del leaf_ops, node_ops

    if jax.default_backend() == "tpu":
        rate = measure_vpu_issue_rate()
        out["vpu_u32_ops_per_sec"] = rate
        # Ceilings: mapping GB/s over 127 B leaves; reduction GB/s over
        # 32 B/digest with (n-1)/n ~ 1 node per digest.
        out["ceiling_mapping_GBps_127B"] = rate / counts["leaf127B_ops"] * 127 / 1e9
        out["ceiling_reduction_GBps"] = rate / counts["node_hash_ops"] * 32 / 1e9
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
