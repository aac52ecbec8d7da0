"""Auditable speed-of-light model for the SHA-256d kernels (CLI veneer).

The reference publishes GB/s tables (``/root/reference/README.md:100-108``)
but never derives a hardware ceiling, so "is this fast?" is unanswerable
there.  This tool prints the model's inputs as JSON: per-lane vector-op
counts traced from the exact kernel math, and (on TPU) the measured VPU
issue rates plus the derived per-stage ceilings.

All measurement and counting logic lives in ``ops/perf_probe`` — the same
module ``bench.py --perf-model`` drives — so there is exactly one
implementation of the probes and one ALU-primitive set (an earlier copy
here drifted from it).  ``docs/PERF.md`` records the derivation, the
measured numbers, and the rotate-fusion caveat that bounds the model error.

Run ``python -m vk_merkle_roots_tpu.tools.perf_model`` (CPU: op counts
only; TPU: adds the probes and ceilings).
"""

from __future__ import annotations

import json


def main() -> None:
    import jax

    from ..ops.perf_probe import alu_issue_probe, count_vector_ops, rot_issue_probe

    counts = count_vector_ops()
    out: dict = {
        "op_counts": {k: v["total"] for k, v in counts.items()},
        "op_breakdown": counts,
    }
    leaf_ops = counts["leaf_127B"]["total"]
    node_ops = counts["node_hash"]["total"]

    if jax.default_backend() == "tpu":
        plain = alu_issue_probe()
        rot = rot_issue_probe()
        rate = plain["lane_ops_per_sec"]
        out["vpu_u32_lane_ops_per_sec"] = rate
        out["rot_idiom_jaxpr_lane_ops_per_sec"] = rot["jaxpr_lane_ops_per_sec"]
        out["rotate_fusion_ratio"] = rot["jaxpr_lane_ops_per_sec"] / rate
        # Ceilings vs the uniform-mix probe: mapping GB/s over 127 B
        # leaves; reduction GB/s over 32 B/digest with ~1 node per digest.
        # Because Mosaic fuses the rotate idiom (ratio above), SHA-shaped
        # kernels can legitimately exceed these — they are floors on the
        # ceiling, not exact (docs/PERF.md §3).
        out["ceiling_mapping_GBps_127B"] = rate / leaf_ops * 127 / 1e9
        out["ceiling_reduction_GBps"] = rate / node_ops * 32 / 1e9
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
