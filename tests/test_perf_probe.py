"""The perf model's op counts must track the real kernel source.

docs/PERF.md derives the roofline from these counts; if an edit to
``sha256_core`` changes the emitted op mix, this test moves and the doc's
numbers must be re-derived (``python bench.py --perf-model`` on TPU).
"""

from vk_merkle_roots_tpu.ops.perf_probe import count_vector_ops


def test_op_counts_structure():
    c = count_vector_ops()
    for name in (
        "compress",
        "compress_const_schedule",
        "finalize_sha256d",
        "node_hash",
        "leaf_127B",
    ):
        assert c[name]["total"] > 0
        assert c[name]["total"] == sum(v for k, v in c[name].items() if k != "total")

    # The const-schedule block must be cheaper than a generic compression
    # (that is its whole point), and the sym-folded finalization cheaper
    # than generic compress too (IV + padding constants folded).
    assert c["compress_const_schedule"]["total"] < c["compress"]["total"]
    assert c["finalize_sha256d"]["total"] < c["compress"]["total"]

    # A node hash is 3 compressions' worth of work minus all the folding.
    assert c["node_hash"]["total"] < 3 * c["compress"]["total"]
    # A 3-block leaf is 4 compressions minus folding.
    assert c["leaf_127B"]["total"] < 4 * c["compress"]["total"]


def test_op_counts_are_current():
    """Pin the totals the PERF.md derivation uses; update BOTH on change."""
    c = count_vector_ops()
    assert c["node_hash"]["total"] == 8622, c["node_hash"]
    assert c["leaf_127B"]["total"] == 12951, c["leaf_127B"]
