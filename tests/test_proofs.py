"""Merkle authentication paths (the reference's unimplemented future work,
/root/reference/README.md:118-120): generation + verification across odd
counts, phantom heights, multi-slice streams, and both engines."""

import numpy as np
import pytest

from vk_merkle_roots_tpu import CpuSha256D, oracle
from vk_merkle_roots_tpu.config import EngineConfig
from vk_merkle_roots_tpu.models.tpu import TpuSha256D
from tests.conftest import random_leaves


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 13, 64, 100])
def test_oracle_proof_roundtrip_every_index(rng, n):
    leaves = random_leaves(rng, n, maxlen=40)
    root = oracle.merkle_root(leaves)
    for i in range(n):
        path = oracle.merkle_proof(leaves, i)
        assert oracle.verify_proof(oracle.leaf_hash(leaves[i]), path) == root


def test_proof_with_phantom_height(rng):
    digests = [oracle.leaf_hash(x) for x in random_leaves(rng, 5, maxlen=20)]
    root = oracle.reduce_slice(digests, 4)
    for i in range(5):
        path = oracle.merkle_proof_of_digests(digests, i, height=4)
        assert len(path) == 4
        assert oracle.verify_proof(digests[i], path) == root


def test_proof_rejects_bad_index(rng):
    with pytest.raises(IndexError):
        oracle.merkle_proof([b"a", b"b"], 2)


def test_tampered_proof_fails(rng):
    leaves = random_leaves(rng, 8, maxlen=20)
    root = oracle.merkle_root(leaves)
    path = oracle.merkle_proof(leaves, 3)
    bad = [(bytes(32), path[0][1])] + path[1:]
    assert oracle.verify_proof(oracle.leaf_hash(leaves[3]), bad) != root


def test_cpu_engine_proof(rng):
    leaves = random_leaves(rng, 20, maxlen=30)
    e = CpuSha256D()
    e.AddMany(leaves)
    root = bytes.fromhex(e.Root())
    path = e.Proof(7)
    assert oracle.verify_proof(oracle.leaf_hash(leaves[7]), path) == root


@pytest.mark.parametrize("n", [10, 64, 200])
def test_tpu_engine_proof_multi_slice(rng, n):
    leaves = random_leaves(rng, n, maxlen=50)
    e = TpuSha256D(
        name="t",
        config=EngineConfig(slice_log2=6, batch_leaves=30, backend="xla", keep_digests=True),
    )
    e.AddMany(leaves)
    root = bytes.fromhex(e.Root())
    for i in {0, n // 2, n - 1}:
        path = e.Proof(i)
        assert oracle.verify_proof(oracle.leaf_hash(leaves[i]), path) == root


def test_verify_tool_roundtrip(rng, tmp_path, capsys):
    """vkmr --proof JSON -> vkmr-verify: accepts the valid path, rejects a
    tampered root, both via the importable main()."""
    import json

    from vk_merkle_roots_tpu.tools import verify as vtool

    leaves = random_leaves(rng, 9, maxlen=30)
    root = oracle.merkle_root(leaves)
    path = oracle.merkle_proof(leaves, 4)
    record = {
        "leaf_index": 4,
        "root": root.hex(),
        "path": [{"sibling": s.hex(), "side": side} for s, side in path],
    }
    pj = tmp_path / "proof.json"
    pj.write_text(json.dumps(record))
    rc = vtool.main([str(pj), "--leaf-hex", leaves[4].hex()])
    assert rc == 0 and capsys.readouterr().out.startswith(f"OK {root.hex()}")

    record["root"] = "00" * 32
    pj.write_text(json.dumps(record))
    assert vtool.main([str(pj), "--leaf-hex", leaves[4].hex()]) == 1

    # Wrong leaf also fails.
    pj.write_text(json.dumps(dict(record, root=root.hex())))
    assert vtool.main([str(pj), "--leaf-hex", leaves[5].hex()]) == 1


def test_tpu_engine_proof_requires_flag(rng):
    e = TpuSha256D(name="t", config=EngineConfig(slice_log2=6, backend="xla"))
    e.AddMany(random_leaves(rng, 5, maxlen=10))
    e.Root()
    with pytest.raises(RuntimeError):
        e.Proof(0)
