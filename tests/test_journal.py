"""Slice-root journal + resume (checkpoint story the reference lacks,
SURVEY.md §5.4)."""

import json
import os

import numpy as np
import pytest

from vk_merkle_roots_tpu import oracle
from vk_merkle_roots_tpu.config import EngineConfig
from vk_merkle_roots_tpu.models.tpu import TpuSha256D
from tests.conftest import random_leaves
from tests.test_cli import _run_cli


def _cfg(tmp_path, **kw):
    kw.setdefault("slice_log2", 6)
    kw.setdefault("batch_leaves", 40)
    kw.setdefault("backend", "xla")
    kw.setdefault("journal_path", str(tmp_path / "journal.jsonl"))
    return EngineConfig(**kw)


def test_journal_written_and_resume_matches(rng, tmp_path):
    leaves = random_leaves(rng, 200, maxlen=40)
    cfg = _cfg(tmp_path)
    e = TpuSha256D(name="j", config=cfg)
    e.AddMany(leaves)
    want = e.Root()
    assert want == oracle.merkle_root(leaves).hex()

    lines = [json.loads(l) for l in open(cfg.journal_path)]
    assert len(lines) == 3  # 200 leaves / 64-leaf slices -> 3 full slices
    assert [l["slice"] for l in lines] == [0, 1, 2]

    # Resume: preload the journaled roots, feed only the remaining leaves.
    e2 = TpuSha256D(name="j2", config=EngineConfig(slice_log2=6, backend="xla"))
    e2.PreloadSliceRoots([bytes.fromhex(l["root"]) for l in lines])
    e2.AddMany(leaves[192:])
    assert e2.Root() == want


def test_resume_from_partial_journal(rng, tmp_path):
    """A journal truncated mid-stream (crash) still resumes correctly."""
    leaves = random_leaves(rng, 200, maxlen=40)
    cfg = _cfg(tmp_path)
    e = TpuSha256D(name="j", config=cfg)
    e.AddMany(leaves)
    want = e.Root()
    lines = [json.loads(l) for l in open(cfg.journal_path)][:2]  # "crash"

    e2 = TpuSha256D(name="j2", config=EngineConfig(slice_log2=6, backend="xla"))
    e2.PreloadSliceRoots([bytes.fromhex(l["root"]) for l in lines])
    e2.AddMany(leaves[128:])
    assert e2.Root() == want


def test_preload_requires_fresh_engine(rng):
    e = TpuSha256D(name="j", config=EngineConfig(slice_log2=6, backend="xla"))
    e.AddMany(random_leaves(rng, 3, maxlen=10))
    with pytest.raises(RuntimeError):
        e.PreloadSliceRoots([bytes(32)])


def test_cli_journal_roundtrip(tmp_path):
    stream = b"".join(bytes([65 + i % 26]) * (1 + i % 50) + b"\n" for i in range(200))
    journal = str(tmp_path / "j.jsonl")
    a = _run_cli(["XLA", "--slice-log2", "6", "--journal", journal], stream)
    assert a.returncode == 0, a.stderr.decode()
    root_a = a.stdout.decode().split("=> ")[1].split(" ")[0]
    assert os.path.exists(journal)

    b = _run_cli(["XLA", "--slice-log2", "6", "--journal", journal], stream)
    assert b.returncode == 0, b.stderr.decode()
    root_b = b.stdout.decode().split("=> ")[1].split(" ")[0]
    assert "Resuming from journal: 3 slice(s)" in b.stderr.decode()
    assert root_a == root_b

    # A journal that covers the ENTIRE stream must still print the root on
    # rerun (count used to exclude skipped leaves, so nothing printed).
    full = b"".join(bytes([65 + i % 26]) * 5 + b"\n" for i in range(128))
    j2 = str(tmp_path / "full.jsonl")
    d = _run_cli(["XLA", "--slice-log2", "6", "--journal", j2], full)
    root_d = d.stdout.decode().split("=> ")[1].split(" ")[0]
    e = _run_cli(["XLA", "--slice-log2", "6", "--journal", j2], full)
    assert e.returncode == 0, e.stderr.decode()
    assert "Resuming from journal: 2 slice(s)" in e.stderr.decode()
    assert f"(of 128 item(s), 640 byte(s)) => {root_d}" in e.stdout.decode()

    # Corrupt slice sizes are rejected cleanly.
    j3 = tmp_path / "bad.jsonl"
    j3.write_text('{"slice": 0, "leaves": 96, "root": "' + "00" * 32 + '"}\n')
    f = _run_cli(["XLA", "--slice-log2", "6", "--journal", str(j3)], full)
    assert f.returncode == 1 and b"not a power of two" in f.stderr

    # Resuming with a mismatched --slice-log2 must honor the journal's own
    # slice height (silently changing tree shape would change the root).
    c = _run_cli(["XLA", "--slice-log2", "8", "--journal", journal], stream)
    assert c.returncode == 0, c.stderr.decode()
    assert "slice_log2=6; resuming with that" in c.stderr.decode()
    assert c.stdout.decode().split("=> ")[1].split(" ")[0] == root_a


def test_proof_after_resume_guard(rng, tmp_path):
    """Proof() for a journal-adopted slice must refuse loudly; proofs for
    slices computed in this process must still verify (ADVICE r1 #1)."""
    leaves = random_leaves(rng, 200, maxlen=40)
    cfg = _cfg(tmp_path)
    e = TpuSha256D(name="jp", config=cfg)
    e.AddMany(leaves)
    want = e.Root()

    roots = [bytes.fromhex(json.loads(l)["root"]) for l in open(cfg.journal_path)]
    e2 = TpuSha256D(
        name="jp2", config=EngineConfig(slice_log2=6, backend="xla", keep_digests=True)
    )
    e2.PreloadSliceRoots(roots)
    e2.AddMany(leaves[len(roots) * 64 :])
    assert e2.Root() == want

    # A leaf inside a journaled slice: only the root is known -> refuse.
    with pytest.raises(RuntimeError, match="resumed from a journal"):
        e2.Proof(10)
    # A leaf in a slice computed by this process: full path, verifies.
    idx = len(roots) * 64 + 3
    path = e2.Proof(idx)
    assert oracle.verify_proof(oracle.leaf_hash(leaves[idx]), path).hex() == want


def test_proof_across_resume_with_digest_sidecar(rng, tmp_path):
    """keep_digests + journaling persists per-slice digest sidecars;
    resuming with them restores Proof() for the journaled prefix
    (VERDICT r4 next-round #7): journal, resume, prove a pre-resume leaf,
    verify against the stream root."""
    from vk_merkle_roots_tpu.models.tpu import load_digest_sidecars

    leaves = random_leaves(rng, 200, maxlen=40)
    cfg = _cfg(tmp_path, keep_digests=True)
    e = TpuSha256D(name="js", config=cfg)
    e.AddMany(leaves)
    want = e.Root()
    assert want == oracle.merkle_root(leaves).hex()

    roots = [bytes.fromhex(json.loads(l)["root"]) for l in open(cfg.journal_path)]
    assert len(roots) == 3
    digests = load_digest_sidecars(cfg.journal_path, roots, 64)
    assert digests is not None and len(digests) == 3

    e2 = TpuSha256D(
        name="js2", config=EngineConfig(slice_log2=6, backend="xla", keep_digests=True)
    )
    e2.PreloadSliceRoots(roots, digests=digests)
    e2.AddMany(leaves[192:])
    assert e2.Root() == want
    # Leaves from every region: journaled slices 0-2 AND the live tail.
    for idx in (0, 10, 63, 64, 150, 193, 199):
        path = e2.Proof(idx)
        assert oracle.verify_proof(oracle.leaf_hash(leaves[idx]), path).hex() == want


def test_digest_sidecar_corruption_refuses(rng, tmp_path):
    """A sidecar that no longer reduces to its journaled root must raise,
    never silently mis-prove."""
    from vk_merkle_roots_tpu.models.tpu import load_digest_sidecars

    leaves = random_leaves(rng, 100, maxlen=30)
    cfg = _cfg(tmp_path, keep_digests=True)
    e = TpuSha256D(name="jc", config=cfg)
    e.AddMany(leaves)
    e.Root()
    roots = [bytes.fromhex(json.loads(l)["root"]) for l in open(cfg.journal_path)]
    side = f"{cfg.journal_path}.digests.0.npy"
    d = np.load(side)
    d[3, 0] ^= 1
    np.save(side, d)
    with pytest.raises(ValueError, match="stale or corrupted"):
        load_digest_sidecars(cfg.journal_path, roots, 64)


def test_digest_sidecar_missing_degrades_to_root_only(rng, tmp_path):
    """Missing sidecar files (e.g. a pre-round-5 journal) return None and
    the resume proceeds root-only with the loud Proof refusal."""
    from vk_merkle_roots_tpu.models.tpu import load_digest_sidecars

    leaves = random_leaves(rng, 100, maxlen=30)
    cfg = _cfg(tmp_path, keep_digests=True)
    e = TpuSha256D(name="jm", config=cfg)
    e.AddMany(leaves)
    e.Root()
    roots = [bytes.fromhex(json.loads(l)["root"]) for l in open(cfg.journal_path)]
    os.unlink(f"{cfg.journal_path}.digests.0.npy")
    assert load_digest_sidecars(cfg.journal_path, roots, 64) is None


def test_journal_records_integrity_fields(rng, tmp_path):
    """Journal records carry the cumulative byte count and running stream
    SHA-256 so resume can detect a different/perturbed input."""
    leaves = random_leaves(rng, 200, maxlen=40)
    cfg = _cfg(tmp_path)
    e = TpuSha256D(name="ji", config=cfg)
    e.AddMany(leaves)
    e.Root()
    recs = [json.loads(l) for l in open(cfg.journal_path)]
    assert len(recs) == 3
    cum = 0
    for i, r in enumerate(recs):
        cum += sum(len(x) for x in leaves[i * 64 : (i + 1) * 64])
        assert r["bytes"] == cum
        assert len(r["sha256"]) == 64


def test_resume_against_perturbed_stream_refuses(tmp_path):
    """VERDICT r1 weak #5: resuming against a different stream must fail
    loudly with a diagnostic, not print a wrong root."""
    from tests.test_cli import _run_cli

    stream = b"".join(bytes([65 + i % 26]) * (1 + i % 50) + b"\n" for i in range(200))
    journal = str(tmp_path / "j.jsonl")
    a = _run_cli(["XLA", "--slice-log2", "6", "--journal", journal], stream)
    assert a.returncode == 0, a.stderr.decode()

    # Perturb one byte inside the journaled prefix (first 64 leaves).
    bad = bytearray(stream)
    bad[10] = bad[10] ^ 1 if bad[10] != 0x0A else bad[10]
    b = _run_cli(["XLA", "--slice-log2", "6", "--journal", journal], bytes(bad))
    assert b.returncode == 1
    assert b"journal/stream mismatch" in b.stderr
    assert b"=>" not in b.stdout  # no root printed

    # Same-length different content is also caught (sha, not just bytes).
    bad2 = bytearray(stream)
    bad2[3] = 90 if bad2[3] != 90 else 89
    c = _run_cli(["XLA", "--slice-log2", "6", "--journal", journal], bytes(bad2))
    assert c.returncode == 1 and b"journal/stream mismatch" in c.stderr

    # The untouched stream still resumes fine.
    d = _run_cli(["XLA", "--slice-log2", "6", "--journal", journal], stream)
    assert d.returncode == 0, d.stderr.decode()


def test_resume_against_truncated_stream_refuses(tmp_path):
    """A re-fed stream that ends before covering the journaled prefix is a
    different input: the CLI must refuse, not print the journaled root
    with a bogus item count (the integrity check never runs when the skip
    loop is starved)."""
    from tests.test_cli import _run_cli

    stream = b"".join(bytes([65 + i % 26]) * (1 + i % 50) + b"\n" for i in range(200))
    journal = str(tmp_path / "j.jsonl")
    a = _run_cli(["XLA", "--slice-log2", "6", "--journal", journal], stream)
    assert a.returncode == 0, a.stderr.decode()

    # Keep only the first 100 lines — fewer than the 192 journaled leaves.
    truncated = b"\n".join(stream.split(b"\n")[:100]) + b"\n"
    b = _run_cli(["XLA", "--slice-log2", "6", "--journal", journal], truncated)
    assert b.returncode == 1
    assert b"journal/stream mismatch" in b.stderr
    assert b"=>" not in b.stdout


def test_overlapping_spans_digest_covers_leaf_bytes(tmp_path):
    """The integrity digest's exotic-span branch must hash each leaf's own
    bytes (a contiguous range over unordered offsets covers the wrong
    bytes or none at all)."""
    import hashlib

    cfg = _cfg(tmp_path, batch_leaves=4)
    e = TpuSha256D(name="ov", config=cfg)
    data = np.frombuffer(b"ABCDEFGHIJ" * 20, np.uint8)
    offsets = np.array([100, 0], np.int64)  # unordered: triggers the branch
    lengths = np.array([10, 10], np.int64)
    assert e.AddSpans(data, offsets, lengths)
    want = hashlib.sha256(
        data[100:110].tobytes() + data[0:10].tobytes()
    ).hexdigest()
    assert e._stream_sha.hexdigest() == want
    assert e._stream_bytes == 20


def test_cli_proof_across_resume_with_sidecar(tmp_path):
    """End-to-end CLI: --journal --proof persists digest sidecars; the
    resumed run reloads them (verified against the journal roots) and
    emits a valid authentication path for a leaf inside the JOURNALED
    prefix — the cli.py sidecar wiring, not just the engine API."""
    leaves = [bytes([65 + i % 26]) * (1 + i % 40) for i in range(200)]
    stream = b"".join(x + b"\n" for x in leaves)
    prefix = b"".join(x + b"\n" for x in leaves[:96])  # ends mid-slice 2
    journal = str(tmp_path / "j.jsonl")

    a = _run_cli(["XLA", "--slice-log2", "6", "--journal", journal, "--proof", "5"],
                 prefix)
    assert a.returncode == 0, a.stderr.decode()
    assert os.path.exists(journal + ".digests.0.npy")

    # Resume over the FULL stream, prove leaf 10 (inside journaled slice 0).
    b = _run_cli(["XLA", "--slice-log2", "6", "--journal", journal, "--proof", "10"],
                 stream)
    assert b.returncode == 0, b.stderr.decode()
    err = b.stderr.decode()
    assert "Resuming from journal: 1 slice(s)" in err
    out = b.stdout.decode()
    root = out.split("=> ")[1].split(" ")[0]
    assert root == oracle.merkle_root(leaves).hex()
    proof = json.loads(out.strip().splitlines()[-1])
    assert proof["leaf_index"] == 10 and proof["root"] == root
    path = [(bytes.fromhex(p["sibling"]), p["side"]) for p in proof["path"]]
    assert oracle.verify_proof(oracle.leaf_hash(leaves[10]), path).hex() == root

    # A corrupted sidecar must refuse the resume, not mis-prove.
    d = np.load(journal + ".digests.0.npy")
    d[0, 0] ^= 1
    np.save(journal + ".digests.0.npy", d)
    c = _run_cli(["XLA", "--slice-log2", "6", "--journal", journal, "--proof", "10"],
                 stream)
    assert c.returncode == 1 and b"stale or corrupted" in c.stderr
