"""CLI process contract (Vkmr.cpp:28-97 parity): stream in, summary line
out, usage/empty-line/edge behavior."""

import os
import subprocess
import sys

import pytest

from vk_merkle_roots_tpu import oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, stdin: bytes, extra_env=None):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never dial the TPU tunnel in tests
    env["JAX_PLATFORMS"] = "cpu"
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-m", "vk_merkle_roots_tpu.cli", *args],
        input=stdin,
        capture_output=True,
        env=env,
        cwd=REPO,
        timeout=300,
    )


def test_cpu_engine_root():
    r = _run_cli(["CPU"], b"alpha\nbeta\ngamma\n")
    assert r.returncode == 0
    want = oracle.merkle_root([b"alpha", b"beta", b"gamma"]).hex()
    out = r.stdout.decode()
    assert f"=> {want} in" in out
    assert "computed root (of 3 item(s), 14 byte(s))" in out


def test_device_engine_matches_cpu():
    stream = b"".join(bytes([65 + i % 26]) * (1 + i % 90) + b"\n" for i in range(200))
    a = _run_cli(["CPU"], stream)
    b = _run_cli(["XLA", "--slice-log2", "6"], stream)
    assert a.returncode == 0 and b.returncode == 0
    root_a = a.stdout.decode().split("=> ")[1].split(" ")[0]
    root_b = b.stdout.decode().split("=> ")[1].split(" ")[0]
    assert root_a == root_b


def test_empty_lines_warned_and_skipped():
    r = _run_cli(["CPU"], b"a\n\nb\n")
    assert r.returncode == 0
    assert r.stderr.decode().count("Read an empty string?") == 1
    want = oracle.merkle_root([b"a", b"b"]).hex()
    assert want in r.stdout.decode()


def test_no_args_prints_usage_and_available():
    r = _run_cli([], b"")
    assert r.returncode == 1
    err = r.stderr.decode()
    assert "Usage:" in err and "* CPU" in err and "* XLA" in err


def test_unknown_device_aborts():
    r = _run_cli(["NoSuchDevice"], b"a\n")
    assert r.returncode == 1
    assert "No device selected; aborting." in r.stderr.decode()


def test_empty_stream_prints_nothing():
    r = _run_cli(["CPU"], b"")
    assert r.returncode == 0
    assert "computed root" not in r.stdout.decode()


def test_trailing_fragment_is_a_line():
    r = _run_cli(["CPU"], b"a\nb")  # no trailing newline
    want = oracle.merkle_root([b"a", b"b"]).hex()
    assert want in r.stdout.decode()


def test_input_file_matches_stdin(tmp_path):
    stream = b"".join(bytes([97 + i % 26]) * (1 + i % 50) + b"\n" for i in range(100))
    path = tmp_path / "stream.txt"
    path.write_bytes(stream)
    a = _run_cli(["CPU"], stream)
    b = _run_cli(["CPU", "--input", str(path)], b"")
    assert a.returncode == 0 and b.returncode == 0
    root_a = a.stdout.decode().split("=> ")[1].split(" ")[0]
    root_b = b.stdout.decode().split("=> ")[1].split(" ")[0]
    assert root_a == root_b


def test_auto_slice_runs():
    r = _run_cli(["XLA", "--auto-slice"], b"a\nbb\nccc\n")
    assert r.returncode == 0
    want = oracle.merkle_root([b"a", b"bb", b"ccc"]).hex()
    assert want in r.stdout.decode()


def test_auto_slice_log2_math(monkeypatch):
    import jax

    from vk_merkle_roots_tpu.config import auto_slice_log2

    class FakeDev:
        def __init__(self, limit):
            self._limit = limit

        def memory_stats(self):
            return {"bytes_limit": self._limit}

    # 16 GB HBM at 1/8 budget -> 2 GB / 32 B = 2^26 digests.
    monkeypatch.setattr(jax, "devices", lambda: [FakeDev(16 << 30)])
    assert auto_slice_log2() == 26
    # No stats -> default.
    monkeypatch.setattr(jax, "devices", lambda: [FakeDev(0)])
    assert auto_slice_log2() == 20
    # Huge budget is capped.
    monkeypatch.setattr(jax, "devices", lambda: [FakeDev(1 << 50)])
    assert auto_slice_log2() == 26


def test_sharded_flag_requires_mesh_engine():
    """--sharded is only consulted by the MESH engine; any other engine
    must refuse instead of silently running single-device reductions."""
    r = _run_cli(["XLA", "--sharded"], b"a\nb\n")
    assert r.returncode == 1
    assert b"--sharded requires the MESH engine" in r.stderr
    r2 = _run_cli(["MESH", "--sharded", "--slice-log2", "13"], b"a\nb\nc\n")
    assert r2.returncode == 0, r2.stderr.decode()


def test_auto_host_pending_bytes_discovery():
    """The staging budget is DISCOVERED from /proc/meminfo (MaxBatchCount
    analog, Batches.cpp:294-331), clamped to [64 MB, cap]."""
    from vk_merkle_roots_tpu.config import auto_host_pending_bytes

    b = auto_host_pending_bytes()
    assert (64 << 20) <= b <= (1 << 30)
    # Fraction scales the answer (same MemAvailable read).
    half = auto_host_pending_bytes(max_fraction=0.125)
    assert half <= b
