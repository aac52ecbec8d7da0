"""Generators: glibc-rand parity and stream format (Rndm.cpp:20-71,
Strm.cpp:18-35 equivalents)."""

import io

from vk_merkle_roots_tpu.tools import rndm, strm
from vk_merkle_roots_tpu.tools.rndm import GlibcRand, generate_glibc, generate_numpy


def test_glibc_rand_known_values():
    # Values cross-checked against glibc rand() with the canonical seed.
    r = GlibcRand(1712489279)
    assert [r.rand() for _ in range(5)] == [
        734969000,
        1590814820,
        957302683,
        1702690308,
        704352148,
    ]


def test_glibc_rand_seed_zero_maps_to_one():
    a, b = GlibcRand(0), GlibcRand(1)
    assert [a.rand() for _ in range(4)] == [b.rand() for _ in range(4)]


def test_generate_glibc_stream_shape():
    buf = io.BytesIO()
    total = generate_glibc(42, 100, 50, buf)
    data = buf.getvalue()
    lines = data.split(b"\n")
    assert lines[-1] == b""
    lines = lines[:-1]
    assert len(lines) == 100
    assert total == sum(len(l) for l in lines)
    for line in lines:
        assert 1 <= len(line) <= 49
        assert all(32 <= c <= 125 for c in line)


def test_generate_numpy_stream_shape():
    buf = io.BytesIO()
    total = generate_numpy(7, 500, 127, buf)
    lines = buf.getvalue().split(b"\n")[:-1]
    assert len(lines) == 500
    assert total == sum(len(l) for l in lines)
    assert all(1 <= len(l) <= 126 for l in lines)
    assert all(32 <= c <= 125 for l in lines for c in l)


def test_strm(capsysbinary, monkeypatch):
    import sys

    rc = strm.main(["alpha", "beta"])
    assert rc == 0
    out = capsysbinary.readouterr().out
    assert out == b"alpha\nbeta\n"


def test_verify_rejects_non_json(tmp_path, capsys):
    """vkmr-verify on a file whose last line is not a proof record must print
    one diagnostic and exit 1, not traceback (ADVICE r1 #4)."""
    from vk_merkle_roots_tpu.tools import verify

    p = tmp_path / "not_proof.txt"
    p.write_text("CPU: computed root (of 3 item(s), 9 byte(s)) => abc in 1\n")
    rc = verify.main([str(p), "--leaf-hex", "00"])
    assert rc == 1
    assert "not a proof record" in capsys.readouterr().err

    empty = tmp_path / "empty.txt"
    empty.write_text("")
    assert verify.main([str(empty), "--leaf-hex", "00"]) == 1


def test_rndm_rejects_maxlen_below_two(capsys):
    from vk_merkle_roots_tpu.tools.rndm import main

    assert main(["7", "5", "1"]) == 1
    assert "max string length" in capsys.readouterr().err
