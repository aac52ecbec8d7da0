"""Streaming reader: chunk-boundary line splitting (Inputs.cpp:75-101
semantics at block granularity)."""

import io

import numpy as np

from vk_merkle_roots_tpu.ingest import iter_line_spans


def _lines(stream_bytes, chunk):
    out = []
    for data, offs, lens in iter_line_spans(io.BytesIO(stream_bytes), chunk_bytes=chunk):
        for o, l in zip(offs, lens):
            out.append(bytes(data[o : o + l].tobytes()))
    return out


def test_lines_split_across_chunk_boundaries():
    stream = b"alpha\nbravo\ncharlie\ndelta\n"
    for chunk in (1, 2, 3, 5, 7, 8, 100):
        assert _lines(stream, chunk) == [b"alpha", b"bravo", b"charlie", b"delta"], chunk


def test_trailing_fragment_without_newline():
    for chunk in (1, 4, 100):
        assert _lines(b"ab\ncd", chunk) == [b"ab", b"cd"]


def test_empty_lines_preserved_for_caller():
    assert _lines(b"\na\n\n", 2) == [b"", b"a", b""]


def test_empty_stream():
    assert _lines(b"", 4) == []


def test_long_line_spanning_many_chunks():
    line = bytes(range(256)) * 40  # 10240 bytes, includes 0x0A bytes? filter them
    line = bytes(b for b in line if b != 0x0A)
    stream = line + b"\n" + b"x\n"
    assert _lines(stream, 512) == [line, b"x"]
