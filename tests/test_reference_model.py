"""Tests for the executable NumPy specification (lzs_tpu.reference).

Mirrors the reference test strategy (SURVEY.md section 4):
  * golden-vector conformance (test-lzs-decompression.c:34-96)
  * closed-form property tests (test-lzs.c:93-167)
  * round-trips on varied data
  * cross-validation against the reference C library when buildable
"""

import random

import pytest

from lzs_tpu import reference as ref
from lzs_tpu import spec

from golden import (GOLDEN_COMPRESSED, GOLDEN_PLAINTEXT,
                    repeated_byte_expected_size, uncompressible_sequence)


def test_golden_decode():
    assert ref.lzs_decompress(GOLDEN_COMPRESSED) == GOLDEN_PLAINTEXT


def test_golden_encode():
    # The reference C encoder reproduces this exact stream; ours must too.
    assert ref.lzs_compress(GOLDEN_PLAINTEXT) == GOLDEN_COMPRESSED


@pytest.mark.parametrize("n", list(range(0, 64)) + [100, 255, 506])
def test_uncompressible_prefixes(n):
    # No repeated 2-grams => literals only => exact size (test-lzs.c:93-119)
    data = uncompressible_sequence()[:n]
    comp = ref.lzs_compress(data)
    assert len(comp) == (n * 9 + spec.END_MARKER_BITS + 7) // 8
    assert ref.lzs_decompress(comp) == data


@pytest.mark.parametrize("n", list(range(0, 40)) + [100, 128, 500, 1000])
def test_repeated_byte_sizes(n):
    data = b"X" * n
    comp = ref.lzs_compress(data)
    assert len(comp) == repeated_byte_expected_size(n)
    assert ref.lzs_decompress(comp) == data


def test_roundtrip_random_mixtures():
    rng = random.Random(42)
    for trial in range(8):
        parts = []
        for _ in range(rng.randrange(1, 30)):
            kind = rng.randrange(3)
            if kind == 0:
                parts.append(bytes(rng.randrange(256)
                                   for _ in range(rng.randrange(1, 60))))
            elif kind == 1:
                parts.append(bytes([rng.randrange(256)])
                             * rng.randrange(1, 80))
            else:
                parts.append(b"the quick brown fox " * rng.randrange(1, 5))
        data = b"".join(parts)
        assert ref.lzs_decompress(ref.lzs_compress(data)) == data


def test_long_range_matches_cross_window():
    # Matches at the maximum 2047-byte offset, and beyond (no match allowed).
    base = bytes(range(256)) * 8  # 2048 bytes
    data = base[:100] + bytes(2047 - 100) + base[:100]
    comp = ref.lzs_compress(data)
    assert ref.lzs_decompress(comp) == data


def test_zero_fill_on_corrupt_offset():
    # Token referencing before start of history must emit zeros
    # (lzs-decompression.c:348-357).
    w = ref.BitWriter()
    w.put(1, 1); w.put(1, 1); w.put(5, 7)   # match offset 5 ...
    w.put(0b01, 2)                          # ... length 3, at output pos 0
    w.put(spec.END_MARKER_VALUE, spec.END_MARKER_BITS)
    w.pad_to_byte()
    assert ref.lzs_decompress(w.getvalue()) == b"\x00\x00\x00"


def test_multi_stream_concatenation():
    # Incremental decoder semantics: continue across end markers
    # (lzs-decompression.c:559-576).
    a, b = b"hello hello hello", b"world world world"
    stream = ref.lzs_compress(a) + ref.lzs_compress(b)
    assert ref.lzs_decompress(stream, stop_at_end=False) == a + b
    # single-call mode stops at the first end marker
    assert ref.lzs_decompress(stream, stop_at_end=True) == a


def test_compressed_max_bound():
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(4096))
    comp = ref.lzs_compress(data)
    assert len(comp) <= spec.compressed_max(len(data))


@pytest.mark.parametrize("name,data", [
    ("text", (GOLDEN_PLAINTEXT * 10)[:4000]),
    ("repeats", b"ab" * 1000 + b"xyz" * 300),
    ("binary", bytes((i * 7 + (i >> 3)) % 256 for i in range(3000))),
])
def test_cross_reference_c(ref_driver, name, data):
    # Our model encoder must be byte-identical to the reference C encoders,
    # and our decoder must invert the reference encoder.
    c_stream = ref_driver("c", data)
    assert ref.lzs_compress(data) == c_stream
    assert ref.lzs_decompress(c_stream) == data
    # reference decoder must invert our encoder
    assert ref_driver("d", ref.lzs_compress(data)) == data
