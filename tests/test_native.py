"""Tests for the native C++ runtime (native/lzs_native.cpp via ctypes)."""

import random

import numpy as np
import pytest

from lzs_tpu import reference as ref
from lzs_tpu import spec
from lzs_tpu.utils import native

from golden import GOLDEN_COMPRESSED, GOLDEN_PLAINTEXT, \
    uncompressible_sequence


CASES = [
    b"",
    b"Q",
    b"XX",
    b"XXX",
    GOLDEN_PLAINTEXT,
    uncompressible_sequence(),
    b"A" * 5000,
    b"ab" * 3000,
    (GOLDEN_PLAINTEXT * 30)[:12000],
]


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_compress_matches_oracle(data):
    assert native.compress(data) == ref.lzs_compress(data)


def test_golden():
    assert native.compress(GOLDEN_PLAINTEXT) == GOLDEN_COMPRESSED
    assert native.decompress(GOLDEN_COMPRESSED) == GOLDEN_PLAINTEXT


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_decompress_roundtrip(data):
    assert native.decompress(native.compress(data),
                             out_cap=len(data) + 16) == data


def test_fuzz_vs_oracle():
    rng = random.Random(77)
    for _ in range(12):
        parts = []
        for _ in range(rng.randrange(1, 30)):
            k = rng.randrange(3)
            if k == 0:
                parts.append(bytes(rng.randrange(256)
                                   for _ in range(rng.randrange(1, 80))))
            elif k == 1:
                parts.append(bytes([rng.randrange(256)])
                             * rng.randrange(1, 200))
            else:
                parts.append(b"abcabcabd" * rng.randrange(1, 10))
        data = b"".join(parts)
        assert native.compress(data) == ref.lzs_compress(data)
        assert native.decompress(ref.lzs_compress(data),
                                 out_cap=len(data) + 16) == data


def test_emit_from_match_tables():
    # hybrid stage: score/off tables computed by the oracle's policy
    data = (GOLDEN_PLAINTEXT * 4)[:1500]
    x = np.frombuffer(data, np.int16)
    import lzs_tpu.reference as R
    xa = np.frombuffer(data, np.uint8).astype(np.int16)
    pad = np.concatenate([xa, np.full(spec.SEARCH_MATCH_MAX, -1, np.int16)])
    n = len(data)
    score = np.zeros(n, np.int32)
    off = np.zeros(n, np.int32)
    for i in range(n):
        s, o = R._best_match(xa, i, pad)
        score[i], off[i] = s, o
    assert native.emit(data, score, off) == ref.lzs_compress(data)


def test_stream_encoder_chunked_matches_single_call():
    rng = random.Random(3)
    data = (GOLDEN_PLAINTEXT * 20 + b"Z" * 4000
            + bytes(rng.randrange(256) for _ in range(3000)))
    expect = ref.lzs_compress(data)
    for chunk in (1, 7, 64, 512, 4096):
        enc = native.StreamEncoder()
        out = bytearray()
        for s in range(0, len(data), chunk):
            piece, st = enc.feed(data[s:s + chunk])
            out += piece
        piece, st = enc.feed(b"", finish=True)
        out += piece
        assert st & native.FINISHED
        enc.close()
        assert bytes(out) == expect, f"chunk={chunk}"


def test_stream_encoder_empty_input():
    enc = native.StreamEncoder()
    out, st = enc.feed(b"", finish=True)
    assert out == ref.lzs_compress(b"")
    enc.close()


def test_stream_decoder_chunked():
    data = (GOLDEN_PLAINTEXT * 10) + b"R" * 2000
    stream = ref.lzs_compress(data)
    for chunk in (1, 3, 17, 100, 1000):
        dec = native.StreamDecoder()
        out = bytearray()
        for s in range(0, len(stream), chunk):
            piece, st = dec.feed(stream[s:s + chunk])
            out += piece
        assert bytes(out) == data, f"chunk={chunk}"
        assert dec.markers == 1
        dec.close()


def test_stream_decoder_output_bounded():
    # drain through a tiny output buffer (10 bytes at a time), mirroring
    # the reference's output-bounded harness (test-lzs-decompression.c:236)
    data = b"N" * 500 + GOLDEN_PLAINTEXT[:200]
    stream = ref.lzs_compress(data)
    dec = native.StreamDecoder()
    out = bytearray()
    pos = 0
    for _ in range(10000):
        piece, st = dec.feed(stream[pos:pos + 5], out_cap=10)
        pos = min(pos + 5, len(stream))
        out += piece
        while st & native.OUTPUT_FULL:
            piece, st = dec.feed(b"", out_cap=10)
            out += piece
        if pos >= len(stream) and not piece and (st & native.INPUT_STARVED):
            break
    assert bytes(out) == data


def test_stream_decoder_concatenated_streams():
    a, b = b"first part " * 10, b"second part " * 12
    stream = ref.lzs_compress(a) + ref.lzs_compress(b)
    dec = native.StreamDecoder()
    out, _ = dec.feed(stream, out_cap=4096)
    assert out == a + b
    assert dec.markers == 2
    dec.close()


def test_cross_reference_c(ref_driver):
    data = (GOLDEN_PLAINTEXT + b"#" * 300) * 3
    assert native.compress(data) == ref_driver("c", data)
    assert ref_driver("d", native.compress(data)) == data
