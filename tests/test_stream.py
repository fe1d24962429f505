"""Streaming/incremental API tests (lzs_tpu.stream).

Mirrors the reference's incremental test strategy: chunked-resume at
adversarial boundaries (test-lzs-decompression.c:177-290) and equality of
streamed output with the single-call encoder (the property the reference's
incremental encoder maintains vs lzs_compress).
"""

import numpy as np
import pytest

from lzs_tpu import reference, stream


def mixed_data(seed: int, size: int) -> bytes:
    rng = np.random.default_rng(seed)
    parts = []
    while sum(map(len, parts)) < size:
        k = rng.integers(0, 4)
        if k == 0:
            parts.append(rng.integers(0, 256, rng.integers(1, 400),
                                      dtype=np.uint8).tobytes())
        elif k == 1:
            parts.append(bytes([rng.integers(0, 256)])
                         * rng.integers(1, 800))
        elif k == 2:
            pat = rng.integers(0, 256, rng.integers(2, 80),
                               dtype=np.uint8).tobytes()
            parts.append(pat * rng.integers(2, 40))
        else:
            prev = b"".join(parts)
            parts.append(prev[:rng.integers(0, min(len(prev) + 1, 1500))])
    return b"".join(parts)[:size]


DATA = mixed_data(5, 20000)
ONE_SHOT = reference.lzs_compress(DATA)
SMALL = mixed_data(6, 1500)
SMALL_ONE_SHOT = reference.lzs_compress(SMALL)


@pytest.mark.parametrize("feed", [555, 4096, 50000])
def test_stream_compress_matches_one_shot(feed):
    assert stream.compress_stream(DATA, feed) == ONE_SHOT


@pytest.mark.parametrize("feed", [1, 7, 64])
def test_stream_compress_tiny_feeds(feed):
    assert stream.compress_stream(SMALL, feed) == SMALL_ONE_SHOT


def test_stream_compress_status_protocol():
    c = stream.StreamCompressor()
    assert c.status & stream.INPUT_STARVED
    c.feed(DATA[:100])
    out = c.finish()
    assert c.status & stream.FINISHED
    assert c.status & stream.END_MARKER
    with pytest.raises(ValueError):
        c.feed(b"x")


@pytest.mark.parametrize("feed", [1, 3, 10, 997, 10**9])
def test_stream_decompress_chunked(feed):
    assert stream.decompress_stream(ONE_SHOT, feed) == DATA


@pytest.mark.parametrize("max_out", [1, 10, 333])
def test_stream_decompress_output_bounded(max_out):
    d = stream.StreamDecompressor()
    out = bytearray()
    out += d.feed(ONE_SHOT, max_out=max_out)
    while True:
        piece = d.feed(b"", max_out=max_out)
        if not piece:
            break
        out += piece
    assert bytes(out) == DATA


def test_stream_decompress_concatenated_streams():
    a, b = DATA[:5000], DATA[5000:9000]
    blob = reference.lzs_compress(a) + reference.lzs_compress(b)
    d = stream.StreamDecompressor()
    out = d.feed(blob)
    assert out == a + b
    assert d.markers == 2
    d2 = stream.StreamDecompressor(stop_at_end=True)
    assert d2.feed(blob) == a
    assert d2.status & stream.FINISHED


def test_checkpoint_resume_compressor():
    c = stream.StreamCompressor()
    out = bytearray(c.feed(DATA[:9000]))
    snap = c.state_dict()
    # resumed clone must continue identically
    c2 = stream.StreamCompressor.from_state_dict(snap)
    out2 = bytearray(out)
    out += c.feed(DATA[9000:])
    out += c.finish()
    out2 += c2.feed(DATA[9000:])
    out2 += c2.finish()
    assert bytes(out) == bytes(out2) == ONE_SHOT


def test_checkpoint_resume_decompressor():
    d = stream.StreamDecompressor()
    out = bytearray(d.feed(ONE_SHOT[:1000]))
    d2 = stream.StreamDecompressor.from_state_dict(d.state_dict())
    rest = d.feed(ONE_SHOT[1000:])
    rest2 = d2.feed(ONE_SHOT[1000:])
    assert rest == rest2
    assert bytes(out) + rest == DATA


@pytest.mark.parametrize("cap", [1, 64, 512])
def test_stream_compress_output_bounded_drive_loop(cap):
    """Mirror the reference CLI drive loop (utils/lzs-compress.c:91-134):
    fixed-size output buffer, finish raised after input exhausted, loop
    until the FINISHED status."""
    c = stream.StreamCompressor()
    out = bytearray()
    feeds = [DATA[i:i + 512] for i in range(0, len(DATA), 512)]
    for piece in feeds:
        out += c.feed(piece, max_out=cap)
        while c.status & stream.OUTPUT_FULL:
            out += c.feed(b"", max_out=cap)
    while not (c.status & stream.FINISHED):
        out += c.feed(b"", finish=True, max_out=cap)
    assert bytes(out) == ONE_SHOT
    assert c.status & stream.END_MARKER


def test_stream_compress_error_status():
    c = stream.StreamCompressor(bit_n=99, bit_acc=1 << 62)
    assert c.feed(b"abc") == b""
    assert c.status & stream.ERROR


def test_stream_decompress_error_status():
    d = stream.StreamDecompressor(mode=7)
    assert d.feed(ONE_SHOT) == b""
    assert d.status & stream.ERROR
    d2 = stream.StreamDecompressor(cur_off=9999)
    d2.feed(ONE_SHOT)
    assert d2.status & stream.ERROR


def test_stream_decompress_large_feed_tiny_budget_linear():
    """Unread input must be kept as bytes, not a bignum bit queue
    (round-1 weakness: quadratic requeue)."""
    big = mixed_data(9, 1 << 20)
    comp = reference.lzs_compress(big)
    d = stream.StreamDecompressor()
    first = d.feed(comp, max_out=1)        # queues ~all input internally
    assert len(first) == 1
    assert isinstance(d.in_pending, bytes)
    assert d.bit_n <= 32
    out = bytearray(first)
    while True:
        piece = d.feed(b"", max_out=1 << 16)
        if not piece:
            break
        out += piece
    assert bytes(out) == big


def test_zero_fill_out_of_range_offset():
    # match referencing before stream start must emit zeros
    from lzs_tpu.reference import BitWriter
    w = BitWriter()
    w.put(1, 1)
    w.put(1, 1)
    w.put(5, 7)      # offset 5 with empty history
    w.put(0b00, 2)   # length 2
    w.put(0b110000000, 9)
    w.pad_to_byte()
    d = stream.StreamDecompressor()
    assert d.feed(w.getvalue()) == b"\x00\x00"


def test_cross_reference_c_streamed(ref_driver):
    comp = stream.compress_stream(DATA[:6000], 777)
    assert ref_driver("d", comp) == DATA[:6000]
    c_comp = ref_driver("c", DATA[:6000])
    assert stream.decompress_stream(c_comp, 101) == DATA[:6000]


def test_large_feed_slicing_matches_one_shot():
    # feeds larger than the 32768-position search span must slice internally
    # and still produce one-shot-identical bytes (including matches that
    # stay alive across slice boundaries -> carried extension state)
    rng = np.random.default_rng(11)
    cases = [
        bytes(rng.integers(0, 256, 70000, dtype=np.uint8)),
        b"R" * 70000,                        # one run spanning two slices
        (b"lorem ipsum dolor " * 5000)[:70000],
    ]
    for data in cases:
        one = reference.lzs_compress(data)
        for fs in (70000, 65536, 33000):
            assert stream.compress_stream(data, fs) == one


def test_extension_state_checkpoint_mid_run():
    # checkpoint while a match run is alive at a feed boundary
    data = b"A" * 200 + b"B" * 50000 + b"A" * 200
    one = reference.lzs_compress(data)
    c = stream.StreamCompressor()
    out = c.feed(data[:30000])
    assert c.ext_off or c.pending      # mid-run or holding back
    c2 = stream.StreamCompressor.from_state_dict(c.state_dict())
    out += c2.feed(data[30000:])
    out += c2.finish()
    assert out == one


def test_stream_exhaustive_backend():
    """C5's incremental brute-force variant: StreamCompressor with
    backend="exhaustive" (the ops.match O(N*W) plane — the counterpart
    of lzs_simple_compress_incremental, lzs-compression-simple.c:435-647)
    streams byte-identical output to the sort backend and the one-shot
    reference."""
    sc = stream.StreamCompressor(backend="exhaustive")
    out = bytearray()
    for i in range(0, len(SMALL), 277):
        out += sc.feed(SMALL[i:i + 277])
    out += sc.feed(finish=True)
    assert bytes(out) == SMALL_ONE_SHOT
