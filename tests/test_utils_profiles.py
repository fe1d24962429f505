"""Observability utilities and codec profiles."""

import io

from lzs_tpu import reference
from lzs_tpu.models import PROFILES, get_profile
from lzs_tpu.utils import debug


DATA = (b"observability " * 300)[:3000]
BLOB = reference.lzs_compress(DATA)


def test_dump_tokens():
    buf = io.StringIO()
    n = debug.dump_tokens(BLOB, out=buf)
    text = buf.getvalue()
    assert n > 0
    assert "end marker" in text
    assert "match offset=" in text


def test_stream_stats():
    s = debug.stream_stats(BLOB)
    assert s.out_bytes == len(DATA)
    assert s.comp_bytes == len(BLOB)
    assert s.markers == 1
    assert s.matches > 0
    assert 0 < s.ratio < 1


def test_meter():
    m = debug.Meter()
    m.record_encode(1000, 300, 0.001)
    m.record_decode(1000, 0.0005)
    r = m.report()
    assert r["ratio"] == 0.3
    assert r["encode_GBps"] > 0


def test_profiles_roundtrip():
    for name in PROFILES:
        codec = get_profile(name)
        blob = codec.compress_bytes(DATA[:1200])
        assert codec.decompress_bytes(blob) == DATA[:1200], name


def test_standard_profile_is_wire_exact():
    assert get_profile("standard").compress_bytes(DATA) == BLOB
