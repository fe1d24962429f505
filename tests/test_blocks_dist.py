"""Tests for the multi-block batch API (blocks.py) and the device-mesh
distributed codec (parallel/dist.py) on a virtual 8-device CPU mesh."""

import random

import numpy as np
import pytest

import jax

from lzs_tpu import reference as ref
from lzs_tpu.blocks import BlockCodec, pad_blocks
from lzs_tpu.parallel import DistributedCodec, make_block_mesh

from golden import GOLDEN_PLAINTEXT


def make_corpus(size: int, seed: int = 5) -> bytes:
    rng = random.Random(seed)
    parts = []
    while sum(map(len, parts)) < size:
        k = rng.randrange(3)
        if k == 0:
            parts.append(GOLDEN_PLAINTEXT)
        elif k == 1:
            parts.append(bytes([rng.randrange(256)]) * rng.randrange(1, 300))
        else:
            parts.append(bytes(rng.randrange(256)
                               for _ in range(rng.randrange(1, 200))))
    return b"".join(parts)[:size]


@pytest.fixture(scope="module")
def codec():
    return BlockCodec(block=2048)


def test_container_roundtrip(codec):
    data = make_corpus(11000)
    blob = codec.compress(data)
    assert codec.decompress(blob) == data


def test_container_exact_multiple(codec):
    data = make_corpus(4096)
    assert codec.decompress(codec.compress(data)) == data


def test_empty_input(codec):
    assert codec.decompress(codec.compress(b"")) == b""


def test_raw_mode_blocks_match_oracle(codec):
    # raw output must equal the concatenation of per-block oracle streams —
    # and therefore be decodable by the reference incremental decoder.
    data = make_corpus(6000)
    raw = codec.compress(data, container=False)
    expect = b"".join(ref.lzs_compress(data[s:s + 2048])
                      for s in range(0, len(data), 2048))
    assert raw == expect
    assert ref.lzs_decompress(raw, stop_at_end=False) == data


def test_raw_mode_cross_reference(codec, ref_driver):
    data = make_corpus(5000)
    raw = codec.compress(data, container=False)
    # the reference's streaming decoder continues across end markers
    assert ref_driver("d", raw)  # single-call stops at first marker
    assert ref_driver("d", raw) == data[:2048]


@pytest.fixture(scope="module")
def dist_codec():
    mesh = make_block_mesh()
    return DistributedCodec(mesh, block=1024)


def test_mesh_has_8_devices(dist_codec):
    assert dist_codec.ndev == 8


def _out_lens(data: bytes, block: int):
    n = len(data)
    nb = max(1, -(-n // block))
    return [min(block, n - b * block) for b in range(nb)]


def test_distributed_matches_single_chip(dist_codec):
    data = make_corpus(20000, seed=9)
    payload, clens, sbit, sout, nsync = dist_codec.compress(data)
    # sharded output must equal single-device blocked output exactly
    expect = b"".join(ref.lzs_compress(data[s:s + 1024])
                      for s in range(0, len(data), 1024))
    assert payload == expect
    assert dist_codec.decompress(payload, clens, sbit, sout,
                                 _out_lens(data, 1024)) == data


def test_distributed_uneven_blocks(dist_codec):
    # block count not a multiple of the mesh size
    data = make_corpus(1024 * 3 + 17, seed=11)
    payload, clens, sbit, sout, nsync = dist_codec.compress(data)
    assert len(clens) == 4
    assert dist_codec.decompress(payload, clens, sbit, sout,
                                 _out_lens(data, 1024)) == data


def test_container_fuzz_rejects_malformed(codec):
    """Truncated/corrupted containers must raise clean ValueErrors (or
    still decode when the mutation is semantically harmless) — never
    index errors or crashes (framing-layer extension of the reference's
    corrupt-input hygiene, lzs-decompression.c:348-357)."""
    data = make_corpus(9000, seed=13)
    blob = codec.compress(data)
    rng = random.Random(99)
    # systematic truncations at every section boundary plus random cuts
    cuts = [0, 3, 4, 12, 23, len(blob) // 2, len(blob) - 1]
    cuts += [rng.randrange(len(blob)) for _ in range(20)]
    for cut in cuts:
        try:
            out = codec.decompress(blob[:cut])
            assert out == data  # only acceptable non-raise: full data
        except ValueError:
            pass
    # random single-byte corruptions across the header + index sections
    hdr_span = min(len(blob), 24 + 12 * 5 + 40)
    for _ in range(40):
        pos = rng.randrange(hdr_span)
        mut = bytearray(blob)
        mut[pos] ^= 1 << rng.randrange(8)
        try:
            out = codec.decompress(bytes(mut))
            assert isinstance(out, bytes)  # garbage ok, crash not
        except ValueError:
            pass


def test_container_corruption_is_flagged(codec):
    """Payload and sync-record corruption must be FLAGGED (ValueError
    from the adler32 checksum, the per-lane parse-boundary check, or the
    per-block expansion status word), or decode to the exact original
    when the mutation is semantically harmless — never silent garbage.
    This is the container-level analogue of the reference's status-flag
    discipline (LzsDecompressStatus_t, lzs.h:170-178)."""
    data = make_corpus(9000, seed=21)
    blob = codec.compress(data)
    rng = random.Random(7)
    hdr_end = 24 + 4 * 3 * 1 + 8 * 10   # header + index-ish region
    for _ in range(60):
        pos = rng.randrange(28, len(blob))
        mut = bytearray(blob)
        mut[pos] ^= 1 << rng.randrange(8)
        try:
            out = codec.decompress(bytes(mut))
        except ValueError:
            continue
        assert out == data, (
            f"silent corruption at byte {pos} (region "
            f"{'index' if pos < hdr_end else 'payload'})")


def test_container_wrong_magic_and_version(codec):
    data = make_corpus(3000, seed=14)
    blob = codec.compress(data)
    with pytest.raises(ValueError):
        codec.decompress(b"XXXX" + blob[4:])
    with pytest.raises(ValueError):
        codec.decompress(blob[:4] + bytes([99]) + blob[5:])
    with pytest.raises(ValueError):
        codec.decompress(b"")


def test_lazy_policy_container_roundtrip():
    """BlockCodec(policy="lazy"): container flags byte records the policy,
    output round-trips, and the lazy stream is never larger than greedy
    on this corpus (the 1-token-lookahead refinement of the C greedy
    policy, lzs-compression.c:326-362)."""
    data = make_corpus(9000, seed=9)
    lazy = BlockCodec(block=2048, policy="lazy")
    greedy = BlockCodec(block=2048)
    blob = lazy.compress(data)
    from lzs_tpu.blocks import FLAG_LAZY
    assert blob[5] & FLAG_LAZY
    assert not greedy.compress(data)[5] & FLAG_LAZY
    assert lazy.decompress(blob) == data
    # greedy codec object decodes a lazy container too (decode is
    # policy-free; the flag is provenance metadata)
    assert greedy.decompress(blob) == data
    raw_l = lazy.compress(data, container=False)
    raw_g = greedy.compress(data, container=False)
    assert len(raw_l) <= len(raw_g)
    # lazy raw streams stay reference-decodable LZS (the incremental
    # decoder semantics cross block end markers)
    assert ref.lzs_decompress(raw_l, stop_at_end=False) == data


def test_cli_lazy_flag(tmp_path):
    from lzs_tpu import cli

    data = make_corpus(6000, seed=11)
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    outc = tmp_path / "out.lzst"
    assert cli.main(["compress", "--container", "--lazy",
                     "--block", "2048", str(src), str(outc)]) == 0
    blob = outc.read_bytes()
    from lzs_tpu.blocks import FLAG_LAZY
    assert blob[5] & FLAG_LAZY
    dec = tmp_path / "dec.bin"
    assert cli.main(["decompress", str(outc), str(dec)]) == 0
    assert dec.read_bytes() == data
