"""Sync-metadata encode/decode (ops.encode_block_sync + ops.decode2).

The container fast path must reproduce exactly the bytes of the reference
model for any input, with span boundaries landing at arbitrary parse points
(including mid-stream extended-length chains owned by a single lane).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lzs_tpu.ops import decode2, encode as enc
from lzs_tpu import reference


def roundtrip(data: bytes, block: int, span: int) -> bytes:
    n = len(data)
    x = np.zeros(block, np.uint8)
    x[:n] = np.frombuffer(data, np.uint8)
    comp, nbytes, sbit, sout, nsync = enc.encode_block_sync(
        jnp.asarray(x), jnp.int32(n), span=span)
    out = decode2.decode_block_sync(comp, sbit, sout, jnp.int32(n),
                                    out_cap=block, span=span)
    return bytes(np.asarray(out)[:n])


CASES = {
    "text": (__doc__ * 40).encode()[:4096],
    "rle_long": b"Q" * 4000,
    "rle_then_text": b"Z" * 2500 + b"the quick brown fox " * 60,
    "alternating": b"ab" * 2000,
    "single": b"x",
    "empty": b"",
    "incompressible": np.random.default_rng(3).integers(
        0, 256, 4096, dtype=np.uint8).tobytes(),
    "periodic_far": np.tile(np.random.default_rng(4).integers(
        0, 256, 333, dtype=np.uint8), 12).tobytes(),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("span", [128, 2048])
def test_sync_roundtrip(name, span):
    data = CASES[name][:4096]
    assert roundtrip(data, 4096, span) == data


@pytest.mark.parametrize("span", [128, 1024])
def test_sync_stream_matches_reference_model(span):
    data = (b"sync points must not change the payload " * 100)[:4096]
    x = np.zeros(4096, np.uint8)
    x[:len(data)] = np.frombuffer(data, np.uint8)
    comp, nbytes, _, _, _ = enc.encode_block_sync(
        jnp.asarray(x), jnp.int32(len(data)), span=span)
    got = bytes(np.asarray(comp)[:int(nbytes)])
    want = reference.lzs_compress(data)
    assert got == want


def test_sync_mixed_batch_fuzz():
    rng = np.random.default_rng(11)
    for _ in range(6):
        parts = []
        for _ in range(12):
            k = rng.integers(0, 4)
            if k == 0:
                parts.append(rng.integers(0, 256, rng.integers(1, 300),
                                          dtype=np.uint8).tobytes())
            elif k == 1:
                parts.append(bytes([rng.integers(0, 256)])
                             * rng.integers(1, 600))
            elif k == 2:
                pat = rng.integers(0, 256, rng.integers(2, 60),
                                   dtype=np.uint8).tobytes()
                parts.append(pat * rng.integers(2, 30))
            else:
                prev = b"".join(parts)
                parts.append(prev[:rng.integers(0, min(len(prev) + 1, 800))])
        data = b"".join(parts)[:4096]
        assert roundtrip(data, 4096, 160) == data


def test_deep_copy_chain_in_chunk():
    """Adversarial expansion-chain depth: L0 A B L1 A B L2 A B ... makes
    greedy emit a 2-byte copy every 3 bytes, each copy sourcing inside
    the PREVIOUS copy token — ~85 chained hops inside one 256-byte
    expansion chunk. Pins the doubling reach of decode2's chunk scan
    (chunk/2 copy tokens can chain; 6 rounds = 64 hops was too few)."""
    lits = [c for c in range(256) if c not in (65, 66)]
    parts = []
    for k in range(1300):
        parts.append(bytes([lits[k % len(lits)], 65, 66]))
    data = b"".join(parts)[:3900]
    assert roundtrip(data, 4096, 2048) == data


def test_deep_copy_chain_matches_reference():
    lits = [c for c in range(256) if c not in (65, 66)]
    data = b"".join(bytes([lits[k % len(lits)], 65, 66])
                    for k in range(400))[:1200]
    x = np.zeros(2048, np.uint8)
    x[:len(data)] = np.frombuffer(data, np.uint8)
    comp, nbytes, _, _, _ = enc.encode_block_sync(
        jnp.asarray(x), jnp.int32(len(data)))
    got = bytes(np.asarray(comp)[:int(nbytes)])
    assert got == reference.lzs_compress(data)
