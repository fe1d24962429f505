"""Multi-block batch codec API (one chip) and container framing.

Independent fixed-size blocks are the framework's unit of data parallelism
(SURVEY.md section 2.4): each block is a self-terminating LZS stream (with
its own end marker), so the raw concatenation of block streams is itself a
valid stream chain — decodable by the reference incremental decoder, which
crosses end markers (lzs-decompression.c:559-576).

Two output formats:

  raw        pure concatenated LZS streams. Reference-CLI compatible; decode
             in parallel only if block lengths are known out-of-band.
  container  a small header carrying block size + per-block compressed
             lengths, enabling embarrassingly parallel decode. Payload is
             the same raw concatenation.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import spec
from .ops import decode as dec_ops
from .ops import encode as enc_ops

MAGIC = b"LZST"
VERSION = 1
DEFAULT_BLOCK = 1 << 16


def pad_blocks(data: bytes, block: int) -> tuple[np.ndarray, np.ndarray]:
    """Split data into a (B, block) uint8 array plus per-block lengths."""
    n = len(data)
    nblocks = max(1, -(-n // block))
    x = np.zeros((nblocks, block), np.uint8)
    lens = np.zeros(nblocks, np.int32)
    flat = np.frombuffer(data, np.uint8)
    for b in range(nblocks):
        piece = flat[b * block:(b + 1) * block]
        x[b, :len(piece)] = piece
        lens[b] = len(piece)
    return x, lens


def concat_streams(comp: jnp.ndarray, lens: jnp.ndarray) -> tuple[
        jnp.ndarray, jnp.ndarray]:
    """Device-side ragged concatenation of per-block streams.

    comp: uint8[B, C]; lens: int32[B]. Returns (flat uint8[B*C], total).
    Bytes past each block's length are dropped via prefix-sum scatter.
    """
    nb, cap = comp.shape
    offs = jnp.cumsum(lens) - lens
    total = offs[-1] + lens[-1]
    j = jnp.arange(cap, dtype=jnp.int32)[None, :]
    idx = jnp.where(j < lens[:, None], offs[:, None] + j, nb * cap)
    flat = jnp.zeros(nb * cap, jnp.uint8).at[idx].set(comp, mode="drop")
    return flat, total


@dataclasses.dataclass
class BlockCodec:
    """Batch codec over fixed-size blocks with cached jitted kernels."""
    block: int = DEFAULT_BLOCK
    chunk: int = 256

    def __post_init__(self):
        self.cap = enc_ops.cap_bytes(self.block)
        self._enc = enc_ops.make_encoder(self.block, chunk=self.chunk)
        self._dec = dec_ops.make_decoder(self.cap, self.block)

    # -- device-level primitives (fixed batch shape) --
    def encode_batch(self, x: jnp.ndarray, n: jnp.ndarray):
        """(uint8[B, block], int32[B]) -> (uint8[B, cap], int32[B])."""
        return self._enc(x, n)

    def decode_batch(self, comp: jnp.ndarray, nbytes: jnp.ndarray):
        """(uint8[B, cap], int32[B]) -> (uint8[B, block], int32[B],
        int32[B] end-marker counts)."""
        return self._dec(comp, nbytes)

    # -- host-level byte APIs --
    def compress(self, data: bytes, container: bool = True) -> bytes:
        x, lens = pad_blocks(data, self.block)
        comp, clens = self.encode_batch(jnp.asarray(x), jnp.asarray(lens))
        flat, total = concat_streams(comp, clens)
        payload = bytes(np.asarray(flat)[:int(total)])
        if not container:
            return payload
        clens_np = np.asarray(clens, np.uint32)
        header = struct.pack("<4sBBHIIQ", MAGIC, VERSION, 0, 0, self.block,
                             len(clens_np), len(data))
        return header + clens_np.tobytes() + payload

    def decompress(self, blob: bytes) -> bytes:
        if blob[:4] != MAGIC:
            raise ValueError("not a container stream; use raw decode")
        magic, ver, _f, _r, block, nblocks, orig = struct.unpack_from(
            "<4sBBHIIQ", blob)
        if ver != VERSION:
            raise ValueError(f"unsupported container version {ver}")
        if block != self.block:
            raise ValueError(
                f"container block size {block} != codec block {self.block}")
        hdr = struct.calcsize("<4sBBHIIQ")
        clens = np.frombuffer(blob, np.uint32, nblocks, hdr).astype(np.int32)
        payload = np.frombuffer(blob, np.uint8,
                                offset=hdr + 4 * nblocks)
        offs = np.concatenate([[0], np.cumsum(clens)])
        comp = np.zeros((nblocks, self.cap), np.uint8)
        for b in range(nblocks):
            comp[b, :clens[b]] = payload[offs[b]:offs[b + 1]]
        out, out_len, _ = self.decode_batch(jnp.asarray(comp),
                                            jnp.asarray(clens))
        out, out_len = np.asarray(out), np.asarray(out_len)
        parts = [out[b, :out_len[b]].tobytes() for b in range(nblocks)]
        result = b"".join(parts)
        if len(result) != orig:
            raise ValueError(
                f"decoded size {len(result)} != recorded {orig}")
        return result
