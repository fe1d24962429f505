"""Pod-slice scaling: block data parallelism over a device mesh.

The reference is single-threaded; this module is the distributed-systems
layer the TPU framework adds (SURVEY.md section 2.4). Design:

  * independent blocks are sharded over a 1-D mesh axis ("blocks")
  * each device runs the full encode/decode pipeline on its local shard
  * per-block compressed lengths and padded payloads are exchanged with an
    ordered all_gather so the host reassembles streams in original block
    order (BASELINE.json configs 3 and 5)

Collectives ride XLA (ICI within a slice, DCN across hosts via
jax.distributed); nothing here talks to transport directly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import decode as dec_ops
from ..ops import encode as enc_ops

AXIS = "blocks"


def make_block_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices for block data parallelism."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (AXIS,))


def encode_sharded(mesh: Mesh, block: int, chunk: int = 256):
    """Build a pjit-ted sharded batch encoder.

    Returns fn: (uint8[B, block], int32[B]) -> (uint8[B, cap], int32[B])
    with B sharded over the mesh axis; outputs are fully replicated after an
    ordered all-gather so any host can assemble the stream.
    """
    enc = enc_ops.make_encoder(block, chunk=chunk)
    in_s = NamedSharding(mesh, P(AXIS))
    out_s = NamedSharding(mesh, P())

    @jax.jit
    def fn(x, n):
        comp, lens = enc(x, n)
        # ordered all-gather: resharding to replicated inserts the collective
        return (jax.lax.with_sharding_constraint(comp, out_s),
                jax.lax.with_sharding_constraint(lens, out_s))

    def call(x, n):
        x = jax.device_put(x, in_s)
        n = jax.device_put(n, in_s)
        return fn(x, n)

    return call


def decode_sharded(mesh: Mesh, block: int):
    """Build a pjit-ted sharded batch decoder (same layout as encode)."""
    cap = enc_ops.cap_bytes(block)
    dec = dec_ops.make_decoder(cap, block)
    in_s = NamedSharding(mesh, P(AXIS))
    out_s = NamedSharding(mesh, P())

    @jax.jit
    def fn(comp, nbytes):
        out, out_len, markers = dec(comp, nbytes)
        return (jax.lax.with_sharding_constraint(out, out_s),
                jax.lax.with_sharding_constraint(out_len, out_s),
                jax.lax.with_sharding_constraint(markers, out_s))

    def call(comp, nbytes):
        comp = jax.device_put(comp, in_s)
        nbytes = jax.device_put(nbytes, in_s)
        return fn(comp, nbytes)

    return call


@dataclasses.dataclass
class DistributedCodec:
    """Host API: compress/decompress with blocks sharded over a mesh.

    The batch dimension is padded to a multiple of the mesh size so every
    device holds an equal shard (empty blocks encode to a bare end marker
    and are dropped on assembly).
    """
    mesh: Mesh
    block: int = 1 << 16
    chunk: int = 256

    def __post_init__(self):
        self.cap = enc_ops.cap_bytes(self.block)
        self._enc = encode_sharded(self.mesh, self.block, self.chunk)
        self._dec = decode_sharded(self.mesh, self.block)

    @property
    def ndev(self) -> int:
        return self.mesh.devices.size

    def _pad_batch(self, arr: np.ndarray, fill=0) -> np.ndarray:
        b = arr.shape[0]
        want = -(-b // self.ndev) * self.ndev
        if want == b:
            return arr
        pad = np.full((want - b,) + arr.shape[1:], fill, arr.dtype)
        return np.concatenate([arr, pad], axis=0)

    def compress(self, data: bytes) -> tuple[bytes, list[int]]:
        """Returns (raw concatenated streams, per-block compressed sizes)."""
        from ..blocks import pad_blocks

        x, lens = pad_blocks(data, self.block)
        nblocks = x.shape[0]
        x, lens = self._pad_batch(x), self._pad_batch(lens)
        comp, clens = self._enc(jnp.asarray(x), jnp.asarray(lens))
        comp = np.asarray(comp)[:nblocks]
        clens = np.asarray(clens)[:nblocks]
        out = b"".join(comp[b, :clens[b]].tobytes()
                       for b in range(nblocks))
        return out, [int(c) for c in clens]

    def decompress(self, payload: bytes, clens: list[int]) -> bytes:
        nblocks = len(clens)
        comp = np.zeros((nblocks, self.cap), np.uint8)
        pos = 0
        for b, c in enumerate(clens):
            comp[b, :c] = np.frombuffer(payload, np.uint8, c, pos)
            pos += c
        clens_np = self._pad_batch(np.asarray(clens, np.int32))
        comp = self._pad_batch(comp)
        out, out_len, _ = self._dec(jnp.asarray(comp),
                                    jnp.asarray(clens_np))
        out, out_len = np.asarray(out)[:nblocks], np.asarray(out_len)
        return b"".join(out[b, :out_len[b]].tobytes()
                        for b in range(nblocks))
