"""MSB-first bit packing with prefix-summed offsets.

Every position carries one right-aligned (value, width<=25) unit. Bit offsets
are the exclusive prefix sum of widths; each unit is placed into a 32-bit
big-endian window anchored at its start byte and the four window bytes are
scatter-added into the output (units never share bits, so byte-level addition
equals bitwise OR). This replaces the reference's sequential 32-bit bit queue
(lzs-compression.c:303-313) with a fully parallel formulation.
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_bits(value: jnp.ndarray, width: jnp.ndarray, cap_bytes: int):
    """Pack per-position bit fields into a byte stream.

    Args:
      value: int32[M] right-aligned bit fields.
      width: int32[M] field widths (0..25). Zero-width entries are ignored.
      cap_bytes: static output capacity in bytes (needs >= 4 bytes slack).

    Returns:
      (bytes: uint8[cap_bytes], total_bits: int32 scalar)
    """
    offs = jnp.cumsum(width) - width          # exclusive prefix sum
    total_bits = offs[-1] + width[-1] if width.shape[0] else jnp.int32(0)
    byte0 = offs >> 3
    shift = offs & 7
    word = jnp.where(
        width > 0,
        (value.astype(jnp.uint32)
         << (32 - shift - width).astype(jnp.uint32)),
        jnp.uint32(0))
    out = jnp.zeros(cap_bytes, jnp.int32)
    for j in range(4):
        lane = ((word >> (8 * (3 - j))) & 0xFF).astype(jnp.int32)
        out = out.at[byte0 + j].add(lane, mode="drop")
    return out.astype(jnp.uint8), total_bits


def read_window(data: jnp.ndarray, bitpos: jnp.ndarray) -> jnp.ndarray:
    """Read a 32-bit big-endian window starting at byte bitpos>>3, shifted so
    the bit at ``bitpos`` becomes the MSB. ``data`` must be int32-valued bytes
    padded with >= 4 trailing zeros."""
    b = bitpos >> 3
    w = ((data[b] << 24) | (data[b + 1] << 16)
         | (data[b + 2] << 8) | data[b + 3]).astype(jnp.uint32)
    return (w << (bitpos & 7).astype(jnp.uint32))
