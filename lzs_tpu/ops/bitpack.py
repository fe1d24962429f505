"""MSB-first bit packing with prefix-summed offsets.

Every position carries one right-aligned (value, width <= 25) unit. Bit
offsets are the exclusive prefix sum of widths; each unit is placed into a
64-bit big-endian window anchored at its start *word* and the two window
words are scatter-added into an int32 word array (units never share bits,
so addition equals bitwise OR). Words unpack to bytes with elementwise
shifts at the end. This replaces the reference's sequential 32-bit bit
queue (lzs-compression.c:303-313) with a fully parallel formulation at
half the scatter volume of a byte-lane packer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_bits(value: jnp.ndarray, width: jnp.ndarray, cap_bytes: int):
    """Pack per-position bit fields into a byte stream.

    Args:
      value: int32[M] right-aligned bit fields (width <= 25 bits).
      width: int32[M] field widths (0..25). Zero-width entries are ignored.
      cap_bytes: static output capacity in bytes; must be a multiple of 4
        with >= 8 bytes of slack past the worst-case stream.

    Returns:
      (bytes: uint8[cap_bytes], total_bits: int32 scalar,
       offs: int32[M] exclusive bit offsets)
    """
    assert cap_bytes % 4 == 0
    cap_words = cap_bytes // 4
    offs = jnp.cumsum(width) - width          # exclusive prefix sum
    total_bits = (offs[-1] + width[-1]) if width.shape[0] else jnp.int32(0)

    w0 = offs >> 5
    end = (offs & 31) + width                 # bit end within 64-bit window
    v = value.astype(jnp.uint32)
    hi = jnp.where(end <= 32,
                   v << jnp.clip(32 - end, 0, 31),
                   v >> jnp.clip(end - 32, 0, 31))
    lo = jnp.where(end <= 32, jnp.uint32(0),
                   v << jnp.clip(64 - end, 0, 31))
    hi = jnp.where(width > 0, hi, 0).astype(jnp.int32)
    lo = jnp.where(width > 0, lo, 0).astype(jnp.int32)

    words = jnp.zeros(cap_words, jnp.int32)
    words = words.at[w0].add(hi, mode="drop")
    words = words.at[w0 + 1].add(lo, mode="drop")
    return words_to_bytes(words), total_bits, offs


def words_to_bytes(words: jnp.ndarray) -> jnp.ndarray:
    """Big-endian int32 word array -> uint8 byte array (elementwise)."""
    w = words.astype(jnp.uint32)
    b = jnp.stack([(w >> 24) & 0xFF, (w >> 16) & 0xFF,
                   (w >> 8) & 0xFF, w & 0xFF], axis=-1)
    return b.reshape(w.shape[:-1] + (w.shape[-1] * 4,)).astype(jnp.uint8)


def read_window(data: jnp.ndarray, bitpos: jnp.ndarray) -> jnp.ndarray:
    """Read a 32-bit big-endian window starting at byte bitpos>>3, shifted so
    the bit at ``bitpos`` becomes the MSB. ``data`` must be int32-valued bytes
    padded with >= 4 trailing zeros."""
    b = bitpos >> 3
    w = ((data[b] << 24) | (data[b + 1] << 16)
         | (data[b + 2] << 8) | data[b + 3]).astype(jnp.uint32)
    return (w << (bitpos & 7).astype(jnp.uint32))
