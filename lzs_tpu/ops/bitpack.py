"""MSB-first bit packing with prefix-summed offsets — scatter-free.

Every position carries one right-aligned (value, width <= 25) unit. Bit
offsets are the exclusive prefix sum of widths; each unit is placed into a
64-bit big-endian window anchored at its start *word*. Because widths are
<= 25 < 32, the anchor word index is nondecreasing with steps in {0, 1}:
consecutive units either share a word or move to the next one, and no word
is skipped. That turns the word assembly into

  1. a segmented OR (suffix-OR within equal-anchor-word groups, log-step
     shifts — units never share bits, so OR == the reference's bit-queue
     accumulation, lzs-compression.c:303-313), then
  2. one compaction sort: group heads appear in anchor-word order, so
     sorting heads to the front yields the dense word array directly.

This costs one small sort instead of a scatter — on TPU, XLA scatters
serialize (~0.1 G elem/s measured) while sorts stream at ~1 G elem/s.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 0x7FFFFFFF  # plain int: no backend init at import time


def _seg_suffix_or(key: jnp.ndarray, val: jnp.ndarray) -> jnp.ndarray:
    """Suffix-OR of ``val`` within runs of equal ``key`` (1-D arrays).

    Returns acc with acc[i] = OR of val[j] for all j >= i in i's run. The
    run head then carries the whole group's OR.
    """
    m = key.shape[0]
    acc = val
    sh = 1
    while sh < m:
        shifted = jnp.concatenate([acc[sh:], jnp.zeros(sh, acc.dtype)])
        same = jnp.concatenate([key[sh:] == key[:-sh],
                                jnp.zeros(sh, jnp.bool_)])
        acc = jnp.where(same, acc | shifted, acc)
        sh *= 2
    return acc


def pack_bits(value: jnp.ndarray, width: jnp.ndarray, cap_bytes: int,
              end_marker: tuple | None = None):
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
    out, total_bits, offs = pack_bits_batch(value[None], width[None],
                                            cap_bytes,
                                            end_marker=end_marker)
    return out[0], total_bits[0], offs[0]


def pack_bits_batch(value: jnp.ndarray, width: jnp.ndarray,
                    cap_bytes: int, end_marker: tuple | None = None):
    """Batched pack_bits: int32[B, M] value/width -> uint8[B, cap_bytes].

    ``end_marker=(value, bits)`` splices one trailing unit into the
    packed words arithmetically instead of as an M+1-th array column —
    a 32769-wide sort pads to the next power of two and costs 3.4x a
    32768-wide one on v5e.

    Stages: (1) compact real units (width > 0) to the row front with ONE
    packed 2-operand sort — offsets are the cumsum of compacted widths,
    identical to the uncompacted cumsum since zero-width units add 0;
    (2) anchor-word grouping: after compaction a 32-bit word hosts at
    most 10 units (the narrowest is a 4-bit nibble), so the segmented
    suffix-OR needs 4 log-step rounds instead of 15; (3) one 3-operand
    compaction sort delivers the per-word heads to dense word slots.
    Every sort is row-split to stay VMEM-resident (pcand._row_sort).
    """
    from .pcand import _row_sort

    assert cap_bytes % 4 == 0
    cap_words = cap_bytes // 4
    b, m = value.shape
    assert m <= (1 << 16) and cap_words <= (1 << 14)
    pos = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None, :], (b, m))
    rows = max(8, ((16 << 20) // (4 * m)) & ~7)
    # compaction as two parallel packed single-operand sorts: both keys
    # share the unique (invalid, pos) prefix so their orders coincide,
    # and 1-op sorts compile ~7x faster than multi-operand comparators
    # (2 s vs 14 s) at similar runtime
    inv = (width <= 0).astype(jnp.uint32) << 31
    posu = pos.astype(jnp.uint32) << 15
    vu = value.astype(jnp.uint32)
    key_a = inv | posu | (width.astype(jnp.uint32) << 10) | (vu >> 15)
    key_b = inv | posu | (vu & 0x7FFF)
    sa = _row_sort(key_a, rows)
    sb = _row_sort(key_b, rows)
    w_c = ((sa >> 10) & 31).astype(jnp.int32)
    v_c = ((sa & 0x3FF) << 15) | (sb & 0x7FFF)

    offs_c = jnp.cumsum(w_c, axis=1) - w_c
    total_bits = offs_c[:, -1] + w_c[:, -1]

    w0 = offs_c >> 5
    end = (offs_c & 31) + w_c             # bit end within 64-bit window
    hi = jnp.where(end <= 32,
                   v_c << jnp.clip(32 - end, 0, 31).astype(jnp.uint32),
                   v_c >> jnp.clip(end - 32, 0, 31).astype(jnp.uint32))
    lo = jnp.where(end <= 32, jnp.uint32(0),
                   v_c << jnp.clip(64 - end, 0, 31).astype(jnp.uint32))
    hi = jnp.where(w_c > 0, hi, 0).astype(jnp.int32)
    lo = jnp.where(w_c > 0, lo, 0).astype(jnp.int32)

    # group by anchor word, OR each group into its head; groups hold
    # <= 10 units after compaction, so 4 rounds (shifts 1, 2, 4, 8)
    hi_acc, lo_acc = hi, lo
    for sh in (1, 2, 4, 8):
        z = jnp.zeros((b, sh), jnp.int32)
        same = jnp.concatenate([w0[:, sh:] == w0[:, :-sh],
                                jnp.zeros((b, sh), jnp.bool_)], axis=1)
        hi_s = jnp.concatenate([hi_acc[:, sh:], z], axis=1)
        lo_s = jnp.concatenate([lo_acc[:, sh:], z], axis=1)
        hi_acc = jnp.where(same, hi_acc | hi_s, hi_acc)
        lo_acc = jnp.where(same, lo_acc | lo_s, lo_acc)

    head = jnp.concatenate(
        [jnp.ones((b, 1), jnp.bool_), w0[:, 1:] != w0[:, :-1]], axis=1)
    head = head & (w_c > 0)
    # head compaction as four parallel packed 1-op sorts (same
    # compile-time rationale as above); anchor words are unique per head
    inv2 = (~head).astype(jnp.uint32) << 31
    w0u = inv2 | (w0.astype(jnp.uint32) << 16)
    hiu = hi_acc.astype(jnp.uint32)
    lou = lo_acc.astype(jnp.uint32)
    quads = [w0u | (hiu >> 16), w0u | (hiu & 0xFFFF),
             w0u | (lou >> 16), w0u | (lou & 0xFFFF)]
    if m < cap_words:                     # ensure >= cap_words entries
        pad = jnp.full((b, cap_words - m), 0xFFFFFFFF, jnp.uint32)
        quads = [jnp.concatenate([q, pad], axis=1) for q in quads]
    rows2 = max(8, ((16 << 20) // (4 * quads[0].shape[1])) & ~7)
    s = [_row_sort(q, rows2)[:, :cap_words] for q in quads]
    hi_d = (((s[0] & 0xFFFF) << 16) | (s[1] & 0xFFFF)).astype(jnp.int32)
    lo_d = (((s[2] & 0xFFFF) << 16) | (s[3] & 0xFFFF)).astype(jnp.int32)

    if end_marker is not None:
        emv, emb = end_marker
        emv = jnp.uint32(emv)
        w0m = (total_bits >> 5)[:, None]
        endm = ((total_bits & 31) + emb)[:, None].astype(jnp.uint32)
        hi_m = jnp.where(endm <= 32,
                         emv << jnp.clip(32 - endm, 0, 31),
                         emv >> jnp.clip(endm - 32, 0, 31)).astype(
                             jnp.int32)
        lo_m = jnp.where(endm <= 32, jnp.uint32(0),
                         emv << jnp.clip(64 - endm, 0, 31)).astype(
                             jnp.int32)
        wi = jnp.arange(cap_words, dtype=jnp.int32)[None, :]
        hi_d = hi_d | jnp.where(wi == w0m, hi_m, 0)
        lo_d = lo_d | jnp.where(wi == w0m, lo_m, 0)
        total_bits = total_bits + emb

    nwords = ((total_bits + 31) >> 5)[:, None]
    valid = jnp.arange(cap_words, dtype=jnp.int32)[None, :] < nwords
    lo_prev = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), lo_d[:, :-1]], axis=1)
    words = jnp.where(valid, hi_d | lo_prev, 0)

    # uncompacted exclusive offsets (sync records index by position):
    # cumsum over the original widths
    offs = jnp.cumsum(width, axis=1) - width
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
