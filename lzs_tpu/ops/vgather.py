"""MXU-based vectorized gather.

XLA's native gather lowers to a slow serialized path on TPU (~9-14 ns per
element measured on v5e). For small tables (<= a few thousand entries) a
gather is better expressed as a digit-decomposed one-hot contraction that
runs on the MXU: split the index into a high digit (selects a 16-wide row
group via an int8 one-hot matmul) and a low digit (an in-row 16-way
select). Measured ~3-10x faster than XLA gather for the table sizes used
by the decode expansion kernels.

Multiple value planes (e.g. value byte + resolved flag) ride one matmul by
stacking them along the contracted row, so a P-plane gather costs one
(Q x Thi) @ (Thi x 16P) contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mxu_gather(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather via one-hot MXU contraction.

    Args:
      values: int32[B, T] (entries 0..255; wider values: use plane splits)
        or int32[B, T, P] for P planes of 0..255 values. T % 16 == 0.
      idx: int32[B, Q] indices in [0, T).

    Returns:
      int32[B, Q] (or [B, Q, P]) gathered values.
    """
    squeeze = values.ndim == 2
    if squeeze:
        values = values[..., None]
    b, t, p = values.shape
    assert t % 16 == 0, t
    thi = t // 16
    hi = idx >> 4
    lo = idx & 15
    oh = (hi[:, :, None]
          == jnp.arange(thi, dtype=jnp.int32)[None, None, :]).astype(jnp.int8)
    v8 = values.astype(jnp.int8).reshape(b, thi, 16 * p)
    rows = jax.lax.dot_general(
        oh, v8, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)            # (B, Q, 16*P)
    rows = rows.reshape(b, idx.shape[1], 16, p)
    sel = (lo[:, :, None, None]
           == jnp.arange(16, dtype=jnp.int32)[None, None, :, None])
    out = jnp.sum(jnp.where(sel, rows, 0), axis=2) & 0xFF
    return out[..., 0] if squeeze else out


def mxu_span_gather(words: jnp.ndarray, start: jnp.ndarray,
                    span: int, chunk: int = 16) -> jnp.ndarray:
    """Contiguous span fetch: out[q, s] = words[start[q] + s] on the MXU.

    words: int32[T] full-range 32-bit values, T % chunk == 0; reads past
    T must not occur (pad the table). start: int32[Q] word indices with
    start + span <= T. span <= chunk (so two chunks always cover it).

    Two-stage: an int8 one-hot (Q, T/chunk) contraction fetches each
    lane's chunk and its successor (byte-plane packed), then log-step
    conditional rolls rotate each lane's 2-chunk row so the span is
    left-aligned. No serialized XLA gather anywhere (~10 ns/element on
    TPU). Small chunks keep the roll traffic down — the rolls
    materialize (Q, 2*chunk) rows once per round.
    """
    t = words.shape[0]
    assert t % chunk == 0 and span <= chunk and chunk & (chunk - 1) == 0
    nch = t // chunk
    planes = jnp.stack([(words >> (8 * k)) & 0xFF for k in range(4)],
                       axis=-1).astype(jnp.int8).reshape(nch, 4 * chunk)
    hi = start // chunk
    lo = start & (chunk - 1)
    q = start.shape[0]
    ch = jnp.arange(nch, dtype=jnp.int32)
    oh_a = (hi[:, None] == ch[None, :]).astype(jnp.int8)
    oh_b = (hi[:, None] + 1 == ch[None, :]).astype(jnp.int8)
    a = jax.lax.dot_general(oh_a, planes, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    b = jax.lax.dot_general(oh_b, planes, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)

    def combine(p):                  # (Q, 4*chunk) planes -> (Q, chunk)
        p = (p & 0xFF).reshape(q, chunk, 4)
        return (p[..., 0] | (p[..., 1] << 8) | (p[..., 2] << 16)
                | (p[..., 3] << 24))

    row = jnp.concatenate([combine(a), combine(b)], axis=1)  # (Q, 2chunk)
    s = chunk >> 1
    while s:
        row = jnp.where((lo & s)[:, None] != 0,
                        jnp.roll(row, -s, axis=1), row)
        s >>= 1
    return row[:, :span]


def mxu_gather_wide(values: jnp.ndarray, idx: jnp.ndarray,
                    bits: int) -> jnp.ndarray:
    """Gather int values of up to ``bits`` (<= 24) bits via byte planes."""
    planes = (bits + 7) // 8
    v = jnp.stack([(values >> (8 * t)) & 0xFF for t in range(planes)],
                  axis=-1)
    g = mxu_gather(v, idx)
    out = jnp.zeros(idx.shape, jnp.int32)
    for t in range(planes):
        out = out | (g[..., t] << (8 * t))
    return out
