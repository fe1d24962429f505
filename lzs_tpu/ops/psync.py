"""Pallas kernel for the decode-sync record builder (encode.py).

Builds, in one VMEM pass per row block, the three packed compaction-sort
keys for the span-crossing parse steps (encode._sync_records_batch):
the owner-token cummax, the next-step reverse cummin, the parse-step
predicate (token heads + every NIBBLES_PER_STEP-th extension nibble,
decode2's lane contract), and the crossing-slot test. As separate XLA
ops these cost ~8 ms at the (256, 32768) bench shape (two full scans
plus ~15 elementwise passes through HBM); the fused kernel measures
well under 1 ms and the int32 keys sort faster than the old uint32
packing (1.04 vs 1.47 ms per full-batch sort).

Key layout (int32, non-negative): miss << (pb+cb) | slot << pb | payload,
payload = record bit offset (< cap_bits) or a record half (<= 16 bits),
with pb/cb sized per (block, span) by the caller (encode.py asserts
pb + cb + 1 <= 31; every block <= 32768 fits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8
_BIG = 0x3FFFFFFF


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll_cummax(v):
    w = v.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    sh = 1
    while sh < w:
        v = jnp.where(j >= sh, jnp.maximum(v, pltpu.roll(v, sh, axis=1)), v)
        sh *= 2
    return v


def _roll_rcummin(v):
    w = v.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    sh = 1
    while sh < w:
        r = pltpu.roll(v, w - sh, axis=1)
        v = jnp.where(j < w - sh, jnp.minimum(v, r), v)
        sh *= 2
    return v


def _sync_kernel(span, nibbles, short_len, ext_len, pb, cmax, starts_ref,
                 width_ref, off_ref, offs_ref, end_ref, ko_ref, kl_ref,
                 kh_ref):
    starts = starts_ref[:] != 0                       # (R, N)
    width = width_ref[:]
    off = off_ref[:]
    o = offs_ref[:]
    endbits = end_ref[:]                              # (R, 1)
    rows, npos = width.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, npos), 1)

    is_nib = (~starts) & (width == 4)
    okey = _roll_cummax(jnp.where(
        starts, (i << 12) | jnp.minimum(off, 0xFFF), -1))
    owner_i = okey >> 12
    owner_off = okey & 0xFFF
    t = i - owner_i - 1
    is_step = starts | (is_nib & (t % nibbles == 0))

    opos = jnp.where(starts, i, owner_i + short_len + ext_len * t)
    rec = jnp.where(starts, i, opos | (1 << 17) | (owner_off << 18))

    so = jnp.where(is_step, o, _BIG)
    nso = _roll_rcummin(so)
    next_o = jnp.where(i == npos - 1, endbits,
                       pltpu.roll(nso, npos - 1, axis=1))
    c = next_o // span
    cross = is_step & (o // span < c)

    cb = max(1, cmax.bit_length())
    miss = jnp.where(cross, 0, 1 << (pb + cb))
    cu = miss | (jnp.clip(c, 0, cmax) << pb)
    ko_ref[:] = cu | o
    kl_ref[:] = cu | (rec & 0xFFFF)
    kh_ref[:] = cu | ((rec >> 16) & 0x1FFF)


def sync_keys(starts, width, off, offs, end_bits, *, span: int,
              nibbles: int, short_len: int, ext_len: int, pb: int,
              cmax: int):
    """Packed compaction keys (key_o, key_rec_lo, key_rec_hi) for the
    span-crossing parse-step records; see module docstring for layout."""
    b, npos = width.shape
    rb = _ROWS if b % _ROWS == 0 else b
    spec2 = pl.BlockSpec((rb, npos), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((rb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sync_kernel, span, nibbles, short_len, ext_len,
                          pb, cmax),
        grid=(b // rb,),
        in_specs=[spec2, spec2, spec2, spec2, spec1],
        out_specs=[spec2] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, npos), jnp.int32)] * 3,
        interpret=_interpret(),
    )(starts.astype(jnp.int32), width, off, offs, end_bits[:, None])
