"""Pallas kernel for the bit-pack stage (bitpack.pack_bits_batch).

One in-VMEM pass replaces the old pipeline's two compaction sorts, two
XLA cumsums and four head-compaction sorts: it computes the exclusive
bit-offset cumsum, builds each unit's 64-bit anchored window, ORs the
windows of every anchor-word group with a segmented suffix-OR (valid in
log steps because the anchor word is monotone along the row), merges
each group's spill into the NEXT group's head (consecutive heads hold
consecutive anchor words — widths <= 25 < 32 never skip a word), and
emits packed head-compaction keys. Two parallel single-operand sorts
then deliver the dense word array (the unique (w0) head prefix pins one
order for both halves — same trick as the old quad sorts, but two
instead of four and with no compaction pass before).

MSB-first accumulation semantics are the reference's 32-bit bit queue
(lzs-compression.c:303-313); units never share bits so OR == append.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8
_MISS = 1 << 30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _phase1_kernel(v_ref, w_ref, offs_ref, hi_ref, lo_ref):
    v = v_ref[:].astype(jnp.uint32)                  # (R, M) right-aligned
    w = w_ref[:]                                     # (R, M) widths 0..25
    rows, m = w.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, m), 1)

    # exclusive cumsum of widths (log-step roll adds)
    acc = w
    sh = 1
    while sh < m:
        r = pltpu.roll(acc, sh, axis=1)
        acc = jnp.where(i >= sh, acc + r, acc)
        sh *= 2
    offs = acc - w

    w0 = offs >> 5
    end = (offs & 31) + w
    sh_hi = jnp.clip(32 - end, 0, 31).astype(jnp.uint32)
    sh_lo = jnp.clip(end - 32, 0, 31).astype(jnp.uint32)
    hi = jnp.where(end <= 32, v << sh_hi, v >> sh_lo)
    lo = jnp.where(end <= 32, jnp.uint32(0),
                   v << jnp.clip(64 - end, 0, 31).astype(jnp.uint32))
    live = w > 0
    hi = _i32(jnp.where(live, hi, jnp.uint32(0)))
    lo = _i32(jnp.where(live, lo, jnp.uint32(0)))

    # segmented suffix-OR within equal-anchor-word runs (w0 monotone, so
    # "same value at distance sh" means the whole span is one run)
    sh = 1
    while sh < m:
        same = (i < m - sh) & (pltpu.roll(w0, m - sh, axis=1) == w0)
        hi_s = pltpu.roll(hi, m - sh, axis=1)
        lo_s = pltpu.roll(lo, m - sh, axis=1)
        hi = jnp.where(same, hi | hi_s, hi)
        lo = jnp.where(same, lo | lo_s, lo)
        sh *= 2

    offs_ref[:] = offs
    hi_ref[:] = hi
    lo_ref[:] = lo


def _phase2_kernel(offs_ref, hi_ref, lo_ref, ka_ref, kb_ref,
                   lp1_ref, lp2_ref):
    offs = offs_ref[:]
    hi_acc = hi_ref[:]
    lo_u = _u32(lo_ref[:])
    rows, m = offs.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, m), 1)
    w0 = offs >> 5
    head = (i == 0) | (pltpu.roll(w0, 1, axis=1) != w0)

    # previous head's group spill -> this head's word (log-step cummax
    # of (w0 << 16 | lo half) at heads, then the value just before me)
    c1 = jnp.where(head, (w0 << 16) | _i32(lo_u >> 16), -1)
    c2 = jnp.where(head, (w0 << 16) | _i32(lo_u & 0xFFFF), -1)
    sh = 1
    while sh < m:
        c1 = jnp.where(i >= sh, jnp.maximum(
            c1, pltpu.roll(c1, sh, axis=1)), c1)
        c2 = jnp.where(i >= sh, jnp.maximum(
            c2, pltpu.roll(c2, sh, axis=1)), c2)
        sh *= 2
    pm1 = jnp.where(i == 0, -1, pltpu.roll(c1, 1, axis=1))
    pm2 = jnp.where(i == 0, -1, pltpu.roll(c2, 1, axis=1))
    prev_lo = _i32((_u32(pm1 & 0xFFFF) << 16) | _u32(pm2 & 0xFFFF))
    take = head & (pm1 >= 0) & ((pm1 >> 16) == w0 - 1)
    hi_u = _u32(hi_acc | jnp.where(take, prev_lo, 0))

    miss = jnp.where(head, 0, _MISS)
    ka_ref[:] = miss | (w0 << 16) | _i32(hi_u >> 16)
    kb_ref[:] = miss | (w0 << 16) | _i32(hi_u & 0xFFFF)
    # the cummax's last column IS the row max of the per-head spill
    # packs (the FINAL head's spill, which no successor head carries)
    lp1_ref[:] = c1[:, m - 1:m]
    lp2_ref[:] = c2[:, m - 1:m]


def _u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def pack_phase(value: jnp.ndarray, width: jnp.ndarray):
    """(offs, key_a, key_b, lp1, lp2).

    offs/key_a/key_b: int32[B, M]; lp1/lp2: int32[B, 1]. key_a/key_b
    are head-compaction sort keys carrying the group word's hi/lo
    16-bit halves (entries >= 1<<30 are non-heads); lp1/lp2 hold the
    row-max packed spill of the FINAL head, whose spill has no
    successor head to carry it into the dense words.
    """
    b, m = value.shape
    rb = _ROWS if b % _ROWS == 0 else b
    spec2 = pl.BlockSpec((rb, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((rb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    interp = _interpret()
    # two kernels: the fused single-pass form needs ~17.5 MB of scoped
    # VMEM at (8, 32768) — over the 16 MB limit
    offs, hi, lo = pl.pallas_call(
        _phase1_kernel,
        grid=(b // rb,),
        in_specs=[spec2, spec2],
        out_specs=[spec2] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, m), jnp.int32)] * 3,
        interpret=interp,
    )(value, width)
    ka, kb, lp1, lp2 = pl.pallas_call(
        _phase2_kernel,
        grid=(b // rb,),
        in_specs=[spec2] * 3,
        out_specs=[spec2, spec2, spec1, spec1],
        out_shape=[jax.ShapeDtypeStruct((b, m), jnp.int32)] * 2
        + [jax.ShapeDtypeStruct((b, 1), jnp.int32)] * 2,
        interpret=interp,
    )(offs, hi, lo)
    return offs, ka, kb, lp1, lp2
