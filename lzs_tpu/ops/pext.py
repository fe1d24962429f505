"""Pallas kernels for the match-extension stage (sortmatch._extend_batch).

The run-end pinning argument (see sortmatch._extend: runlen decrements by
one along a same-offset diagonal, so one value per maximal capped run
serves the whole run) needs two full-width scans per batch — a reverse
cummin locating the next break and a forward cummax broadcasting each
head's resolved extension — plus a cumsum ranking probe lanes. As XLA
ops on TPU each scan costs ~2-3 ms at the (256, 32768) bench shape;
the roll-based in-VMEM forms here measure ~0.1-0.3 ms (same finding as
pcand's per-k glue, scripts/prim_pallas2.py).

Replaces the hot part of the C reference's COMPRESS_EXTENDED re-measure
loop (lzs-compression.c:417-431) together with the probe tier in
sortmatch._probe_batch.

Kernels:
  ext_break_kernel  (score, off, n) -> packed (ext_res, head, capped,
                    need_probe) via reverse roll-cummin over break info.
  ext_fold_kernel   (packed, ext_h, score, n) -> full lengths via a
                    forward roll-cummax over resolved heads.
  rank_kernel       boolean mask -> exclusive running count (the probe
                    wave compaction rank) via log-step roll adds.
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


def _roll_rcummin(v: jnp.ndarray) -> jnp.ndarray:
    """Row-wise suffix (reverse) cumulative min via log-step rolls."""
    w = v.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    sh = 1
    while sh < w:
        r = pltpu.roll(v, w - sh, axis=v.ndim - 1)   # v[i + sh]
        v = jnp.where(j < w - sh, jnp.minimum(v, r), v)
        sh *= 2
    return v


def _roll_cummax(v: jnp.ndarray) -> jnp.ndarray:
    w = v.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    sh = 1
    while sh < w:
        r = pltpu.roll(v, sh, axis=v.ndim - 1)
        v = jnp.where(j >= sh, jnp.maximum(v, r), v)
        sh *= 2
    return v


def _break_kernel(cap, score_ref, off_ref, n_ref, out_ref):
    score = score_ref[:]                             # (R, N)
    off = off_ref[:]
    nq = n_ref[:]                                    # (R, 1)
    rows, npos = score.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, npos), 1)
    capped = (score >= cap) & (i + cap < nq)
    # Mosaic rotates are 32-bit only: roll the int form of the mask
    prev_c = pltpu.roll(capped.astype(jnp.int32), 1, axis=1)
    prev_o = pltpu.roll(off, 1, axis=1)
    head = capped & ((i == 0) | (prev_c == 0) | (off != prev_o))
    brk = head | ~capped
    is_cap = (score >= cap).astype(jnp.int32)
    binfo = jnp.where(brk, (i << 13) | (is_cap << 12)
                      | jnp.clip(off, 0, 0x7FF), _BIG)
    rcm = _roll_rcummin(binfo)
    # nxt1[i] = rcm[i + 1] (BIG past the end): next break strictly after i
    nxt1 = jnp.where(i == npos - 1, _BIG, pltpu.roll(rcm, npos - 1, axis=1))
    has_brk = nxt1 < _BIG
    e = jnp.where(has_brk, nxt1 >> 13, npos)
    steal = has_brk & (((nxt1 >> 12) & 1) == 1) & ((nxt1 & 0x7FF) < off)
    need_probe = head & ((e + cap >= nq) | steal)
    ext_res = e - i - 1
    out_ref[:] = ((ext_res << 3) | (head.astype(jnp.int32) << 2)
                  | (capped.astype(jnp.int32) << 1)
                  | need_probe.astype(jnp.int32))


def _fold_kernel(cap, packed_ref, exth_ref, score_ref, out_ref):
    packed = packed_ref[:]
    ext_h = exth_ref[:]
    score = score_ref[:]
    rows, npos = packed.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, npos), 1)
    head = ((packed >> 2) & 1) != 0
    capped = ((packed >> 1) & 1) != 0
    pk = _roll_cummax(jnp.where(
        head, (i << 16) | jnp.minimum(cap + ext_h, 0xFFFF), -1))
    hfull = pk & 0xFFFF
    hpos = pk >> 16
    out_ref[:] = jnp.where(capped, hfull - (i - hpos), score)


def _rank_kernel(mask_ref, out_ref):
    """Exclusive running count of set mask entries per row."""
    m = mask_ref[:].astype(jnp.int32)
    w = m.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    acc = m
    sh = 1
    while sh < w:
        r = pltpu.roll(acc, sh, axis=1)
        acc = jnp.where(j >= sh, acc + r, acc)
        sh *= 2
    out_ref[:] = acc - m                 # exclusive


def _pick_rb(rows: int, width: int, arrays: int = 2) -> int:
    """Rows per program: as many as fit ~12 MB of VMEM across
    ``arrays`` live (rb, width) int32 buffers (tiny tiles otherwise
    drown in per-program launch overhead)."""
    cap = max(8, (5 << 20) // max(4 * width * arrays, 1)) & ~7
    rb = _ROWS
    while rb * 2 <= cap and rows % (rb * 2) == 0:
        rb *= 2
    return rb if rows % rb == 0 else rows


def _call(kernel, operands, n_out=1, interp=None):
    if interp is None:
        interp = _interpret()
    b, npos = operands[0].shape
    rb = (_pick_rb(b, npos, max(2, len(operands) + n_out))
          if b % _ROWS == 0 else b)
    spec2 = pl.BlockSpec((rb, npos), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def spec_for(o):
        if o.shape[1] == 1:
            return pl.BlockSpec((rb, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        return spec2

    return pl.pallas_call(
        kernel,
        grid=(b // rb,),
        in_specs=[spec_for(o) for o in operands],
        out_specs=spec2,
        out_shape=jax.ShapeDtypeStruct((b, npos), jnp.int32),
        interpret=interp,
    )(*operands)


def ext_breaks(score, off, n, cap: int):
    """Packed (ext_res << 3 | head << 2 | capped << 1 | need_probe)."""
    return _call(functools.partial(_break_kernel, cap),
                 [score, off, n[:, None]])


def ext_fold(packed, ext_h, score, cap: int):
    """Full run lengths from resolved head extensions."""
    return _call(functools.partial(_fold_kernel, cap),
                 [packed, ext_h, score])


def rank_mask(mask):
    """int32 exclusive per-row running count of a boolean mask."""
    return _call(_rank_kernel, [mask.astype(jnp.int32)])


def _rcummin_kernel(v_ref, out_ref):
    out_ref[:] = _roll_rcummin(v_ref[:])


def rcummin_rows(v):
    """Row-wise suffix cumulative min of int32[B, N] (Pallas roll-scan;
    XLA's reverse cummin costs ~2-3 ms at the (256, 32768) bench shape)."""
    return _call(_rcummin_kernel, [v])


def _cummax_kernel(v_ref, out_ref):
    out_ref[:] = _roll_cummax(v_ref[:])


def cummax_rows(v):
    """Row-wise prefix cumulative max of int32[B, N] (Pallas roll-scan)."""
    return _call(_cummax_kernel, [v])


def _cumsum_kernel(v_ref, out_ref):
    v = v_ref[:]
    w = v.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    sh = 1
    while sh < w:
        r = pltpu.roll(v, sh, axis=1)
        v = jnp.where(j >= sh, v + r, v)
        sh *= 2
    out_ref[:] = v


def cumsum_rows_wide(v, tile: int = 8192):
    """Inclusive row cumsum of int32[B, N] for very wide rows.

    Two-stage: Pallas roll-scan per ``tile``-wide piece, a tiny XLA
    cumsum over per-tile totals, and a broadcast add. XLA's native
    cumsum costs ~15+ ms at (256, 294912); this measures ~2 ms.
    Requires N % tile == 0.
    """
    b, n = v.shape
    if n <= tile:
        return _call(_cumsum_kernel, [v])
    assert n % tile == 0, (n, tile)
    nt = n // tile
    parts = _call(_cumsum_kernel, [v.reshape(b * nt, tile)])
    parts = parts.reshape(b, nt, tile)
    totals = parts[:, :, -1]
    base = jnp.cumsum(totals, axis=1) - totals       # (B, nt): tiny
    return (parts + base[:, :, None]).reshape(b, n)


