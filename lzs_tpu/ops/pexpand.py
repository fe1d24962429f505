"""Pallas LZ77 copy-expansion kernel (the decode back half).

Expands parse records (decode2._filled_records) into output bytes with
a carried 2 KiB circular window in VMEM — replacing both the XLA
window-carry chunk scan (~45 ms of MXU one-hot gathers at the 8 MiB
bench batch) and the per-byte ownership merge sorts (~16 ms). Blocks
ride the sublane dim per program; each chunk step binary-searches its
covering record in a pointer-carried VMEM record window, does one
two-level window gather over the circular byte window, and six pointer-
doubling rounds for in-chunk copy chains (chain depth <= chunk/2 = 64,
the bound pinned by test_deep_copy_chain_in_chunk).

Every copy's ultimate source is strictly before its own token start
(a copy of length L > offset d wraps as src = start - d + (j - start)
% d, which also linearizes RLE chains — lzs-decompression.c:346-365
byte-serial semantics), so sources either land in the carried window
or chain within the chunk. Sources before the block start produce
zeros, reproducing the reference decoder's corrupt-input hygiene
("Avoid information leak", lzs-decompression.c:348-357), and set a
per-block status flag (the container-level analogue of
LzsDecompressStatus_t error reporting, lzs.h:170-178).

Status bits (per block):
  bit 0  a byte inside [0, n) had no covering token (parse underrun)
  bit 1  a copy source fell before the block start (offset too far)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128                  # bytes per chunk step (one lane row)
_WIN = 2048                   # carried window capacity (>= WINDOW_SIZE)
_BLKS = 32                    # blocks per program (sublane dim)
_ROUNDS = 6                   # in-chunk doubling rounds (2^6 = chunk/2)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _win_gather(win_ref, widx: jnp.ndarray) -> jnp.ndarray:
    """Two-level gather from the circular window: widx int32[BLKS, C]
    in [0, _WIN) -> values int32[BLKS, C]."""
    lane = widx & (_CHUNK - 1)
    hi = widx >> 7
    acc = jnp.zeros_like(widx)
    for s in range(_WIN // _CHUNK):
        row = win_ref[:, s * _CHUNK:(s + 1) * _CHUNK]
        g = jnp.take_along_axis(row, lane, axis=-1)
        acc = jnp.where(hi == s, g, acc)
    return acc


# ---------------------------------------------------------------------------
# Record-walk expansion: no per-byte ownership sorts at all
# ---------------------------------------------------------------------------

_RW = 768                     # record window per chunk (>= 529 worst-case
                              # slots per 128-byte chunk + alignment slack)


def _rw_gather(win: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather from the (BLKS, _RW) record window: idx in [0, _RW)."""
    lane = idx & 127
    hi = idx >> 7
    acc = jnp.zeros_like(idx)
    for s in range(_RW // 128):
        g = jnp.take_along_axis(win[:, s * 128:(s + 1) * 128], lane,
                                axis=-1)
        acc = jnp.where(hi == s, g, acc)
    return acc


def _expand_rec_kernel(rec_ref, n_ref, out_ref, st_ref, win_ref, rw_ref,
                       ptr_ref):
    c = pl.program_id(1)
    blks, s_pad = rec_ref.shape

    @pl.when(c == 0)
    def _():
        win_ref[:] = jnp.zeros_like(win_ref)
        st_ref[:] = jnp.zeros_like(st_ref)
        for r in range(blks):
            ptr_ref[r] = 0

    base = c * _CHUNK
    nb = n_ref[:]                                        # (BLKS, 1)

    # fetch each row's record window, 128-aligned at the slot before the
    # carried pointer (ptr counts slots with opos < base; the covering
    # record of the chunk's first byte sits at slot ptr - 1)
    offs = []
    for r in range(blks):
        start = jnp.maximum(ptr_ref[r] - 1, 0)
        al = jnp.minimum((start // 128) * 128, s_pad - _RW)
        rw_ref[r:r + 1, :] = rec_ref[r:r + 1, pl.ds(
            pl.multiple_of(al, 128), _RW)]
        offs.append(al)
    rw = rw_ref[:]                                       # (BLKS, _RW)
    j = jax.lax.broadcasted_iota(jnp.int32, (blks, _CHUNK), 1) + base

    # opos per window slot (empty/filled slots carry the previous record;
    # rec < 0 means before the first record)
    w_opos = jnp.where(rw >= 0, rw >> 13, -1)

    # per-byte binary search: last window slot with opos <= j. The
    # window is nondecreasing in opos; search the slot index range.
    lo = jnp.zeros((blks, _CHUNK), jnp.int32)            # candidate slot
    step = 512                      # power-of-2 steps reach every index
    while step >= 1:
        probe = lo + step
        pv = _rw_gather(w_opos, jnp.clip(probe, 0, _RW - 1))
        ok = (probe <= _RW - 1) & (pv <= j)
        lo = jnp.where(ok, probe, lo)
        step //= 2
    rec = _rw_gather(rw, lo)
    first_bad = (_rw_gather(w_opos, lo) > j) | (rec < 0)
    rec = jnp.where(first_bad, -1, rec)

    seg_start = rec >> 13
    is_copy = ((rec >> 11) & 1) == 1
    pay = rec & 0x7FF
    none = rec < 0
    is_lit = (~is_copy) & (~none)

    d = jnp.maximum(pay, 1)
    # A copy of length L > d is periodic with period d, so any position
    # p ≡ j (mod d) in [seg_start - d, j) carries j's value. The direct
    # form (first period) can fall out of the carried window when one
    # record spans many chunks (a single head can swallow a whole
    # extension-nibble chain, ops.bitpar); rebase those onto the last
    # period before the chunk base, which is always window-resident.
    src_near = seg_start - d + jax.lax.rem(j - seg_start, d)
    src_far = base - d + jax.lax.rem(j - base, d)
    src = jnp.where(seg_start - d >= base - _WIN, src_near, src_far)
    val = jnp.where(is_lit, pay & 0xFF, 0)
    res = is_lit | none

    bad_cov = none & (j < nb)
    bad_src = is_copy & (src < 0) & (j < nb)

    from_win = (~res) & (src < base)
    wval = _win_gather(win_ref, jax.lax.rem(src + 2 * _WIN, _WIN))
    wval = jnp.where(src < 0, 0, wval)
    val = jnp.where(from_win, wval, val)
    res = res | from_win

    p = jnp.clip(src - base, 0, _CHUNK - 1)
    for _ in range(_ROUNDS):
        packed = (res.astype(jnp.int32) << 8) | val
        g = jnp.take_along_axis(packed, p, axis=-1)
        gp = jnp.take_along_axis(p, p, axis=-1)
        take = (~res) & ((g >> 8) == 1)
        val = jnp.where(take, g & 0xFF, val)
        res = res | take
        p = jnp.where(res, p, gp)

    out_ref[0] = jnp.where(j < nb, val, 0)
    st_ref[:, 0] = (st_ref[:, 0]
                    | jnp.any(bad_cov, axis=1).astype(jnp.int32)
                    | (jnp.any(bad_src, axis=1).astype(jnp.int32) << 1))
    win_ref[:, pl.ds(pl.multiple_of(base % _WIN, _CHUNK), _CHUNK)] = val

    # advance the pointer: slots with opos < next chunk's base (leading
    # -1 fill slots count as consumed so the invariant has no drift)
    nxt = base + _CHUNK
    for r in range(blks):
        cnt = jnp.sum(w_opos[r:r + 1, :] < nxt)
        ptr_ref[r] = offs[r] + cnt.astype(jnp.int32)


def expand_records(recfill: jnp.ndarray, n: jnp.ndarray, out_cap: int):
    """Expand cummax-filled parse records straight into bytes.

    recfill: int32[B, S] nondecreasing filled records ((opos << 13) |
    (is_copy << 11) | pay; -1 before the first record); S % 128 == 0 and
    S >= _RW. Replaces the two per-byte ownership merge sorts (~16 ms at
    the bench shape) with a carried slot pointer plus a per-byte binary
    search over a 768-slot VMEM window — a 128-byte chunk consumes at
    most ~529 slots (a decode lane outputs >= span/9 >= 227 bytes, so a
    chunk overlaps at most 2 lanes' slot ranges).

    Returns (out int32[B, out_cap], status int32[B]) with the same
    status bits as ``expand``.
    """
    b0, s = recfill.shape
    assert s % 128 == 0 and s >= _RW
    out_cap0 = out_cap
    out_cap = -(-out_cap // _CHUNK) * _CHUNK
    if b0 % 8 != 0:
        pad = 8 - b0 % 8
        recfill = jnp.concatenate(
            [recfill, jnp.full((pad, s), -1, recfill.dtype)], axis=0)
        n = jnp.concatenate([n, jnp.zeros(pad, n.dtype)])
    b = recfill.shape[0]
    blks = _BLKS if b % _BLKS == 0 else b
    nchunks = out_cap // _CHUNK

    out, status = pl.pallas_call(
        _expand_rec_kernel,
        grid=(b // blks, nchunks),
        in_specs=[
            pl.BlockSpec((blks, s), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blks, 1), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, blks, _CHUNK), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blks, 1), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((nchunks, b, _CHUNK), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((blks, _WIN), jnp.int32),
                        pltpu.VMEM((blks, _RW), jnp.int32),
                        pltpu.SMEM((blks,), jnp.int32)],
        interpret=_interpret(),
    )(recfill, n[:, None])
    out = jnp.swapaxes(out, 0, 1).reshape(b, out_cap)
    return out[:b0, :out_cap0], status[:b0, 0]
