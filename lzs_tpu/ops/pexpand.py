"""Pallas LZ77 copy-expansion kernel (the decode back half).

Expands per-byte covering-token records (from decode2._ownership_batch)
into output bytes with a carried 2 KiB circular window in VMEM —
replacing the XLA window-carry chunk scan whose MXU one-hot gathers cost
~45 ms at the 8 MiB bench batch. Eight blocks ride the sublane dim per
program; each chunk step does one two-level window gather (16 dynamic
lane gathers + selects over the circular window) and six pointer-
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


def _expand_kernel(acc_ref, seg_ref, n_ref, out_ref, st_ref, win_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        win_ref[:] = jnp.zeros_like(win_ref)
        st_ref[:] = jnp.zeros_like(st_ref)

    acc = acc_ref[0]                                     # (BLKS, CHUNK)
    seg_start = seg_ref[0]
    nb = n_ref[:]                                        # (BLKS, 1)
    base = c * _CHUNK
    j = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1) + base

    # compact entries: (is_start << 12) | (is_copy << 11) | pay; the
    # covering record's start comes precomputed (one XLA cummax over
    # the start flags). Parse records cover <= 98 bytes each (a token
    # head or one NIBBLES_PER_STEP nibble group), so src >= j - 97 -
    # 2047 is always within the carried window when it precedes the
    # chunk.
    is_copy = ((acc >> 11) & 1) == 1
    is_start = ((acc >> 12) & 1) == 1
    pay = acc & 0x7FF
    none = (~is_start) & (~is_copy)

    d = jnp.maximum(pay, 1)
    src = seg_start - d + jax.lax.rem(j - seg_start, d)
    is_lit = (~is_copy) & is_start & (~none)

    val = jnp.where(is_lit, pay, 0)
    res = is_lit | none

    # status: uncovered byte inside [0, n); far source (before block 0)
    bad_cov = none & (j < nb)
    bad_src = is_copy & (src < 0) & (j < nb)

    # window hits (src before this chunk); zero-fill negative sources
    from_win = (~res) & (src < base)
    wval = _win_gather(win_ref, jax.lax.rem(src + 2 * _WIN, _WIN))
    wval = jnp.where(src < 0, 0, wval)
    val = jnp.where(from_win, wval, val)
    res = res | from_win

    # in-chunk chains: pointer doubling over packed (res<<8|val, ptr)
    p = jnp.clip(src - base, 0, _CHUNK - 1)
    for _ in range(_ROUNDS):
        packed = (res.astype(jnp.int32) << 8) | val
        g = jnp.take_along_axis(packed, p, axis=-1)
        gp = jnp.take_along_axis(p, p, axis=-1)
        ghit = (g >> 8) == 1
        take = (~res) & ghit
        val = jnp.where(take, g & 0xFF, val)
        res = res | take
        p = jnp.where(res, p, gp)

    out_ref[0] = jnp.where(j < nb, val, 0)
    st_ref[:, 0] = (st_ref[:, 0]
                    | jnp.any(bad_cov, axis=1).astype(jnp.int32)
                    | (jnp.any(bad_src, axis=1).astype(jnp.int32) << 1))

    # slide the circular window
    win_ref[:, pl.ds(pl.multiple_of(base % _WIN, _CHUNK), _CHUNK)] = val


def expand(acc: jnp.ndarray, n: jnp.ndarray):
    """Expand per-byte token records into bytes.

    acc: int32[B, N] compact per-byte entries from
    decode2._ownership_batch: (is_start << 12) | (is_copy << 11) | pay,
    zero where no record covers the byte.
    n: int32[B] true lengths. Returns (out int32[B, N], status int32[B]).
    """
    b0, npos0 = acc.shape
    if npos0 % _CHUNK != 0:
        acc = jnp.concatenate(
            [acc, jnp.zeros((b0, _CHUNK - npos0 % _CHUNK), acc.dtype)],
            axis=1)
    npos = acc.shape[1]
    nchunks = npos // _CHUNK
    # Mosaic's dynamic-gather lowering wants full (8, 128) tiles; pad
    # small batches up to the sublane count
    if b0 % 8 != 0:
        pad = 8 - b0 % 8
        acc = jnp.concatenate(
            [acc, jnp.zeros((pad, npos), acc.dtype)], axis=0)
        n = jnp.concatenate([n, jnp.zeros(pad, n.dtype)])
    b = acc.shape[0]
    blks = _BLKS if b % _BLKS == 0 else b
    j = jnp.arange(npos, dtype=jnp.int32)[None, :]
    seg = jax.lax.cummax(
        jnp.where(((acc >> 12) & 1) == 1, j, -1), axis=1)
    # chunk dim leads so the per-step block keeps Mosaic-legal trailing
    # dims (blks, _CHUNK)
    acc3 = jnp.swapaxes(acc.reshape(b, nchunks, _CHUNK), 0, 1)
    seg3 = jnp.swapaxes(seg.reshape(b, nchunks, _CHUNK), 0, 1)

    tile_spec = pl.BlockSpec((1, blks, _CHUNK), lambda i, c: (c, i, 0),
                             memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((blks, 1), lambda i, c: (i, 0),
                            memory_space=pltpu.VMEM)
    out, status = pl.pallas_call(
        _expand_kernel,
        grid=(b // blks, nchunks),
        in_specs=[tile_spec, tile_spec, col_spec],
        out_specs=[tile_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nchunks, b, _CHUNK), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((blks, _WIN), jnp.int32)],
        interpret=_interpret(),
    )(acc3, seg3, n[:, None])
    out = jnp.swapaxes(out, 0, 1).reshape(b, npos)
    return out[:b0, :npos0], status[:b0, 0]
