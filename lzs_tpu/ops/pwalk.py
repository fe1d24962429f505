"""Pallas token-walk kernel: greedy token-chain starts via VMEM gathers.

The greedy LZS tokenization is a sequential chain (the reference walks it
one token at a time, lzs-compression.c:301-448): position 0 starts a
token, and a token at i is followed by one at i + step[i]. This module
resolves all token starts for a whole batch of blocks with the same
three-stage pointer-doubling decomposition as tokenize._token_starts_xla
(in-tile jump tables -> tile-entry threading -> per-position descent),
but runs the gather-heavy stages as Pallas kernels whose jump tables stay
in VMEM and whose gathers are Mosaic dynamic lane gathers
(jnp.take_along_axis over the 128-lane dim).

Why: XLA has no fast dynamic gather on TPU — the one-hot MXU contraction
the XLA path uses measures 85 ms for the 8 MiB bench batch, while the
same gathers lane-native in Pallas measure ~0.03 ms per 8.4 M elements
(scripts/prim_pallas2.py). The walk drops to ~2 ms.

The raw-stream decoder (ops.bitpar) reuses this walk on a 9x larger
problem (one node per compressed BIT, ~300 K nodes/block), where kernel
launch count — not gather throughput — dominates. Stages 1 and 3
therefore batch several block rows per program (grid b/BR x t/RB instead
of b x t/RB), and the sequential entry-threading stage consumes _G tiles
per grid step instead of one.

Layout: blocks of N positions split into T = N/128 tiles of 128 lanes.
  Stage 1 (kernel): per tile, jump tables A_t[j] = position after 2^t
    token hops from j, frozen once the chain escapes the tile; 7 rounds
    of in-VMEM lane gathers. Emits all 7 levels + the tile exits.
  Stage 2 (kernel, sequential grid): entry position of tile t+1 = exit
    of the chain from tile t's entry — a (B,) carry threaded across a
    T/_G-length grid with _G masked-sum fetches per step.
  Stage 3 (kernel): every position descends the jump tables from its
    tile's entry; i is a token start iff the last chain position <= i
    is i itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128
_ROUNDS = 7                     # log2(_TILE)
_G = 8                          # tiles threaded per stage-2 grid step


def _row_block(t: int) -> int:
    # Mosaic block constraint: the second-to-last block dim must be a
    # multiple of 8 or equal to the whole array dim.
    for rb in (64, 32, 16, 8):
        if t % rb == 0:
            return rb
    return t


def _batch_rows(b: int) -> int:
    for br in (8, 4, 2):
        if b % br == 0:
            return br
    return 1


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tables_kernel(step_ref, tabs_ref, exit_ref):
    g = pl.program_id(1)
    step = step_ref[:]                                   # (BR, RB, 128)
    br, rows, lanes = step.shape
    m = br * rows                # Mosaic gathers are 2D-only: flatten
    s2 = step.reshape(m, lanes)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (m, lanes), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, lanes), 1)
    base = (g * rows + r2 % rows) * _TILE
    i = base + lane
    a = i + jnp.maximum(s2, 1)
    for t in range(_ROUNDS):
        tabs_ref[t] = a.reshape(br, rows, lanes)
        idx = jnp.clip(a - base, 0, _TILE - 1)
        gat = jnp.take_along_axis(a, idx, axis=-1)
        a = jnp.where(a < base + _TILE, gat, a)
    exit_ref[:] = a.reshape(br, rows, lanes)


def _entries_kernel(exit_ref, ent_ref, carry):
    t0 = pl.program_id(0)

    @pl.when(t0 == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    c = carry[:, 0]                                      # (B,)
    for gg in range(exit_ref.shape[0]):
        ex = exit_ref[gg]                                # (B, 128)
        base = (t0 * exit_ref.shape[0] + gg) * _TILE
        lane = jax.lax.broadcasted_iota(jnp.int32, ex.shape, 1)
        nxt = jnp.sum(jnp.where(lane == (c - base)[:, None], ex, 0),
                      axis=1)
        inside = (c >= base) & (c < base + _TILE)
        ent_ref[gg, :, 0] = c
        c = jnp.where(inside, nxt, c)
    carry[:] = jnp.broadcast_to(c[:, None], carry.shape)


def _descent_kernel(tabs_ref, ent_ref, starts_ref):
    g = pl.program_id(1)
    ent = ent_ref[:]                                     # (BR, RB, 1)
    br, rows = ent.shape[:2]
    m = br * rows
    r2 = jax.lax.broadcasted_iota(jnp.int32, (m, _TILE), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, _TILE), 1)
    base = (g * rows + r2 % rows) * _TILE
    i = base + lane
    pos = jnp.broadcast_to(ent.reshape(m, 1), (m, _TILE))
    for t in range(_ROUNDS - 1, -1, -1):
        tab = tabs_ref[t].reshape(m, _TILE)
        idx = jnp.clip(pos - base, 0, _TILE - 1)
        nxt = jnp.take_along_axis(tab, idx, axis=-1)
        ok = (pos >= base) & (pos < base + _TILE) & (nxt <= i)
        pos = jnp.where(ok, nxt, pos)
    starts_ref[:] = (pos == i).astype(jnp.int32).reshape(br, rows, _TILE)


@functools.partial(jax.jit, static_argnames=())
def walk_starts(step: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Token-start flags for a batch of blocks.

    Args:
      step: int32[B, N] bytes consumed by a token starting at each
        position (values < 1 are treated as 1). N % 128 == 0.
      n: int32[B] true lengths (positions >= n are never starts).

    Returns:
      bool[B, N] greedy token-start flags.
    """
    b, npos = step.shape
    assert npos % _TILE == 0
    t = npos // _TILE
    rb = _row_block(t)
    br = _batch_rows(b)
    interp = _interpret()
    stepr = step.astype(jnp.int32).reshape(b, t, _TILE)

    tabs, exits = pl.pallas_call(
        _tables_kernel,
        grid=(b // br, t // rb),
        in_specs=[pl.BlockSpec((br, rb, _TILE), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((_ROUNDS, br, rb, _TILE),
                         lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, rb, _TILE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((_ROUNDS, b, t, _TILE), jnp.int32),
            jax.ShapeDtypeStruct((b, t, _TILE), jnp.int32)],
        interpret=interp,
    )(stepr)

    gt = _G if t % _G == 0 else 1
    entries_t = pl.pallas_call(
        _entries_kernel,
        grid=(t // gt,),
        in_specs=[pl.BlockSpec((gt, b, _TILE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gt, b, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b, _TILE), jnp.int32)],
        interpret=interp,
    )(jnp.transpose(exits, (1, 0, 2)))
    entries = jnp.transpose(entries_t, (1, 0, 2))        # (B, T, 1)

    starts = pl.pallas_call(
        _descent_kernel,
        grid=(b // br, t // rb),
        in_specs=[
            pl.BlockSpec((_ROUNDS, br, rb, _TILE),
                         lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, rb, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, rb, _TILE), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, _TILE), jnp.int32),
        interpret=interp,
    )(tabs, entries)

    starts = starts.reshape(b, npos)
    i = jnp.arange(npos, dtype=jnp.int32)
    return (starts != 0) & (i[None, :] < n[:, None])
