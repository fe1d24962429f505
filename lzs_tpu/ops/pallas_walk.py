"""Pallas TPU kernel for the greedy token-chain walk (token starts).

Drop-in accelerator for ``tokenize.token_starts`` (the 3-stage jump-table
resolution of the greedy LZS token chain, the reference's sequential state
walk lzs-compression.c:301-448). The XLA formulation materializes a
(rows, 128, 128) one-hot per pointer-doubling round in HBM (~3 GB of
traffic per round at the bench batch); this kernel keeps every jump table
VMEM-resident and performs the row-wise gathers as flat broadcast
selects, so the only HBM traffic is the step input and the starts output.

Structure per block (one grid step; the grid runs over the batch):
  1. 7 pointer-doubling rounds build jump tables A_t[i] = position after
     2^t token hops from i, frozen at the first position past i's
     128-wide tile. All 8 levels live in a VMEM scratch.
  2. The single sequential dependency — each tile's chain entry is the
     previous tile's chain exit — is a fori_loop over tile rows inside
     the kernel (dynamic row reads from the exit table; the per-step
     lane extract is a 128-wide masked sum).
  3. Descent: every position binary-searches down the jump tables from
     its tile's entry; position i is a token start iff the last chain
     position <= i is i itself.

``token_starts_walk`` carries a custom_vmap rule: batching maps to the
kernel grid (a plain vmap of a gridless pallas_call would instead try to
hold the whole batch in VMEM at once).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128
_ROUNDS = 7          # log2(_TILE)


def _row_gather(tbl: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[r, l] = tbl[r, idx[r, l]] for idx in [0, 128): two-level digit
    select — 8 row-chunk selects into a (r, 128, 16) register array, then
    a 16-way in-chunk select. Masks are converted to int32 and applied
    arithmetically: Mosaic rejects broadcast_in_dim on 1-bit vectors, so
    the 3-D selects avoid i1 broadcasts entirely. VPU only."""
    r, t = tbl.shape
    assert t == _TILE
    hi3 = (idx >> 4).reshape(r, _TILE, 1)           # int32 (r, 128, 1)
    sel = jnp.zeros((r, _TILE, 16), tbl.dtype)
    for h in range(8):
        m = (hi3 == h).astype(tbl.dtype)            # (r, 128, 1) int32
        chunk = tbl[:, 16 * h:16 * h + 16].reshape(r, 1, 16)
        sel = sel + m * chunk
    lo = idx & 15
    out = jnp.zeros_like(idx)
    for l in range(16):
        out = out + (lo == l).astype(tbl.dtype) * sel[:, :, l]
    return out


def _walk_kernel(step_ref, starts_ref, tables_ref, entry_ref):
    rows = step_ref.shape[1]
    base = jax.lax.broadcasted_iota(jnp.int32, (rows, _TILE), 0) * _TILE
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _TILE), 1)
    i_abs = base + lane

    # --- stage 1: pointer-doubling jump tables (all VMEM-resident) ---
    a = i_abs + jnp.maximum(step_ref[0], 1)
    tables_ref[0] = a
    for t in range(1, _ROUNDS + 1):
        g = _row_gather(a, jnp.clip(a - base, 0, _TILE - 1))
        a = jnp.where(a < base + _TILE, g, a)
        tables_ref[t] = a

    # --- stage 2: thread the chain entry tile by tile (sequential) ---
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, _TILE), 1)

    def entry_step(r, c):
        ex = tables_ref[_ROUNDS, pl.ds(r, 1), :]          # (1, 128)
        idx = c - r * _TILE
        inside = (idx >= 0) & (idx < _TILE)
        nxt = jnp.sum(jnp.where(lane_row == idx, ex, 0))
        entry_ref[pl.ds(r, 1), :] = jnp.full((1, _TILE), c, jnp.int32)
        return jnp.where(inside, nxt, c)

    jax.lax.fori_loop(0, rows, entry_step, jnp.int32(0))

    # --- stage 3: descent marking ---
    pos = entry_ref[:]
    for t in range(_ROUNDS - 1, -1, -1):
        nxt = _row_gather(tables_ref[t], jnp.clip(pos - base, 0, _TILE - 1))
        ok = (pos >= base) & (pos < base + _TILE) & (nxt <= i_abs)
        pos = jnp.where(ok, nxt, pos)
    starts_ref[0] = (pos == i_abs).astype(jnp.int32)


def _batched_call(steps: jnp.ndarray) -> jnp.ndarray:
    """steps: int32[B, N] -> int32[B, N] start flags (0/1)."""
    b, npos = steps.shape
    pad = (-npos) % _TILE
    if pad:
        steps = jnp.concatenate(
            [steps, jnp.ones((b, pad), steps.dtype)], axis=1)
    rows = steps.shape[1] // _TILE
    steps3d = steps.reshape(b, rows, _TILE)

    out = pl.pallas_call(
        _walk_kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, rows, _TILE), jnp.int32),
        in_specs=[pl.BlockSpec((1, rows, _TILE), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, rows, _TILE), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((_ROUNDS + 1, rows, _TILE), jnp.int32),
            pltpu.VMEM((rows, _TILE), jnp.int32),
        ],
        # the unrolled gather chains give Mosaic a deep live range; the
        # default 16M scoped-vmem budget is too tight at 256 rows
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(steps3d)
    return out.reshape(b, rows * _TILE)[:, :npos]


@jax.custom_batching.custom_vmap
def token_starts_walk(step: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """bool[N]: greedy token-start flags (drop-in for
    tokenize.token_starts). step: int32[N] token length at each position
    (>= 1 wherever i < n)."""
    flags = _batched_call(step[None, :])[0]
    return (flags != 0) & (jnp.arange(step.shape[0], dtype=jnp.int32) < n)


@token_starts_walk.def_vmap
def _token_starts_walk_vmap(axis_size, in_batched, step, n):
    step_b, n_b = in_batched
    if not step_b:
        step = jnp.broadcast_to(step, (axis_size,) + step.shape)
    if not n_b:
        n = jnp.broadcast_to(n, (axis_size,))
    flags = _batched_call(step)
    npos = step.shape[1]
    out = ((flags != 0)
           & (jnp.arange(npos, dtype=jnp.int32)[None, :] < n[:, None]))
    return out, True
