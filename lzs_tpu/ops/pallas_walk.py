"""Pallas TPU kernel for the greedy token-chain walk (token starts).

Drop-in accelerator for ``tokenize.token_starts`` (the greedy LZS token
chain, the reference's sequential state walk lzs-compression.c:301-448).

Formulation: within a 128-wide tile, the local step map a(l) = l + step
is a functional graph with out-degree 1 whose edges point strictly
forward. Its hop matrix M (M[l, l'] = 1 iff a(l) = l', in-tile only) is
nilpotent and every power M^t is still 0/1 with at most one 1 per row,
so the MXU computes exact reachability in a handful of matmuls:

    P_0 = M,  P_{j+1} = P_j @ P_j            (= M^(2^j), entries 0/1)
    row(C) = e^T (I+P_0)(I+P_1)...(I+P_6)    (= e^T sum_{t<128} M^t)

bf16 is exact here: all values are 0/1 and row sums stay <= 1 (each
pair of lanes is connected by at most one path length). Everything the
walk needs falls out of that one closure row:
  * start flags of the tile = the entry lane's closure row;
  * the tile's exit = the unique chain position whose next hop leaves
    the tile (an int32 masked sum on the VPU — exact for any step size).

The single sequential dependency — tile t+1's chain entry is tile t's
chain exit — is a fori_loop over tiles carrying one scalar. No gathers,
no HBM one-hot materialization (the XLA fallback's cost): HBM traffic is
the step input and the starts output; the (128, 128) tile matrices stay
on-chip.

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
_DOUBLINGS = 7           # (I+P_0)...(I+P_6) covers path lengths < 128


def _walk_kernel(step_ref, starts_ref):
    rows = step_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _TILE), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 1)

    def tile_body(t, entry):
        base = t * _TILE
        st = step_ref[0, pl.ds(t, 1), :]                  # (1, 128)
        a_local = lane + jnp.maximum(st, 1)               # next hop, local

        # 0/1 in-tile hop matrix; bf16 keeps the matmuls on the MXU and
        # is exact for the 0/1 values involved (see module docstring)
        m = ((jnp.broadcast_to(a_local.reshape(_TILE, 1),
                               (_TILE, _TILE)) == col)
             & (a_local.reshape(_TILE, 1) < _TILE)).astype(jnp.bfloat16)

        le = entry - base
        inside = (le >= 0) & (le < _TILE)
        le_c = jnp.clip(le, 0, _TILE - 1)
        v = (lane == le_c).astype(jnp.bfloat16)           # (1, 128)

        p = m
        for j in range(_DOUBLINGS):
            # Mosaic requires 32-bit matmul accumulation; the 0/1 values
            # are exact in both widths, so the bf16 round-trip is free
            v = v + jnp.dot(
                v, p, preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16)
            if j + 1 < _DOUBLINGS:
                p = jnp.dot(
                    p, p, preferred_element_type=jnp.float32).astype(
                        jnp.bfloat16)

        # bf16 compares don't lower on this target: widen to f32 first
        on_chain = (v.astype(jnp.float32) > 0.5) & inside   # (1, 128)
        starts_ref[0, pl.ds(t, 1), :] = on_chain.astype(jnp.int32)

        # exit: the unique on-chain position whose next hop leaves the
        # tile. int32 masked sum — exact for arbitrarily long steps.
        leaves = on_chain & (a_local >= _TILE)
        exit_abs = base + jnp.sum(jnp.where(leaves, a_local, 0))
        return jnp.where(inside, exit_abs, entry)

    jax.lax.fori_loop(0, rows, tile_body, jnp.int32(0))


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
