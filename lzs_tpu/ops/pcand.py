"""Pallas glue kernels for the sort-based match search (sortmatch).

candidates_batch needs, per k level in [2, 12]: a segmented-id cummax, a
packed key build, two row sorts, a sorted-predecessor test, and a final
reduction over k. The sorts stay in XLA (lax.sort is near the VPU
compute bound when each call stays VMEM-resident — sortmatch splits them
into <=16 MB row groups); everything between them is fused here because
the same glue as individual XLA ops costs ~2-9 ms per pass at the bench
shape (XLA's cummax alone is ~3 ms, vs 0.1 ms for the roll-based
in-VMEM scan, scripts/prim_pallas2.py).

Kernels:
  keys_kernel    (plcp, p) -> packed level-k key (seg << 15 | pos),
                 seg via 15-round roll-cummax in VMEM.
  back_kernel    sorted keys -> back-sort keys (mypos << 16 | cand + 1)
                 with the window test inline.
  reduce_kernel  back-sorted planes for all k -> (score, off) via a
                 packed max over the k axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8                     # block rows per program


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll_cummax(v: jnp.ndarray) -> jnp.ndarray:
    """Row-wise cumulative max over the last axis via log-step rolls."""
    w = v.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    sh = 1
    while sh < w:
        r = pltpu.roll(v, sh, axis=v.ndim - 1)
        v = jnp.where(j >= sh, jnp.maximum(v, r), v)
        sh *= 2
    return v


def _keys_kernel(k_ref, plcp_ref, p_ref, out_ref):
    k = k_ref[0]
    plcp = plcp_ref[:]                               # (ROWS, N)
    rows, npos = plcp.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, npos), 1)
    seg = _roll_cummax(jnp.where(plcp < k, r, 0))
    out_ref[:] = (seg << 15) | p_ref[:]


def _back_kernel(window, skey_ref, out_ref):
    sk = skey_ref[:]                                 # (ROWS, N)
    j = jax.lax.broadcasted_iota(jnp.int32, sk.shape, 1)
    prev = jnp.where(j == 0, -1, pltpu.roll(sk, 1, axis=1))
    mypos = sk & 0x7FFF
    prevpos = prev & 0x7FFF
    same = (sk >> 15) == (prev >> 15)
    cand = jnp.where(same & (mypos - prevpos <= window), prevpos, -1)
    out_ref[:] = (mypos << 16) | (cand + 1)


def _acc_kernel(k_ref, back_ref, n_ref, pk_ref, out_ref):
    """Fold level k's back-sorted plane into the packed running max."""
    k = k_ref[0]
    back = back_ref[:]                               # (ROWS, N)
    rows, npos = back.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, npos), 1)
    nq = n_ref[:]                                    # (ROWS, 1)
    cand = (back & 0xFFFF) - 1
    hit = (cand >= 0) & (i + k <= nq)
    # high bits k (largest wins); low bits 32768 - off so ties in k
    # resolve to the nearest offset
    out_ref[:] = jnp.maximum(pk_ref[:], jnp.where(
        hit, (k << 16) | (32768 - (i - cand)), -1))


def _row_sort(keys, rows_per_call: int, num_keys: int = 1):
    """lax.sort along the last axis, split into VMEM-sized row groups.

    A single (256, 32768) int32 sort costs ~1.07 ms on v5e while two
    (128, 32768) calls cost 2 x 0.37 ms — XLA keeps a sort VMEM-resident
    only when the call is <= ~16 MB. ``keys`` may be one array or a
    tuple of operands (the first ``num_keys`` are comparator keys).
    """
    single = not isinstance(keys, (tuple, list))
    ops = (keys,) if single else tuple(keys)
    b = ops[0].shape[0]
    # the <=16 MB residency rule only pays off for single-operand sorts;
    # multi-operand comparators dominate and prefer fewer, larger calls
    # (measured: 2 x (128,32768) nk=3+payload beats 8 x (32,32768))

    def call(sl):
        return jax.lax.sort(tuple(o[sl] for o in ops),
                            dimension=ops[0].ndim - 1,
                            num_keys=num_keys, is_stable=False)

    if b <= rows_per_call:
        out = call(slice(None))
    else:
        parts = [call(slice(s, s + rows_per_call))
                 for s in range(0, b, rows_per_call)]
        out = tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                    for i in range(len(ops)))
    return out[0] if single else out


def perk_candidates(plcp: jnp.ndarray, p: jnp.ndarray, n: jnp.ndarray, *,
                    kmin: int, kmax: int, window: int):
    """(score, off) int32[B, N] from the sorted-rank inputs.

    plcp, p: int32[B, N] rank LCPs (capped at kmax) and sorted positions
    per block; n: int32[B] block lengths.
    """
    b, npos = plcp.shape
    nk = kmax - kmin + 1
    interp = _interpret()
    rb = _ROWS if b % _ROWS == 0 else b
    # whole-batch sort calls measure ~2% faster than 16 MB row splits
    # for the per-k single-operand sorts (25.6 vs 26.1 ms / 11 levels)
    rows_per_call = max(rb, (32 << 20) // (4 * npos))

    del nk
    spec2 = pl.BlockSpec((rb, npos), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((rb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ncol = n[:, None]

    # one lax.scan over the k levels: the body compiles ONCE (the
    # unrolled form costs ~25 s of XLA compile for 11 levels); k reaches
    # the kernels as a scalar SMEM operand
    def level(pk, k):
        karr = k[None]
        keys = pl.pallas_call(
            _keys_kernel,
            grid=(b // rb,),
            in_specs=[kspec, spec2, spec2], out_specs=spec2,
            out_shape=jax.ShapeDtypeStruct((b, npos), jnp.int32),
            interpret=interp,
        )(karr, plcp, p)
        skey = _row_sort(keys, rows_per_call)
        back_keys = pl.pallas_call(
            functools.partial(_back_kernel, window),
            grid=(b // rb,),
            in_specs=[spec2], out_specs=spec2,
            out_shape=jax.ShapeDtypeStruct((b, npos), jnp.int32),
            interpret=interp,
        )(skey)
        back = _row_sort(back_keys, rows_per_call)
        # NOTE: no input_output_aliases on pk — donating the running
        # accumulator measured 7 ms SLOWER over the 11 levels (the
        # alias forces XLA into extra copies/scheduling stalls here)
        pk = pl.pallas_call(
            _acc_kernel,
            grid=(b // rb,),
            in_specs=[kspec, spec2, nspec, spec2], out_specs=spec2,
            out_shape=jax.ShapeDtypeStruct((b, npos), jnp.int32),
            interpret=interp,
        )(karr, back, ncol, pk)
        return pk, None

    pk0 = jnp.full((b, npos), -1, jnp.int32)
    kv = jnp.arange(kmin, kmax + 1, dtype=jnp.int32)
    pk, _ = jax.lax.scan(level, pk0, kv)

    hitk = pk >= 0
    score = jnp.where(hitk, pk >> 16, 0)
    off = jnp.where(hitk, 32768 - (pk & 0xFFFF), 0)
    return score, off
