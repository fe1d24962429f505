"""Generic batched big-table gather as a Pallas kernel.

out[b, q] = tab[b, idx[b, q]] for per-block tables far wider than the
128-lane dynamic-gather limit: the kernel loops over the table's
128-lane chunks, lane-gathers each, and selects by the index's high
bits. XLA's native gather runs ~10 ns/element serialized on TPU; this
runs at VPU rates (the 8-block x 128-query program does one gather +
select per 128-entry table chunk).

Used by the match-extension probes (sortmatch) to fetch compare spans
and diagonal run columns; the reference's equivalents are the pointer
walks in lzs_match_len (lzs-compression.c:178-191).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLKS = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gather_kernel(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]                                  # (BLKS, W)
    idx = idx_ref[:]                                  # (BLKS, Q)
    w = tab.shape[1]
    lane = idx & 127
    hi = idx >> 7
    acc = jnp.zeros_like(idx)
    for s in range(w // 128):
        g = jnp.take_along_axis(tab[:, s * 128:(s + 1) * 128], lane,
                                axis=-1)
        acc = jnp.where(hi == s, g, acc)
    out_ref[:] = acc


def gather_big(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b, q] = tab[b, clip(idx[b, q])] — int32[B, W], int32[B, Q].

    W % 128 == 0; indices are clamped to [0, W). Q % 128 == 0 (pad the
    query axis; B is padded to a multiple of 8 internally if needed).
    """
    b, w = tab.shape
    q = idx.shape[1]
    assert w % 128 == 0 and q % 128 == 0, (w, q)
    idx = jnp.clip(idx, 0, w - 1)
    # Mosaic's dynamic-gather lowering wants full (8, 128) tiles; pad
    # small batches up to the sublane count
    b0 = b
    if b % _BLKS != 0:
        pad = _BLKS - b % _BLKS
        tab = jnp.concatenate(
            [tab, jnp.zeros((pad, w), tab.dtype)], axis=0)
        idx = jnp.concatenate(
            [idx, jnp.zeros((pad, q), idx.dtype)], axis=0)
        b += pad
    blks = _BLKS
    qb = 128

    return pl.pallas_call(
        _gather_kernel,
        grid=(b // blks, q // qb),
        in_specs=[
            pl.BlockSpec((blks, w), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blks, qb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blks, qb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, q), jnp.int32),
        interpret=_interpret(),
    )(tab, idx)[:b0]
