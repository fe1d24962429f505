"""Sort-based LZS match search (the fast path).

Computes the same per-position greedy match decision as
``lzs_tpu.ops.match.best_matches`` (the exhaustive reference kernel) —
the policy pinned byte-identical to the reference C encoders
(lzs-compression.c:326-362, lzs-compression-simple.c:266-278; see
lzs_tpu.spec) — but in O(N log N) work instead of O(N * window):

  score[i] = max k in [2, 12] such that the k-gram at i occurs at some
             j in [i - 2047, i - 1]              (capped greedy score)
  off[i]   = i - j* where j* is the *nearest* such occurrence for k = score
  full[i]  = exact run length of the chosen offset (= score when score < 12)

Key identity: min(runlen(i, d), 12) >= k  <=>  the k-gram starting at i
equals the k-gram starting at i - d (overlap allowed, which handles the
self-referencing RLE case), so "best capped match" reduces to eleven
instances of "nearest previous equal k-gram within the window" — each
solved with one stable sort (grams as lexicographic keys, position as
tie-break): the predecessor of i inside its equal-key group is exactly
the nearest previous occurrence. Sorting is the TPU-native primitive
here; it replaces both the reference's sequential hash chains and the
quadratic windowed compare plane.

Positions are processed in window-aligned chunks (each chunk row carries
the preceding 2047+1 bytes of context plus an 11-byte gram tail) so sorts
run on short rows — the batched many-short-rows shape TPUs sort fastest.

Extension beyond the capped score (the COMPRESS_EXTENDED re-measure loop,
lzs-compression.c:417-431) splits by offset:
  * d <= 16: exact diagonal run tables (16 shifted equality columns with a
    reverse cumulative-min) — covers RLE / short-period data exactly.
  * d > 16: a probe loop extending 16 bytes per iteration with packed
    4-byte word compares; exact, data-dependent iteration count (long
    far-offset matches probe longer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import spec

_INVALID_KEY = jnp.int32(0x01000000)   # > any 24-bit gram chunk
_DIAG = 16                             # diagonals with exact run tables
_GRAM_TAIL = 12                        # bytes a 12-gram reads past a chunk
_BIG = jnp.int32(0x3FFFFFFF)

# Key schedule: k-gram keys as 24-bit chunks (gram3) plus an 8/16-bit tail.
# Entry: tuple of (byte_offset, gram_len) pairs, concatenated lexicographic.
_KEY_PLAN = {
    2: ((0, 2),),
    3: ((0, 3),),
    4: ((0, 3), (3, 1)),
    5: ((0, 3), (3, 2)),
    6: ((0, 3), (3, 3)),
    7: ((0, 3), (3, 3), (6, 1)),
    8: ((0, 3), (3, 3), (6, 2)),
    9: ((0, 3), (3, 3), (6, 3)),
    10: ((0, 3), (3, 3), (6, 3), (9, 1)),
    11: ((0, 3), (3, 3), (6, 3), (9, 2)),
    12: ((0, 3), (3, 3), (6, 3), (9, 3)),
}


def _shift(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """x[i + s] with zero padding at the end (last axis)."""
    if s == 0:
        return x
    pad = jnp.zeros(x.shape[:-1] + (s,), x.dtype)
    return jnp.concatenate([x[..., s:], pad], axis=-1)


def _gram(x: jnp.ndarray, off: int, glen: int) -> jnp.ndarray:
    """Big-endian gram value (<= 24 bits) starting at i + off."""
    g = jnp.zeros(x.shape, jnp.int32)
    for t in range(glen):
        g = (g << 8) | _shift(x, off + t)
    return g


def _nearest_prev(keys, pos, window):
    """Nearest previous same-key position per element of one row.

    keys: list of int32[M] lexicographic key parts; pos: int32[M] ascending.
    Returns int32[M] candidate position (row-local), or -1, in pos order.
    """
    operands = tuple(keys) + (pos,)
    out = jax.lax.sort(operands, dimension=0, num_keys=len(keys),
                       is_stable=True)
    spos = out[-1]
    same = jnp.ones(spos.shape, jnp.bool_)
    for ksorted in out[:-1]:
        same = same & (ksorted == jnp.concatenate(
            [jnp.full(1, -1, jnp.int32), ksorted[:-1]]))
    prev = jnp.concatenate([jnp.full(1, -1, jnp.int32), spos[:-1]])
    delta = spos - prev
    cand = jnp.where(same & (delta >= 1) & (delta <= window), prev, -1)
    # back to position order: a sort by position is ~5x cheaper than the
    # equivalent scatter on TPU
    return jax.lax.sort((spos, cand), dimension=0, num_keys=1,
                        is_stable=False)[1]


def _row_candidates(row: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                    window: int, cap: int):
    """Per-row greedy (score, off) via per-k sorts.

    row: int32[M] bytes. Valid data occupies row indices [lo, hi); entries
    outside are padding and must neither match nor be matched.
    Returns (score, off): int32[M] (off = 0 where no match).
    """
    m = row.shape[0]
    i = jnp.arange(m, dtype=jnp.int32)
    grams = {(o, g): _gram(row, o, g)
             for plan in _KEY_PLAN.values() for o, g in plan}
    score = jnp.zeros(m, jnp.int32)
    off = jnp.zeros(m, jnp.int32)
    for k in range(spec.MIN_MATCH, cap + 1):
        plan = _KEY_PLAN[k]
        keys = [grams[p] for p in plan]
        invalid = (i < lo) | (i + k > hi)
        keys[0] = jnp.where(invalid, _INVALID_KEY + i, keys[0])
        for t in range(1, len(keys)):
            keys[t] = jnp.where(invalid, 0, keys[t])
        cand = _nearest_prev(keys, i, window)
        hit = cand >= 0
        score = jnp.where(hit, k, score)
        off = jnp.where(hit, i - cand, off)
    return score, off


def _diag_runs(x: jnp.ndarray, n: jnp.ndarray, ndiag: int) -> jnp.ndarray:
    """runs[d-1, j] = run length of x[j+t] == x[j+t-d] (t >= 0), for
    d in 1..ndiag, capped at the data end ``n``."""
    npos = x.shape[0]
    j = jnp.arange(npos, dtype=jnp.int32)
    cols = []
    for d in range(1, ndiag + 1):
        prev = jnp.concatenate([jnp.zeros(d, x.dtype), x[:-d]])
        eq = (x == prev) & (j >= d) & (j < n)
        mm = jnp.where(eq, _BIG, j)
        rm = jnp.flip(jax.lax.cummin(jnp.flip(mm)))
        cols.append(jnp.maximum(jnp.minimum(rm, n) - j, 0))
    return jnp.stack(cols)


_PROBE_ITERS = 2      # tier-1 probes: exact for extensions <= 32 bytes
_PROBE_CAP = 1024     # compacted probe lanes per wave


def _probe_extension(x: jnp.ndarray, n: jnp.ndarray, base: jnp.ndarray,
                     doff: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Exact run extension for far offsets: length of the maximal run of
    x[a + t] == x[a + t - doff] (t >= 0) at a = base, for active lanes.

    Active lanes are first *compacted* (one cheap sort) into waves of
    _PROBE_CAP lanes so gather traffic scales with the active count, not
    the block size. Tier 1: a fixed number of 16-byte word-compare probes
    per wave (covers typical extensions). Tier 2: survivors are grouped by
    *distinct offset* and each group is closed with one elementwise
    diagonal-run column (reverse cumulative min) — linear total work even
    for very long periodic matches, where per-position probing would be
    quadratic.
    """
    npos = x.shape[0]
    cap = min(_PROBE_CAP, npos)
    xe = jnp.concatenate([x, jnp.zeros(19, jnp.int32)])
    w4 = ((xe[:-3] << 24) | (xe[1:-2] << 16) | (xe[2:-1] << 8) | xe[3:])
    wmax = w4.shape[0] - 1
    j = jnp.arange(npos, dtype=jnp.int32)

    def leading_eq(a, b):
        z = (a ^ b).astype(jnp.uint32)
        lz = jnp.where(z == 0, jnp.uint32(32), jax.lax.clz(z))
        return (lz >> 3).astype(jnp.int32)

    def wave(state):
        remaining, ln = state
        # compact: indices of up to `cap` active lanes (single-word sort)
        key = jnp.where(remaining, j, npos + j)
        idx = jax.lax.sort(key)[:cap] % npos
        lanes = remaining[idx]                     # False once exhausted
        cbase = base[idx]
        cdoff = jnp.maximum(doff[idx], 1)

        act = lanes
        cln = jnp.zeros(cap, jnp.int32)
        for _ in range(_PROBE_ITERS):
            a = cbase + cln
            b = a - cdoff
            ext = jnp.zeros(cap, jnp.int32)
            open_ = act
            for t in range(0, 16, 4):
                wa = w4[jnp.clip(a + t, 0, wmax)]
                wb = w4[jnp.clip(b + t, 0, wmax)]
                le = leading_eq(wa, wb)
                ext = ext + jnp.where(open_, le, 0)
                open_ = open_ & (le == 4)
            ext = jnp.minimum(ext, jnp.maximum(n - a, 0))  # cap at data end
            cln = cln + jnp.where(act, ext, 0)
            act = act & (ext == 16) & (cbase + cln < n)

        # tier 2: close long runs by distinct offset, one column at a time
        def t2_body(state2):
            act2, cln2 = state2
            d0 = jnp.min(jnp.where(act2, cdoff, _BIG))
            prev = jnp.where(j >= d0, jnp.roll(x, d0), -1)
            eq = (x == prev) & (j < n)
            mm = jnp.where(eq, _BIG, j)
            rm = jnp.flip(jax.lax.cummin(jnp.flip(mm)))
            col = jnp.maximum(jnp.minimum(rm, n) - j, 0)
            mine = act2 & (cdoff == d0)
            cln2 = jnp.where(mine, col[jnp.clip(cbase, 0, npos - 1)], cln2)
            return act2 & ~mine, cln2

        _, cln = jax.lax.while_loop(lambda s: jnp.any(s[0]), t2_body,
                                    (act, cln))
        ln = ln.at[idx].add(jnp.where(lanes, cln, 0), mode="drop")
        remaining = remaining & ~jnp.zeros(
            npos, jnp.bool_).at[idx].set(lanes, mode="drop")
        return remaining, ln

    _, length = jax.lax.while_loop(
        lambda s: jnp.any(s[0]), wave,
        (active, jnp.zeros(npos, jnp.int32)))
    return length


def candidates(x: jnp.ndarray, n: jnp.ndarray, *,
               window: int = spec.WINDOW_SIZE,
               cap: int = spec.SEARCH_MATCH_MAX,
               chunk: int = 4096):
    """Per-position greedy (score, off) via chunked per-k sorts."""
    x = x.astype(jnp.int32)
    npos = x.shape[0]
    chunk = min(chunk, npos)
    nrows = -(-npos // chunk)
    ctx = window + 1
    m = ctx + chunk + _GRAM_TAIL

    # Uniform rows out of a padded copy: row r = xp[r*chunk : r*chunk + m],
    # where xp carries ctx leading zeros.
    xp = jnp.concatenate(
        [jnp.zeros(ctx, jnp.int32), x,
         jnp.zeros(nrows * chunk + _GRAM_TAIL - npos, jnp.int32)])
    rows = jnp.stack([jax.lax.dynamic_slice(xp, (r * chunk,), (m,))
                      for r in range(nrows)])               # (R, M)
    bases = (jnp.arange(nrows, dtype=jnp.int32) * chunk) - ctx
    lo = jnp.maximum(-bases, 0)                             # first valid idx
    hi = jnp.clip(n - bases, 0, m)                          # end of data

    per_row = jax.vmap(
        lambda row, l, h: _row_candidates(row, l, h, window, cap))
    sc_rows, of_rows = per_row(rows, lo, hi)
    score = sc_rows[:, ctx:ctx + chunk].reshape(-1)[:npos]
    off = of_rows[:, ctx:ctx + chunk].reshape(-1)[:npos]
    return score, off


def small_extension(x: jnp.ndarray, n: jnp.ndarray, score: jnp.ndarray,
                    off: jnp.ndarray, cap: int):
    """(full, capped): exact run lengths where cheaply known.

    full is exact except where ``capped`` (score == cap with offset beyond
    the diagonal tables); there it holds the lower bound ``cap``.
    """
    npos = x.shape[0]
    i = jnp.arange(npos, dtype=jnp.int32)
    full = score
    need_ext = score >= cap
    runs = _diag_runs(x, n, _DIAG)                          # (DIAG, N)
    base = jnp.minimum(i + cap, npos - 1)
    ext_small = jnp.zeros(npos, jnp.int32)
    for d in range(1, _DIAG + 1):
        ext_small = jnp.where(off == d, runs[d - 1][base], ext_small)
    ext_small = jnp.where(i + cap < n, ext_small, 0)
    small = need_ext & (off <= _DIAG)
    full = jnp.where(small, cap + ext_small, full)
    capped = need_ext & (off > _DIAG) & (i + cap < n)
    return full, capped


@functools.partial(jax.jit, static_argnames=("window", "cap", "chunk"))
def best_matches(x: jnp.ndarray, n: jnp.ndarray, *,
                 window: int = spec.WINDOW_SIZE,
                 cap: int = spec.SEARCH_MATCH_MAX,
                 chunk: int = 4096):
    """Drop-in replacement for ``match.best_matches`` (sort-based).

    Args:
      x: int32[N] byte values of one block (padding beyond ``n`` ignored).
      n: int32 scalar true length.
      window / cap: LZS search parameters (2047 / 12 for reference parity).
      chunk: sort-row chunk length; each row adds window+1 bytes of left
        context and a 12-byte gram tail.

    Returns:
      (score, off, full): int32[N] each, as match.best_matches.
    """
    x = x.astype(jnp.int32)
    npos = x.shape[0]
    assert npos <= 1 << 15, "sort backend supports blocks up to 32768"
    i = jnp.arange(npos, dtype=jnp.int32)
    score, off = candidates(x, n, window=window, cap=cap, chunk=chunk)
    full, capped = small_extension(x, n, score, off, cap)

    # Far-offset extension, probed only at *region heads*: consecutive
    # capped positions with the same offset d satisfy
    # runlen(i+1, d) = runlen(i, d) - 1 (the run loses its first byte), so
    # one probe per maximal same-d run serves the whole run by subtraction.
    prev_c = jnp.concatenate([jnp.zeros(1, jnp.bool_), capped[:-1]])
    prev_o = jnp.concatenate([jnp.zeros(1, jnp.int32), off[:-1]])
    head = capped & (~prev_c | (off != prev_o))
    ext_h = _probe_extension(x, n, i + cap, off, head)
    pk = jax.lax.cummax(
        jnp.where(head, (i << 16) | jnp.minimum(cap + ext_h, 0xFFFF), -1))
    hfull = pk & 0xFFFF
    hpos = pk >> 16
    full = jnp.where(capped, hfull - (i - hpos), full)
    return score, off, full
