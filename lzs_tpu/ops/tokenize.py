"""Greedy token-chain resolution and per-position emission units.

The greedy LZS tokenization is a chain: each token's start depends on the
previous token's length (the reference walks it as a state machine,
lzs-compression.c:301-448). Token starts are resolved here with a short
``lax.scan`` carrying a single "next token start" scalar per block — the
per-step body is a handful of vector selects (no gathers), and the scan is
unrolled ``_UNROLL`` positions per step so a 32 KiB block takes ~2K steps.

Emission units: every token start carries its head unit (flag + literal, or
flag + offset + initial length code, <= 18 bits). Extension nibbles of a long
match (lzs-compression.c:417-431) are attributed to positions *inside* the
match (position start+1+t carries nibble t), so every position emits at most
one bounded-width unit and bit offsets become a single prefix sum. Ownership
(which token a position lies in) is propagated gather-free: a packed
``cummax`` carries (start index, is_match) forward, and a reverse ``cummin``
of start indices gives each token's end, hence its length.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import spec

# Length code value/width tables indexed by initial length 0..8
# (lzs-compression.c:91-124). Entries 0/1 are unused.
_LEN_VALUE = jnp.array([0, 0, 0b00, 0b01, 0b10, 0b1100, 0b1101, 0b1110,
                        0b1111], jnp.int32)
_LEN_WIDTH = jnp.array([0, 0, 2, 2, 2, 4, 4, 4, 4], jnp.int32)

_UNROLL = 64
_BIG = jnp.int32(0x3FFFFFFF)


def token_starts(step: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """bool[N]: True at greedy token start positions.

    step: int32[N] bytes consumed by a token starting at each position
    (>= 1 wherever i < n).
    """
    npos = step.shape[0]
    pad = (-npos) % _UNROLL
    s = jnp.concatenate([step, jnp.ones(pad, step.dtype)]) if pad else step
    nsteps = s.shape[0] // _UNROLL
    xs = s.reshape(nsteps, _UNROLL)
    bases = jnp.arange(nsteps, dtype=jnp.int32) * _UNROLL

    def body(t, inp):
        sv, base = inp
        hits = []
        for u in range(_UNROLL):
            i = base + u
            hit = t == i
            t = jnp.where(hit, i + sv[u], t)
            hits.append(hit)
        return t, jnp.stack(hits)

    _, hits = jax.lax.scan(body, jnp.int32(0), (xs, bases))
    starts = hits.reshape(-1)[:npos]
    return starts & (jnp.arange(npos, dtype=jnp.int32) < n)


@jax.jit
def emission_units(x: jnp.ndarray, n: jnp.ndarray, score: jnp.ndarray,
                   off: jnp.ndarray, full: jnp.ndarray,
                   starts: jnp.ndarray | None = None):
    """Per-position emission units for the bit packer.

    Returns (value, width, starts, length):
      value, width: int32[N]; width 0 means the position emits nothing.
      starts: bool[N] token-start flags; length: int32[N] token length at
      starts (1 for literals). Pass precomputed ``starts`` to skip the walk.
    """
    npos = x.shape[0]
    i = jnp.arange(npos, dtype=jnp.int32)
    is_match = (score >= spec.MIN_MATCH) & (i < n)
    length = jnp.where(is_match, full, 1)
    if starts is None:
        starts = token_starts(jnp.where(i < n, length, 1), n)

    # --- head units at token starts ---
    initial = jnp.clip(jnp.minimum(length, spec.MAX_SHORT_LENGTH), 0, 8)
    lv = _LEN_VALUE[initial]
    lw = _LEN_WIDTH[initial]
    short = off <= spec.SHORT_OFFSET_MAX
    off_field = jnp.where(short, (1 << spec.SHORT_OFFSET_BITS) | off, off)
    off_width = jnp.where(short, 1 + spec.SHORT_OFFSET_BITS,
                          1 + spec.LONG_OFFSET_BITS)
    match_v = ((((jnp.int32(1) << off_width) | off_field) << lw) | lv)
    match_w = 1 + off_width + lw
    head_v = jnp.where(is_match, match_v, x.astype(jnp.int32))
    head_w = jnp.where(is_match, match_w, 9)

    # --- gather-free ownership propagation ---
    key = jnp.where(starts, (i << 1) | is_match.astype(jnp.int32), -1)
    ck = jax.lax.cummax(key)
    owner = ck >> 1
    own_match = (ck & 1) == 1
    nstart = jnp.where(starts, i, _BIG)
    rc = jnp.flip(jax.lax.cummin(jnp.flip(nstart)))     # next start >= j
    own_len = jnp.minimum(rc, n) - owner                # token length at j

    # --- extension nibbles attributed to in-match positions ---
    t = i - owner - 1
    rest = own_len - spec.MAX_SHORT_LENGTH
    q = jnp.maximum(rest, 0) // spec.MAX_EXTENDED_LENGTH
    is_nib = ((~starts) & (owner >= 0) & own_match
              & (own_len >= spec.MAX_SHORT_LENGTH)
              & (t < q + 1) & (i < n))
    nib_v = jnp.where(t < q, spec.MAX_EXTENDED_LENGTH,
                      rest - q * spec.MAX_EXTENDED_LENGTH)

    value = jnp.where(starts, head_v, jnp.where(is_nib, nib_v, 0))
    width = jnp.where(starts, head_w, jnp.where(is_nib, 4, 0))
    return value, width, starts, length
