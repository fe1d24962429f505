"""Greedy token-chain resolution and per-position emission units.

The greedy LZS tokenization is a chain: each token's start depends on the
previous token's length. Rather than walking it sequentially (the reference's
state machine, lzs-compression.c:301-448), we resolve the whole chain with
pointer doubling in O(log N) rounds of gathers/scatters:

  next[i]   = i + step[i]           (step = match length, or 1 for literal)
  starts    = orbit of 0 under next = {0, next(0), next^2(0), ...}

computed by the standard doubling recurrence
  R_{k+1} = R_k | next^{2^k}(R_k),   J_{k+1} = J_k o J_k
so R_K holds every token start after ceil(log2(N+1)) rounds.

Emission units: every token start carries its head unit (flag + literal, or
flag + offset + initial length code, <= 18 bits). Extension nibbles of a long
match (lzs-compression.c:417-431) are attributed to positions *inside* the
match (position start+1+t carries nibble t), so every position emits at most
one bounded-width unit and bit offsets become a single prefix sum.
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


def token_starts(step: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """bool[N]: True at greedy token start positions.

    step: int32[N] bytes consumed by a token starting at each position.
    """
    npos = step.shape[0]
    i = jnp.arange(npos, dtype=jnp.int32)
    nxt = jnp.where(i < n, jnp.minimum(i + step, npos), npos)
    j = jnp.concatenate([nxt, jnp.array([npos], jnp.int32)])   # sink at N
    r = jnp.zeros(npos + 1, jnp.bool_).at[0].set(True)
    rounds = max(1, (npos + 1).bit_length())
    for _ in range(rounds):
        r = r | jnp.zeros(npos + 1, jnp.bool_).at[j].max(r)
        j = j[j]
    return r[:npos] & (i < n)


@functools.partial(jax.jit, static_argnames=())
def emission_units(x: jnp.ndarray, n: jnp.ndarray, score: jnp.ndarray,
                   off: jnp.ndarray, full: jnp.ndarray):
    """Per-position emission units for the bit packer.

    Returns (value, width): int32[N] each. Width 0 means the position emits
    nothing. Values are right-aligned bit fields of the given width.
    """
    npos = x.shape[0]
    i = jnp.arange(npos, dtype=jnp.int32)
    is_match = score >= spec.MIN_MATCH
    length = jnp.where(is_match, full, 1)
    starts = token_starts(jnp.where(i < n, length, 1), n)

    # --- head units at token starts ---
    initial = jnp.minimum(length, spec.MAX_SHORT_LENGTH)
    lv = _LEN_VALUE[initial]
    lw = _LEN_WIDTH[initial]
    short = off <= spec.SHORT_OFFSET_MAX
    # match head: '1' + ('1'+off7 | '0'+off11) + length code
    off_field = jnp.where(short,
                          (1 << spec.SHORT_OFFSET_BITS) | off,
                          off)
    off_width = jnp.where(short, 1 + spec.SHORT_OFFSET_BITS,
                          1 + spec.LONG_OFFSET_BITS)
    match_v = ((((jnp.int32(1) << off_width) | off_field) << lw) | lv)
    match_w = 1 + off_width + lw
    head_v = jnp.where(is_match, match_v, x.astype(jnp.int32))
    head_w = jnp.where(is_match, match_w, 9)

    # --- extension nibbles attributed to in-match positions ---
    owner = jax.lax.cummax(jnp.where(starts, i, -1))
    own_len = length[jnp.clip(owner, 0)]
    own_ext = is_match[jnp.clip(owner, 0)] & (own_len >=
                                              spec.MAX_SHORT_LENGTH)
    t = i - owner - 1
    rest = own_len - spec.MAX_SHORT_LENGTH
    q = rest // spec.MAX_EXTENDED_LENGTH
    nib_count = q + 1
    is_nib = (~starts) & (owner >= 0) & own_ext & (t < nib_count) & (i < n)
    nib_v = jnp.where(t < q, spec.MAX_EXTENDED_LENGTH,
                      rest - q * spec.MAX_EXTENDED_LENGTH)

    value = jnp.where(starts, head_v, jnp.where(is_nib, nib_v, 0))
    width = jnp.where(starts, head_w, jnp.where(is_nib, 4, 0))
    return value, width
