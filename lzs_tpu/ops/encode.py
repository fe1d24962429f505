"""Full LZS encode pipeline (bytes -> bitstream) as a jittable function.

Stages: best-match table (match.py) -> token chain + emission units
(tokenize.py) -> prefix-sum bit pack (bitpack.py) -> end marker + padding.
Output is byte-identical to the reference C encoders for any input
(policy verified in tests against lzs_compress / lzs_simple_compress /
the incremental CLI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import spec
from . import bitpack, match, tokenize


def cap_bytes(block: int) -> int:
    """Static compressed-output capacity for a block of ``block`` bytes."""
    return spec.compressed_max(block) + 8


@functools.partial(jax.jit, static_argnames=("window", "cap", "chunk"))
def encode_block(x: jnp.ndarray, n: jnp.ndarray, *,
                 window: int = spec.WINDOW_SIZE,
                 cap: int = spec.SEARCH_MATCH_MAX,
                 chunk: int = 256):
    """Encode one block.

    Args:
      x: uint8/int32[N] block contents (only the first ``n`` bytes matter).
      n: int32 scalar true length.

    Returns:
      (comp: uint8[cap_bytes(N)], nbytes: int32) — the stream including the
      end marker and zero padding to a byte boundary.
    """
    x = x.astype(jnp.int32)
    score, off, full = match.best_matches(x, n, window=window, cap=cap,
                                          chunk=chunk)
    value, width = tokenize.emission_units(x, n, score, off, full)
    # append the end marker as one more unit
    value = jnp.concatenate([value, jnp.array([spec.END_MARKER_VALUE],
                                              jnp.int32)])
    width = jnp.concatenate([width, jnp.array([spec.END_MARKER_BITS],
                                              jnp.int32)])
    comp, total_bits = bitpack.pack_bits(value, width, cap_bytes(x.shape[0]))
    nbytes = (total_bits + 7) >> 3
    return comp, nbytes


def make_encoder(block: int, *, window: int = spec.WINDOW_SIZE,
                 cap: int = spec.SEARCH_MATCH_MAX, chunk: int = 256):
    """Return a jitted encoder over fixed block size, vmapped over a batch.

    The returned callable maps (uint8[B, block], int32[B]) ->
    (uint8[B, cap_bytes], int32[B]).
    """
    fn = functools.partial(encode_block, window=window, cap=cap, chunk=chunk)
    return jax.jit(jax.vmap(fn))


# ---------------------------------------------------------------------------
# Host convenience wrappers
# ---------------------------------------------------------------------------

def encode_bytes(data: bytes, block: int = 1 << 15) -> bytes:
    """Host helper: encode a whole byte string as one stream per block,
    concatenated (each block is an independent LZS stream with end marker).
    For reference-identical single-stream output use stream.py's exact mode.
    """
    import numpy as np

    out = bytearray()
    for start in range(0, max(len(data), 1), block):
        piece = data[start:start + block]
        x = np.zeros(block, np.uint8)
        x[:len(piece)] = np.frombuffer(piece, np.uint8)
        comp, nbytes = encode_block(jnp.asarray(x),
                                    jnp.int32(len(piece)))
        out += bytes(np.asarray(comp)[:int(nbytes)])
    return bytes(out)
