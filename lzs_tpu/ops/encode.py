"""Full LZS encode pipeline (bytes -> bitstream) as a jittable function.

Stages: best-match table (sortmatch.py, sort-based; match.py exhaustive
variant selectable) -> token chain + emission units (tokenize.py) ->
prefix-sum bit pack (bitpack.py) -> end marker + padding. Output is
byte-identical to the reference C encoders for any input (policy verified
in tests against lzs_compress / lzs_simple_compress / the incremental CLI).

``encode_block_sync`` additionally emits decode sync metadata: token-start
records (bit offset, output offset) chosen every ~``sync_k`` parse steps,
so the container-format decoder can parse one stream with thousands of
independent lanes (see decode2.py). Records live in the container framing
only — the LZS payload stays reference-compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import spec
from . import bitpack, match, sortmatch, tokenize

#: nibbles consumed per parse step inside an extension run (decode2 contract:
#: a parse step sees >= 25 valid bits from one word fetch, so 6 nibbles)
NIBBLES_PER_STEP = 6
#: default parse steps per sync interval (boundaries may fall mid-token:
#: records carry parser mode/offset, so every interval is exactly this many
#: parse steps and the decode scan needs no mega-token slack)
SYNC_K = 512


def cap_bytes(block: int) -> int:
    """Static compressed-output capacity for a block of ``block`` bytes
    (multiple of 4, with slack for the word-granular packer)."""
    return (spec.compressed_max(block) + 11) & ~3


def max_token_cost(block: int) -> int:
    """Parse steps of the costliest single token: head + nibble groups."""
    q = max(0, -(-(block - spec.MAX_SHORT_LENGTH)
                 // spec.MAX_EXTENDED_LENGTH))
    return 1 + -(-q // NIBBLES_PER_STEP)


def sync_slots(block: int, sync_k: int = SYNC_K) -> int:
    """Static number of sync-record slots for a block."""
    return -(-(block + 2) // sync_k) + 1


def _pipeline(x, n, window, cap, chunk, backend):
    x = x.astype(jnp.int32)
    if backend == "sort":
        score, off, full = sortmatch.best_matches(
            x, n, window=window, cap=cap, chunk=chunk)
    else:
        score, off, full = match.best_matches(
            x, n, window=window, cap=cap, chunk=min(chunk, 256))
    value, width, starts, length = tokenize.emission_units(
        x, n, score, off, full)
    value = jnp.concatenate([value, jnp.array([spec.END_MARKER_VALUE],
                                              jnp.int32)])
    width = jnp.concatenate([width, jnp.array([spec.END_MARKER_BITS],
                                              jnp.int32)])
    comp, total_bits, offs = bitpack.pack_bits(value, width,
                                               cap_bytes(x.shape[0]))
    nbytes = (total_bits + 7) >> 3
    return comp, nbytes, total_bits, offs, width, starts, off


@functools.partial(jax.jit,
                   static_argnames=("window", "cap", "chunk", "backend"))
def encode_block(x: jnp.ndarray, n: jnp.ndarray, *,
                 window: int = spec.WINDOW_SIZE,
                 cap: int = spec.SEARCH_MATCH_MAX,
                 chunk: int = 4096, backend: str = "sort"):
    """Encode one block.

    Args:
      x: uint8/int32[N] block contents (only the first ``n`` bytes matter).
      n: int32 scalar true length.
      backend: "sort" (fast path) or "exhaustive" (brute-force reference
        kernel); both produce identical bytes.

    Returns:
      (comp: uint8[cap_bytes(N)], nbytes: int32) — the stream including the
      end marker and zero padding to a byte boundary.
    """
    comp, nbytes = _pipeline(x, n, window, cap, chunk, backend)[:2]
    return comp, nbytes


@functools.partial(
    jax.jit, static_argnames=("window", "cap", "chunk", "backend", "sync_k"))
def encode_block_sync(x: jnp.ndarray, n: jnp.ndarray, *,
                      window: int = spec.WINDOW_SIZE,
                      cap: int = spec.SEARCH_MATCH_MAX,
                      chunk: int = 4096, backend: str = "sort",
                      sync_k: int = SYNC_K):
    """Encode one block and emit parse sync records.

    Returns:
      comp: uint8[cap_bytes(N)], nbytes: int32,
      sync_bit: int32[I] bit offset of each sync point,
      sync_out: int32[I] packed record: output byte offset (bits 0..16) |
        parser mode (bit 17) | current match offset (bits 18..28) — mode 1
        resumes inside an extension-nibble chain,
      nsync: int32 number of valid records (remaining slots hold the
        stream-end sentinel: sync_bit = total token bits, sync_out = n).
    """
    npos = x.shape[0]
    comp, nbytes, total_bits, offs, width, starts, off = _pipeline(
        x, n, window, cap, chunk, backend)

    i = jnp.arange(npos, dtype=jnp.int32)
    # parse steps: a token head is one step; every NIBBLES_PER_STEP
    # extension nibbles are one step (decode2 consumes nibble runs)
    is_nib = (~starts) & (width[:npos] == 4)
    okey = jax.lax.cummax(
        jnp.where(starts, (i << 12) | jnp.minimum(off, 0xFFF), -1))
    owner_i = okey >> 12
    owner_off = okey & 0xFFF
    t = i - owner_i - 1
    is_step = starts | (is_nib & (t % NIBBLES_PER_STEP == 0))
    cc = jnp.cumsum(is_step.astype(jnp.int32)) - is_step
    boundary = is_step & (cc % sync_k == 0)

    # parser state at a boundary: output offset, mode, current offset.
    # A nibble group at chain index t extends output at owner+8+15*t.
    opos = jnp.where(starts, i,
                     owner_i + spec.MAX_SHORT_LENGTH
                     + spec.MAX_EXTENDED_LENGTH * t)
    rec = jnp.where(starts, i,
                    opos | (1 << 17) | (owner_off << 18))

    nslots = sync_slots(npos, sync_k)
    rank = jnp.cumsum(boundary) - 1
    dest = jnp.where(boundary, rank, nslots)
    # sentinel: end of token bits (before padding) / end of output
    end_bits = total_bits - spec.END_MARKER_BITS
    sync_bit = jnp.full(nslots, 0, jnp.int32).at[dest].set(
        offs[:npos], mode="drop")
    sync_out = jnp.full(nslots, 0, jnp.int32).at[dest].set(rec, mode="drop")
    nsync = jnp.sum(boundary.astype(jnp.int32))
    slot = jnp.arange(nslots, dtype=jnp.int32)
    sync_bit = jnp.where(slot < nsync, sync_bit, end_bits)
    sync_out = jnp.where(slot < nsync, sync_out, n)
    return comp, nbytes, sync_bit, sync_out, nsync


def make_encoder(block: int, *, window: int = spec.WINDOW_SIZE,
                 cap: int = spec.SEARCH_MATCH_MAX, chunk: int = 4096,
                 backend: str = "sort", sync: bool = False,
                 sync_k: int = SYNC_K):
    """Return a jitted encoder over fixed block size, vmapped over a batch.

    Maps (uint8[B, block], int32[B]) -> (uint8[B, cap_bytes], int32[B])
    plus (sync_bit, sync_out, nsync) when ``sync``.
    """
    if sync:
        fn = functools.partial(encode_block_sync, window=window, cap=cap,
                               chunk=chunk, backend=backend, sync_k=sync_k)
    else:
        fn = functools.partial(encode_block, window=window, cap=cap,
                               chunk=chunk, backend=backend)
    return jax.jit(jax.vmap(fn))


# ---------------------------------------------------------------------------
# Host convenience wrappers
# ---------------------------------------------------------------------------

def encode_bytes(data: bytes, block: int = 1 << 15) -> bytes:
    """Host helper: encode a whole byte string as one stream per block,
    concatenated (each block is an independent LZS stream with end marker).
    """
    import numpy as np

    out = bytearray()
    for start in range(0, max(len(data), 1), block):
        piece = data[start:start + block]
        x = np.zeros(block, np.uint8)
        x[:len(piece)] = np.frombuffer(piece, np.uint8)
        comp, nbytes = encode_block(jnp.asarray(x), jnp.int32(len(piece)))
        out += bytes(np.asarray(comp)[:int(nbytes)])
    return bytes(out)
