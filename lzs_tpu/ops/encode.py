"""Full LZS encode pipeline (bytes -> bitstream) as a jittable function.

Stages: best-match table (sortmatch.py, sort-based; match.py exhaustive
variant selectable) -> token chain + emission units (tokenize.py) ->
prefix-sum bit pack (bitpack.py) -> end marker + padding. Output is
byte-identical to the reference C encoders for any input (policy verified
in tests against lzs_compress / lzs_simple_compress / the incremental CLI).

``encode_block_sync`` additionally emits decode sync metadata: parser-state
records at the last parse point before every multiple of ``span``
compressed bits, so the container-format decoder can parse one stream with
hundreds of independent lanes over statically located stream tiles (see
decode2.py — the fixed spacing is what makes the parallel parse
gather-free). Records live in the container framing only — the LZS payload
stays reference-compatible.
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
#: default compressed-bit span between sync records. Records sit at the last
#: parse point before every multiple of ``span`` bits, so decode lane l owns
#: a *statically located* word tile of the stream — the parse needs no
#: gathers. Must be a multiple of 32 and > 24 (the widest parse step).
SYNC_SPAN = 2048
#: widest parse step in bits: a token head is <= 17, a 6-nibble group is 24
MAX_STEP_BITS = 24
#: narrowest parse step in bits (a literal: flag + 8)
MIN_STEP_BITS = 9


def cap_bytes(block: int) -> int:
    """Static compressed-output capacity for a block of ``block`` bytes
    (multiple of 4, with slack for the word-granular packer)."""
    return (spec.compressed_max(block) + 11) & ~3


def sync_slots(block: int, span: int = SYNC_SPAN) -> int:
    """Static number of sync-record slots for a block."""
    return -(-(cap_bytes(block) * 8) // span) + 1


def sync_scan_len(span: int = SYNC_SPAN) -> int:
    """Static parse-step budget per decode lane for a given record span."""
    return -(-(span + MAX_STEP_BITS) // MIN_STEP_BITS) + 1


def _pipeline_batch(x, n, window, cap, chunk, backend, policy="greedy"):
    """Batched encode pipeline: x int32[B, N], n int32[B]."""
    x = x.astype(jnp.int32)
    nb, npos = x.shape
    if backend == "sort":
        score, off, full = sortmatch.best_matches_batch(
            x, n, window=window, cap=cap)
    else:
        score, off, full = jax.vmap(
            lambda a, b: match.best_matches(
                a, b, window=window, cap=cap, chunk=min(chunk, 256)))(x, n)
    if policy == "lazy":
        # 1-token-lookahead (lazy) selection: defer a match when the
        # next position holds a strictly longer one — emit a literal
        # instead (the gzip-style improvement over the C encoder's pure
        # greedy policy, lzs-compression.c:326-362). Streams stay valid
        # LZS; byte-parity with the C encoder is a greedy-only property.
        is_m = score >= spec.MIN_MATCH
        nxt_m = jnp.concatenate(
            [is_m[:, 1:], jnp.zeros((nb, 1), jnp.bool_)], axis=1)
        nxt_full = jnp.concatenate(
            [full[:, 1:], jnp.zeros((nb, 1), jnp.int32)], axis=1)
        defer = is_m & nxt_m & (nxt_full > full)
        score = jnp.where(defer, 0, score)
        full = jnp.where(defer, 1, full)
    else:
        assert policy == "greedy", policy
    value, width, starts, length = tokenize.emission_units_batch(
        x, n, score, off, full)
    # the end marker splices into the packed words arithmetically — an
    # N+1-th unit column would make every pack sort width-32769, which
    # pads to the next power of two and costs 3.4x on v5e
    comp, total_bits, offs = bitpack.pack_bits_batch(
        value, width, cap_bytes(npos),
        end_marker=(spec.END_MARKER_VALUE, spec.END_MARKER_BITS))
    nbytes = (total_bits + 7) >> 3
    return comp, nbytes, total_bits, offs, width, starts, off


@functools.partial(
    jax.jit,
    static_argnames=("window", "cap", "chunk", "backend", "policy"))
def encode_block(x: jnp.ndarray, n: jnp.ndarray, *,
                 window: int = spec.WINDOW_SIZE,
                 cap: int = spec.SEARCH_MATCH_MAX,
                 chunk: int = 4096, backend: str = "sort",
                 policy: str = "greedy"):
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
    comp, nbytes = _pipeline_batch(x[None], n[None], window, cap, chunk,
                                   backend, policy)[:2]
    return comp[0], nbytes[0]


@functools.partial(
    jax.jit,
    static_argnames=("window", "cap", "chunk", "backend", "policy"))
def encode_batch(x: jnp.ndarray, n: jnp.ndarray, *,
                 window: int = spec.WINDOW_SIZE,
                 cap: int = spec.SEARCH_MATCH_MAX,
                 chunk: int = 4096, backend: str = "sort",
                 policy: str = "greedy"):
    """Batched encode_block: (uint8[B, N], int32[B]) ->
    (uint8[B, cap_bytes(N)], int32[B]). ``policy`` is "greedy"
    (reference byte parity) or "lazy" (1-token lookahead, usually
    smaller output; still a valid LZS stream)."""
    comp, nbytes = _pipeline_batch(x, n, window, cap, chunk, backend,
                                   policy)[:2]
    return comp, nbytes


@functools.partial(
    jax.jit, static_argnames=("window", "cap", "chunk", "backend", "span"))
def encode_block_sync(x: jnp.ndarray, n: jnp.ndarray, *,
                      window: int = spec.WINDOW_SIZE,
                      cap: int = spec.SEARCH_MATCH_MAX,
                      chunk: int = 4096, backend: str = "sort",
                      span: int = SYNC_SPAN):
    """Encode one block and emit parse sync records.

    Record slot l >= 1 holds the parser state at the *last* parse point
    before bit ``span * l`` (one always exists within MAX_STEP_BITS of the
    boundary since no parse step spans more bits); slot 0 is the stream
    start. Decode lane l therefore parses only bits
    [span*l - MAX_STEP_BITS, span*(l+1)) — a statically located slice, so
    the decoder's word fetches stay inside a small per-lane tile.

    Returns:
      comp: uint8[cap_bytes(N)], nbytes: int32,
      sync_bit: int32[I] bit offset of each sync point,
      sync_out: int32[I] packed record: output byte offset (bits 0..16) |
        parser mode (bit 17) | current match offset (bits 18..28) — mode 1
        resumes inside an extension-nibble chain,
      nsync: int32 number of lanes (= ceil(token_bits / span)); remaining
      slots hold the stream-end sentinel: sync_bit = total token bits,
      sync_out = n.
    """
    out = encode_batch_sync(x[None], n[None], window=window, cap=cap,
                            chunk=chunk, backend=backend, span=span)
    return tuple(o[0] for o in out)


@functools.partial(
    jax.jit, static_argnames=("window", "cap", "chunk", "backend", "span",
                              "policy"))
def encode_batch_sync(x: jnp.ndarray, n: jnp.ndarray, *,
                      window: int = spec.WINDOW_SIZE,
                      cap: int = spec.SEARCH_MATCH_MAX,
                      chunk: int = 4096, backend: str = "sort",
                      span: int = SYNC_SPAN, policy: str = "greedy"):
    """Batched encode_block_sync (see its docstring for the record
    contract): (uint8[B, N], int32[B]) -> (comp, nbytes, sync_bit,
    sync_out, nsync) with a leading batch axis on every output."""
    assert span % 32 == 0 and span > MAX_STEP_BITS
    comp, nbytes, total_bits, offs, width, starts, off = _pipeline_batch(
        x, n, window, cap, chunk, backend, policy)
    sync_bit, sync_out, nsync = _sync_records_batch(
        total_bits, offs, width, starts, off, n, span)
    return comp, nbytes, sync_bit, sync_out, nsync


def _sync_records_batch(total_bits, offs, width, starts, off, n, span):
    from .pcand import _row_sort
    from . import psync

    b, npos = starts.shape
    # parse steps (a token head; every NIBBLES_PER_STEP extension
    # nibbles), parser-state records, and span-boundary crossing slots
    # all come from one fused psync kernel pass (see its docstring; as
    # XLA ops the two scans plus the elementwise chain cost ~8 ms at
    # the bench shape). Steps are <= MAX_STEP_BITS bits, so each step
    # crosses at most one boundary and every slot 1..nsync-1 receives
    # exactly one record; crossing slots are monotone in position, so
    # compacting them to dense slots is a single sort per key (XLA
    # scatters serialize on TPU; sorts stream).
    end_bits = total_bits - spec.END_MARKER_BITS
    nslots = sync_slots(npos, span)
    pb = max(16, (cap_bytes(npos) * 8 - 1).bit_length())
    cb = max(1, nslots.bit_length())
    assert pb + cb + 1 <= 31, (pb, cb)
    ko, kl, kh = psync.sync_keys(
        starts, width[:, :npos], off, offs[:, :npos], end_bits,
        span=span, nibbles=NIBBLES_PER_STEP,
        short_len=spec.MAX_SHORT_LENGTH,
        ext_len=spec.MAX_EXTENDED_LENGTH, pb=pb, cmax=nslots)
    rows = max(8, ((16 << 20) // (4 * npos)) & ~7)
    s_o = _row_sort(ko, rows)
    s_rl = _row_sort(kl, rows)
    s_rh = _row_sort(kh, rows)
    pmask = (1 << pb) - 1
    bit_s = s_o & pmask
    rec_s = ((s_rh & 0x1FFF) << 16) | (s_rl & 0xFFFF)
    zero = jnp.zeros((b, 1), jnp.int32)
    built_bit = jnp.concatenate([zero, bit_s[:, :nslots - 1]], axis=1)
    built_rec = jnp.concatenate([zero, rec_s[:, :nslots - 1]], axis=1)
    nsync = (end_bits + span - 1) // span
    slot = jnp.arange(nslots, dtype=jnp.int32)[None, :]
    sync_bit = jnp.where(slot < nsync[:, None], built_bit,
                         end_bits[:, None])
    sync_out = jnp.where(slot < nsync[:, None], built_rec, n[:, None])
    return sync_bit, sync_out, nsync


def make_encoder(block: int, *, window: int = spec.WINDOW_SIZE,
                 cap: int = spec.SEARCH_MATCH_MAX, chunk: int = 4096,
                 backend: str = "sort", sync: bool = False,
                 span: int = SYNC_SPAN, policy: str = "greedy"):
    """Return a jitted batch encoder over fixed block size.

    Maps (uint8[B, block], int32[B]) -> (uint8[B, cap_bytes], int32[B])
    plus (sync_bit, sync_out, nsync) when ``sync``.
    """
    del block
    if sync:
        return functools.partial(encode_batch_sync, window=window, cap=cap,
                                 chunk=chunk, backend=backend, span=span,
                                 policy=policy)
    return functools.partial(encode_batch, window=window, cap=cap,
                             chunk=chunk, backend=backend, policy=policy)


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
