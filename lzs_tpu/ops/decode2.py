"""Sync-parallel LZS decode (the container fast path).

The bit-serial token parse is the sequential core of LZS decode
(lzs-decompression.c:459-743). The container format sidesteps it: the
encoder records parser state at the last parse point before every multiple
of ``span`` compressed bits (encode.encode_block_sync), so lane l of the
decoder owns the statically located bit range [span*l - 24, span*(l+1))
— its word fetches stay inside a per-lane tile of span/32 + 2 words that
is carved out of the stream with *reshapes only*. Per parse step a lane
reads one 32-bit window from its tile via a tiny one-hot dot product
(TPU has no fast per-lane gather; a 66-wide masked reduction is cheap and
vectorizes). A parse step consumes either one token head (<= 17 bits) or
a run of up to 6 extension nibbles (24 bits).

Expansion (LZ77 copy resolution) is a window-carry chunk scan: per output
chunk, each byte's ultimate source is strictly before its own token start
(a copy of length L > offset d wraps as src = start - d + (j - start) % d,
which also linearizes RLE chains), so sources either land in the carried
2 KiB window (one gather) or chain within the chunk (log2(chunk) gather
rounds). Both gathers run on the MXU (ops.vgather) instead of XLA's
serialized gather path.

Raw streams without sync metadata use ops.decode (the scan decoder, which
also implements the reference's corrupt-input semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import spec
from . import encode as enc
from .vgather import mxu_gather

_CHUNK = 256          # expansion chunk (bytes per scan step)
_WIN = 2048           # carried window capacity (>= WINDOW_SIZE)


def _lane_tiles(comp: jnp.ndarray, nslots: int, span: int):
    """Carve per-lane word tiles out of the stream with reshapes only.

    comp: uint8[C]. Returns float32[nslots, wpl + 2] hi/lo half-word
    planes, where tile[l, j] = word[wpl*l - 1 + j] (big-endian 32-bit
    words of the padded stream; out-of-range words are zero).
    """
    wpl = span // 32
    nwords = nslots * wpl
    b = comp.astype(jnp.int32)
    need = nwords * 4
    if b.shape[0] < need:
        b = jnp.concatenate([b, jnp.zeros(need - b.shape[0], jnp.int32)])
    else:
        b = b[:need]
    b = b.reshape(nwords, 4)
    w = (b[:, 0] << 24) | (b[:, 1] << 16) | (b[:, 2] << 8) | b[:, 3]
    cur = w.reshape(nslots, wpl)
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), w[:-1]])
    col0 = prev.reshape(nslots, wpl)[:, :1]
    nxt = jnp.concatenate([cur[1:, :1], jnp.zeros((1, 1), jnp.int32)])
    tile = jnp.concatenate([col0, cur, nxt], axis=1)      # [L, wpl + 2]
    hi = ((tile >> 16) & 0xFFFF).astype(jnp.float32)
    lo = (tile & 0xFFFF).astype(jnp.float32)
    return hi, lo


def _parse(comp: jnp.ndarray, sync_bit: jnp.ndarray, sync_out: jnp.ndarray,
           span: int):
    """Lane-parallel token parse of one block's stream.

    comp: uint8[C]; sync_bit: int32[L] record bit offsets (slot l is the
    last parse point before bit span*l; sentinel-filled past nsync);
    sync_out: int32[L] packed records — output offset (bits 0..16) |
    mode (bit 17) | current match offset (bits 18..28).
    Returns per-step segment arrays, each int32[scan_len, L]:
      kind (0 none / 1 literal / 2 copy), payload (literal byte or offset),
      length, opos.
    """
    nslots = sync_bit.shape[0]
    wpl = span // 32
    hi, lo = _lane_tiles(comp, nslots, span)
    iota = jnp.arange(wpl + 1, dtype=jnp.int32)[None, :]
    base = jnp.arange(nslots, dtype=jnp.int32) * wpl - 1

    end_bit = jnp.concatenate([sync_bit[1:], sync_bit[-1:]])
    scan_len = enc.sync_scan_len(span)

    def step(state, _):
        bitpos, outpos, mode, cur_off = state
        active = bitpos < end_bit
        q = jnp.clip((bitpos >> 5) - base, 0, wpl)
        oh = (iota == q[:, None]).astype(jnp.float32)
        # half-words combine exactly only in integer space (f32 mantissa
        # is 24 bits; a full 32-bit word would round)
        def fetch(plane):
            return jnp.sum(oh * plane, axis=1).astype(jnp.uint32)
        wa = (fetch(hi[:, :wpl + 1]) << 16) | fetch(lo[:, :wpl + 1])
        wb = (fetch(hi[:, 1:]) << 16) | fetch(lo[:, 1:])
        sh = (bitpos & 31).astype(jnp.uint32)
        w = (wa << sh) | jnp.where(sh == 0, jnp.uint32(0),
                                   wb >> (jnp.uint32(32) - sh))

        # --- NORMAL: one token head ---
        flag = (w >> 31).astype(jnp.int32)
        lit = ((w >> 23) & 0xFF).astype(jnp.int32)
        offflag = ((w >> 30) & 1).astype(jnp.int32)
        off7 = ((w >> 23) & 0x7F).astype(jnp.int32)
        off11 = ((w >> 19) & 0x7FF).astype(jnp.int32)
        l4 = jnp.where(offflag == 1,
                       ((w >> 19) & 0xF).astype(jnp.int32),
                       ((w >> 15) & 0xF).astype(jnp.int32))
        long_len = (l4 >> 2) == 3
        len_init = jnp.where(long_len, (l4 & 3) + 5, (l4 >> 2) + 2)
        lw = jnp.where(long_len, 4, 2)
        is_lit = flag == 0
        n_off = jnp.where(offflag == 1, off7, off11)
        n_kind = jnp.where(is_lit, 1, 2)
        n_len = jnp.where(is_lit, 1, len_init)
        n_consume = jnp.where(is_lit, 9,
                              1 + jnp.where(offflag == 1, 8, 12) + lw)
        n_mode = jnp.where((~is_lit) & long_len
                           & ((l4 & 3) == 3), 1, 0)

        # --- EXTENDED: up to 6 nibbles (24 valid bits) in one step ---
        nw = (~w | jnp.uint32(0xFF)).astype(jnp.uint32)
        lzn = jax.lax.clz(nw)
        nf = jnp.minimum((lzn >> 2).astype(jnp.int32), 6)
        whole = nf >= 6
        term = (w >> (jnp.uint32(28) - 4 * jnp.minimum(
            nf, 5).astype(jnp.uint32))) & 0xF
        e_len = jnp.where(whole, 6 * spec.MAX_EXTENDED_LENGTH,
                          spec.MAX_EXTENDED_LENGTH * nf
                          + term.astype(jnp.int32))
        e_consume = jnp.where(whole, 24, 4 * (nf + 1))
        e_mode = jnp.where(whole, 1, 0)

        is_ext = mode == 1
        kind = jnp.where(active, jnp.where(is_ext, 2, n_kind), 0)
        payload = jnp.where(is_ext, cur_off,
                            jnp.where(is_lit, lit, n_off))
        length = jnp.where(is_ext, e_len, n_len)
        consume = jnp.where(active,
                            jnp.where(is_ext, e_consume, n_consume), 0)
        new_mode = jnp.where(active,
                             jnp.where(is_ext, e_mode, n_mode), mode)
        new_off = jnp.where(active & (kind == 2) & ~is_ext, n_off, cur_off)
        out = (kind, payload,
               jnp.where(active, length, 0), outpos)
        state = (bitpos + consume, outpos + jnp.where(active, length, 0),
                 new_mode, new_off)
        return state, out

    init = (sync_bit, sync_out & 0x1FFFF,
            (sync_out >> 17) & 1,
            sync_out >> 18)
    _, (kind, payload, length, opos) = jax.lax.scan(
        step, init, None, length=scan_len)
    return kind, payload, length, opos


@functools.partial(jax.jit, static_argnames=("out_cap", "span"))
def decode_block_sync(comp: jnp.ndarray, sync_bit: jnp.ndarray,
                      sync_out: jnp.ndarray, n: jnp.ndarray, *,
                      out_cap: int, span: int = enc.SYNC_SPAN):
    """Decode one container block with sync metadata.

    Args:
      comp: uint8[C] compressed payload.
      sync_bit/sync_out: int32[I] sync records from encode_block_sync.
      n: int32 scalar decoded length.
      out_cap: static output capacity (the block size).

    Returns uint8[out_cap] (bytes past ``n`` are zero).
    """
    kind, payload, length, opos = _parse(comp, sync_bit, sync_out, span)
    kind, payload, length, opos = (a.reshape(-1)
                                   for a in (kind, payload, length, opos))

    # --- per-byte ownership: one packed scatter-max + cummax ---
    # key = opos(15+) << 12 | kind2(1) << 11 | payload(11)
    key = (opos << 12) | jnp.where(kind == 2, (1 << 11) | payload, payload)
    dest = jnp.where((kind > 0) & (length > 0), opos, out_cap)
    acc = jnp.full(out_cap, -1, jnp.int32).at[dest].max(key, mode="drop")
    acc = jax.lax.cummax(acc)
    seg_start = acc >> 12
    is_copy = (acc >> 11) & 1
    pay = acc & 0x7FF

    j = jnp.arange(out_cap, dtype=jnp.int32)
    d = jnp.maximum(pay, 1)
    src = seg_start - d + jax.lax.rem(j - seg_start, d)
    is_lit = (is_copy == 0) & (acc >= 0)
    litval = jnp.where(is_lit, pay, 0)
    src = jnp.where(is_lit | (acc < 0), j, src)

    # --- window-carry chunk expansion ---
    nchunks = out_cap // _CHUNK
    resolved0 = is_lit | (acc < 0)
    st_all = jnp.where(resolved0, 0x100 | litval, 0)

    def chunk_step(win, inp):
        st, src_c, res_c, base = inp
        # window hits
        widx = jnp.clip(src_c - (base - _WIN), 0, _WIN - 1)
        from_win = (~res_c) & (src_c < base)
        wvals = mxu_gather(win[None, :], widx[None, :])[0]
        st = jnp.where(from_win, 0x100 | wvals, st)
        # in-chunk chains: pointer doubling over (val, resolved, ptr) planes
        p = jnp.clip(src_c - base, 0, _CHUNK - 1)
        val = st & 0xFF
        res = st >> 8
        for _ in range(8):
            planes = jnp.stack([val, res, p], axis=-1)
            g = mxu_gather(planes[None], p[None])[0]
            hit = (res == 0) & (g[:, 1] == 1)
            val = jnp.where(hit, g[:, 0], val)
            res = jnp.where(hit, 1, res)
            p = jnp.where(res == 0, g[:, 2], p)     # ancestor's ancestor
        win = jnp.concatenate([win[_CHUNK:], val])
        return win, val

    src_r = src.reshape(nchunks, _CHUNK)
    st_r = st_all.reshape(nchunks, _CHUNK)
    res_r = resolved0.reshape(nchunks, _CHUNK)
    bases = jnp.arange(nchunks, dtype=jnp.int32) * _CHUNK
    _, out = jax.lax.scan(chunk_step, jnp.zeros(_WIN, jnp.int32),
                          (st_r, src_r, res_r, bases))
    out = out.reshape(-1)
    return jnp.where(j < n, out, 0).astype(jnp.uint8)


def make_decoder_sync(in_cap: int, out_cap: int, *,
                      span: int = enc.SYNC_SPAN):
    """Jitted batch decoder over container blocks with sync records."""
    fn = functools.partial(decode_block_sync, out_cap=out_cap,
                           span=span)
    return jax.jit(jax.vmap(fn))
