"""Stage-by-stage timing of the encode/decode pipelines on the real chip.

Not a test — a development tool for the performance work. Each stage is
jitted in isolation and timed with block_until_ready; outputs of earlier
stages are fed in so stage timings are additive.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/lzs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_corpus
from lzs_tpu.blocks import pad_blocks
from lzs_tpu.ops import bitpack, sortmatch, tokenize
from lzs_tpu.ops import encode as enc_ops
from lzs_tpu.ops import decode2 as dec2_ops
from lzs_tpu import spec

SIZE = 1 << 21
BLOCK = 1 << 15

data = make_corpus(SIZE)
x_np, lens_np = pad_blocks(data, BLOCK)
x = jnp.asarray(x_np.astype(np.int32))
n = jnp.asarray(lens_np)
print(f"blocks: {x.shape}", file=sys.stderr)


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    gbps = SIZE / t / 1e9
    print(f"{name:28s} {t*1e3:9.2f} ms   {gbps:8.3f} GB/s")
    return out


# ---- encode stages ----
@jax.jit
def s_candidates(x, n):
    return jax.vmap(lambda a, b: sortmatch.candidates(a, b))(x, n)

score, off = timed("match: candidates (sorts)", s_candidates, x, n)


@jax.jit
def s_smallext(x, n, score, off):
    return jax.vmap(lambda a, b, c, d: sortmatch.small_extension(
        a, b, c, d, spec.SEARCH_MATCH_MAX))(x, n, score, off)

full_s, capped = timed("match: small_extension", s_smallext, x, n, score, off)


@jax.jit
def s_full(x, n):
    return jax.vmap(lambda a, b: sortmatch.best_matches(a, b))(x, n)

score, off, full = timed("match: best_matches total", s_full, x, n)


@jax.jit
def s_tok(x, n, score, off, full):
    return jax.vmap(tokenize.emission_units)(x, n, score, off, full)

value, width, starts, length = timed("tokenize: emission_units",
                                     s_tok, x, n, score, off, full)


@jax.jit
def s_starts(score, full, n):
    npos = score.shape[1]
    i = jnp.arange(npos, dtype=jnp.int32)[None]
    is_match = (score >= spec.MIN_MATCH) & (i < n[:, None])
    step = jnp.where(i < n[:, None], jnp.where(is_match, full, 1), 1)
    return jax.vmap(tokenize.token_starts)(step, n)

timed("tokenize: token_starts only", s_starts, score, full, n)

CAP = enc_ops.cap_bytes(BLOCK)


@jax.jit
def s_pack(value, width):
    em_v = jnp.concatenate(
        [value, jnp.full((value.shape[0], 1), spec.END_MARKER_VALUE,
                         jnp.int32)], axis=1)
    em_w = jnp.concatenate(
        [width, jnp.full((width.shape[0], 1), spec.END_MARKER_BITS,
                         jnp.int32)], axis=1)
    return jax.vmap(lambda v, w: bitpack.pack_bits(v, w, CAP))(em_v, em_w)

comp, total_bits, offs = timed("bitpack: pack_bits", s_pack, value, width)


@jax.jit
def s_encode_sync(x, n):
    return jax.vmap(lambda a, b: enc_ops.encode_block_sync(a, b))(x, n)

comp, nbytes, sbit, sout, nsync = timed("encode_block_sync total",
                                        s_encode_sync, x, n)

# ---- decode stages ----
SPAN = enc_ops.SYNC_SPAN


@jax.jit
def s_parse(comp, sbit, sout):
    return jax.vmap(lambda c, b, o: dec2_ops._parse(c, b, o, SPAN))(
        comp, sbit, sout)

timed("decode: parse", s_parse, comp, sbit, sout)


@jax.jit
def s_dec(comp, sbit, sout, n):
    return jax.vmap(lambda c, b, o, m: dec2_ops.decode_block_sync(
        c, b, o, m, out_cap=BLOCK, span=SPAN))(comp, sbit, sout, n)

out = timed("decode total", s_dec, comp, sbit, sout, n)

ok = np.array_equal(np.asarray(out, np.uint8),
                    x_np)
print("round-trip:", "OK" if ok else "FAIL")
