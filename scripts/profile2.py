"""Correct-methodology stage profiling on the real chip.

block_until_ready does not sync on the tunneled axon platform, so each
stage is timed as REPS data-chained invocations inside one jit, ending
with a tiny host fetch; the separately measured fetch RTT is subtracted.
"""

from __future__ import annotations

import functools
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
REPS = 3


def measure_rtt():
    @jax.jit
    def triv(x):
        return x * 2
    xs = jnp.float32(1.5)
    _ = np.asarray(triv(xs))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np.asarray(triv(xs))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


RTT = measure_rtt()
print(f"RTT {RTT*1e3:.1f} ms", file=sys.stderr)

data = make_corpus(SIZE)
x_np, lens_np = pad_blocks(data, BLOCK)
x = jnp.asarray(x_np.astype(np.int32))
n = jnp.asarray(lens_np)


def timed(name, body, *args, reps=REPS):
    """body(perturbed_x, *args) -> pytree; chained by xor-perturbing x."""
    @jax.jit
    def run(x, *rest):
        acc = jnp.int32(0)
        for t in range(reps):
            out = body(x ^ (acc & 1), *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            acc = acc + leaf.reshape(-1)[0].astype(jnp.int32)
        return acc

    _ = np.asarray(run(x, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(x, *args))
        best = min(best, time.perf_counter() - t0)
    ms = (best - RTT) * 1e3 / reps
    print(f"{name:30s} {ms:9.2f} ms   {SIZE/ (ms/1e3) / 1e9:8.3f} GB/s")
    return ms


vb = lambda f, *a: jax.vmap(lambda xx, nn: f(xx, nn, *a))  # noqa: E731

timed("match: candidates",
      lambda xx: jax.vmap(lambda a, b: sortmatch.candidates(a, b))(xx, n), )
timed("match: best_matches",
      lambda xx: jax.vmap(lambda a, b: sortmatch.best_matches(a, b))(xx, n))

score, off, full = jax.jit(
    jax.vmap(lambda a, b: sortmatch.best_matches(a, b)))(x, n)


def tok_body(xx):
    return jax.vmap(tokenize.emission_units)(xx, n, score, off, full)


timed("tokenize: emission_units", tok_body)

value, width, starts, length = jax.jit(tok_body)(x)
CAP = enc_ops.cap_bytes(BLOCK)


def pack_body(v):
    em_v = jnp.concatenate(
        [v, jnp.full((v.shape[0], 1), spec.END_MARKER_VALUE, jnp.int32)],
        axis=1)
    em_w = jnp.concatenate(
        [width, jnp.full((width.shape[0], 1), spec.END_MARKER_BITS,
                         jnp.int32)], axis=1)
    return jax.vmap(lambda a, b: bitpack.pack_bits(a, b, CAP))(em_v, em_w)


timed("bitpack: pack_bits", pack_body, reps=REPS)


def enc_body(xx):
    return jax.vmap(lambda a, b: enc_ops.encode_block_sync(a, b))(xx, n)


timed("encode_block_sync total", enc_body)

comp, nbytes, sbit, sout, nsync = jax.jit(enc_body)(x)
SPAN = enc_ops.SYNC_SPAN


def parse_body(c):
    return jax.vmap(lambda cc, b, o: dec2_ops._parse(cc, b, o, SPAN))(
        c, sbit, sout)


timed("decode: parse", parse_body)


def dec_body(c):
    return jax.vmap(lambda cc, b, o, m: dec2_ops.decode_block_sync(
        cc, b, o, m, out_cap=BLOCK, span=SPAN))(c, sbit, sout, n)


timed("decode total", dec_body)

out = jax.jit(dec_body)(comp)
ok = np.array_equal(np.asarray(out, np.uint8), x_np)
print("round-trip:", "OK" if ok else "FAIL")
