"""Stage profiling v3 — consumes ALL output leaves (v2 only consumed the
first leaf, letting XLA dead-code-eliminate later stages: best_matches'
probe stage was DCE'd in isolation, hiding ~75 ms)."""

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
from lzs_tpu.ops import sortmatch, tokenize
from lzs_tpu.ops import encode as enc_ops

SIZE = 1 << 21
BLOCK = 1 << 15
REPS = 3


def measure_rtt():
    f = jax.jit(lambda x: x * 2)
    _ = np.asarray(f(1.5))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np.asarray(f(1.5))
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
    @jax.jit
    def run(x, *rest):
        acc = jnp.int32(0)
        for _ in range(reps):
            out = body(x ^ (acc & 1), *rest)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + leaf.reshape(-1)[0].astype(jnp.int32)
        return acc

    _ = np.asarray(run(x, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(x, *args))
        best = min(best, time.perf_counter() - t0)
    ms = (best - RTT) * 1e3 / reps
    print(f"{name:40s} {ms:9.2f} ms   {SIZE/(ms/1e3)/1e9:8.3f} GB/s")
    return ms


timed("candidates",
      lambda xx: jax.vmap(lambda a, b: sortmatch.candidates(a, b))(xx, n))


def bm_noprobe(a, b):
    sc, off = sortmatch.candidates(a, b)
    full, capped = sortmatch.small_extension(
        a, b, sc, off, 12)
    return sc, off, full, capped


timed("cand + small_extension",
      lambda xx: jax.vmap(bm_noprobe)(xx, n))
timed("best_matches (full, all leaves)",
      lambda xx: jax.vmap(lambda a, b: sortmatch.best_matches(a, b))(xx, n))


def probe_only(a, b):
    sc, off = sortmatch.candidates(a, b)
    full, capped = sortmatch.small_extension(a, b, sc, off, 12)
    i = jnp.arange(a.shape[0], dtype=jnp.int32)
    prev_c = jnp.concatenate([jnp.zeros(1, jnp.bool_), capped[:-1]])
    prev_o = jnp.concatenate([jnp.zeros(1, jnp.int32), off[:-1]])
    head = capped & (~prev_c | (off != prev_o))
    ext_h = sortmatch._probe_extension(a, b, i + 12, off, head)
    return ext_h


timed("cand + smallext + probe",
      lambda xx: jax.vmap(probe_only)(xx, n))
