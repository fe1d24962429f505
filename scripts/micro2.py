"""Micro: sort cost scaling vs batch rows; probe-structure variants."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/lzs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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


def timed(name, body, x, reps=4, nelem=None):
    @jax.jit
    def run(x):
        acc = jnp.int32(0)
        for _ in range(reps):
            out = body(x ^ (acc & 1))
            leaf = jax.tree_util.tree_leaves(out)[0]
            acc = acc + leaf.reshape(-1)[0].astype(jnp.int32)
        return acc

    _ = np.asarray(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(x))
        best = min(best, time.perf_counter() - t0)
    ms = (best - RTT) * 1e3 / reps
    per = f"   {nelem/(ms/1e3)/1e9:7.2f} Gelem/s" if nelem else ""
    print(f"{name:42s} {ms:9.2f} ms{per}")
    return ms


# --- sort scaling vs rows ---
for rows in (64, 256, 1024):
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 30, (rows, 32768),
                                          np.int32))
    timed(f"1-op sort ({rows},32768) axis-1", lambda v: jax.lax.sort(v),
          x, nelem=rows * 32768)

# axis-0 sorts (what candidates uses via vmap -> dimension=0 per block)
for rows in (64, 256):
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 30, (rows, 32768),
                                          np.int32))
    timed(f"vmapped 1-op sort ({rows},32768)",
          lambda v: jax.vmap(lambda r: jax.lax.sort(r))(v),
          x, nelem=rows * 32768)

# shorter rows
for ln in (8192, 16384):
    rows = (1 << 21) // ln
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 30, (rows, ln), np.int32))
    timed(f"1-op sort ({rows},{ln})", lambda v: jax.lax.sort(v),
          x, nelem=rows * ln)

# 2-op sort (key + payload)
x = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 30, (64, 32768),
                                                  np.int32))
timed("2-op sort (64,32768)",
      lambda v: jax.lax.sort((v, v + 1), dimension=1, num_keys=1)[0], x,
      nelem=64 * 32768)
timed("12-op sort (64,32768)",
      lambda v: jax.lax.sort(tuple(v + i for i in range(12)), dimension=1,
                             num_keys=1)[0], x, nelem=64 * 32768)
