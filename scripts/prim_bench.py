"""Primitive-cost microbenchmarks at the codec's shapes (TPU evidence base).

Measures the building blocks the encode/decode pipelines are assembled
from, with the chained-reps methodology from bench.py, so redesigns are
driven by measured costs rather than folklore.
"""
from __future__ import annotations

import os

import argparse
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lzs_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import measure_rtt
    from lzs_tpu.ops.vgather import mxu_gather

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rtt = measure_rtt(jax, np)
    print(f"RTT {rtt*1e3:.1f} ms", file=sys.stderr)
    reps = args.reps
    B, N = 256, 32768
    rng = np.random.default_rng(0)

    def timed(name, fn, *fnargs):
        if args.only and args.only not in name:
            return
        @jax.jit
        def run(a0, *rest):
            acc = jnp.int32(0)
            for _ in range(reps):
                out = fn(jnp.bitwise_xor(a0, (acc & 1).astype(a0.dtype)),
                         *rest)
                # consume EVERY leaf fully: one-element consumption
                # lets XLA slice-propagate whole ops away (this turned
                # several rows of this file into lies in round 2/3)
                for leaf in jax.tree_util.tree_leaves(out):
                    acc = acc + jnp.sum(leaf.astype(jnp.int32))
            return acc
        t0 = time.perf_counter()
        _ = np.asarray(run(*fnargs))
        comp = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run(*fnargs))
            best = min(best, time.perf_counter() - t0)
        s = max((best - rtt) / reps, 1e-9)
        print(f"{name:40s} {s*1e3:9.3f} ms", file=sys.stderr)
        return s

    x = jnp.asarray(rng.integers(0, 1 << 30, (B, N), np.int32))
    x2 = jnp.asarray(rng.integers(0, 1 << 30, (B, N), np.int32))
    x3 = jnp.asarray(rng.integers(0, 1 << 30, (B, N), np.int32))
    x4 = jnp.asarray(rng.integers(0, 1 << 30, (B, N), np.int32))

    # --- sorts ---
    timed("sort 1op (256,32768)", lambda a: jax.lax.sort(a, dimension=1), x)
    timed("sort 1key+1pay", lambda a, b: jax.lax.sort(
        (a, b), dimension=1, num_keys=1), x, x2)
    timed("sort 1key+3pay", lambda a, b, c, d: jax.lax.sort(
        (a, b, c, d), dimension=1, num_keys=1), x, x2, x3, x4)
    timed("sort 3key+1pay", lambda a, b, c, d: jax.lax.sort(
        (a, b, c, d), dimension=1, num_keys=3), x, x2, x3, x4)
    xl = jnp.asarray(rng.integers(0, 1 << 30, (B, 49664), np.int32))
    timed("sort 1op (256,49664)", lambda a: jax.lax.sort(a, dimension=1), xl)
    xs = jnp.asarray(rng.integers(0, 1 << 30, (B, 4096), np.int32))
    timed("sort 1op (256,4096)", lambda a: jax.lax.sort(a, dimension=1), xs)
    x11 = jnp.asarray(rng.integers(0, 1 << 30, (B, 11 * N), np.int32))
    timed("sort 1op (256,360448)", lambda a: jax.lax.sort(a, dimension=1),
          x11)

    # --- scans / elementwise ---
    timed("cummax (256,32768)", lambda a: jax.lax.cummax(a, axis=1), x)
    timed("flip-cummin", lambda a: jnp.flip(
        jax.lax.cummin(jnp.flip(a, 1), axis=1), 1), x)
    timed("elementwise 10ops", lambda a: (((a * 3 + 1) ^ (a >> 5))
                                          * ((a & 63) + 2) + (a >> 11)), x)

    # --- gathers ---
    idx2k = jnp.asarray(rng.integers(0, 2048, (B, N), np.int32))
    tab2k = jnp.asarray(rng.integers(0, 256, (B, 2048), np.int32))
    timed("mxu_gather T=2048 Q=32768 1pl",
          lambda i, t: mxu_gather(t, i & 2047), idx2k, tab2k)
    tab2k3 = jnp.asarray(rng.integers(0, 256, (B, 2048, 3), np.int32))
    timed("mxu_gather T=2048 Q=32768 3pl",
          lambda i, t: mxu_gather(t, i & 2047), idx2k, tab2k3)
    tabNk = jnp.asarray(rng.integers(0, 256, (B, N), np.int32))
    idxNk = jnp.asarray(rng.integers(0, N, (B, N), np.int32))
    timed("mxu_gather T=32768 Q=32768 1pl",
          lambda i, t: mxu_gather(t, i & (N - 1)), idxNk, tabNk)
    timed("xla take_along T=32768 Q=32768",
          lambda i, t: jnp.take_along_axis(t, i & (N - 1), axis=1),
          idxNk, tabNk)
    timed("xla take_along T=2048 Q=32768",
          lambda i, t: jnp.take_along_axis(t, i & 2047, axis=1),
          idx2k, tab2k)

    # --- small-table gathers for searchsorted-style ownership ---
    tab272 = jnp.asarray(rng.integers(0, 256, (B, 272), np.int32))
    idx272 = jnp.asarray(rng.integers(0, 272, (B, N), np.int32))
    timed("mxu_gather T=272 Q=32768 x8rounds",
          lambda i, t: sum(mxu_gather(t, (i + k) % 272)
                           for k in range(8)), idx272, tab272)

    # --- scan orchestration overhead ---
    def scan128(a):
        def step(c, inp):
            c = c + inp
            return c, c[:, :1]
        carry = jnp.zeros((B, 2048), jnp.int32)
        _, o = jax.lax.scan(step, carry, a.reshape(16, B, 2048))
        return o
    timed("scan 16 steps carry(256,2048)", scan128, x)

    def scan128b(a):
        def step(c, inp):
            c = jnp.concatenate([c[:, 256:], inp], axis=1)
            return c, c[:, :1]
        carry = jnp.zeros((B, 2048), jnp.int32)
        _, o = jax.lax.scan(step, carry, jnp.moveaxis(
            a.reshape(B, 128, 256), 1, 0))
        return o
    timed("scan 128 steps shift-window", scan128b, x)


if __name__ == "__main__" and not os.environ.get("PRIM_EXTRA"):
    main()


def extra() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lzs_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from bench import measure_rtt
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rtt = measure_rtt(jax, np)
    reps = args.reps
    rng = np.random.default_rng(0)

    def timed(name, fn, *fnargs):
        @jax.jit
        def run(a0, *rest):
            acc = jnp.int32(0)
            for _ in range(reps):
                out = fn(jnp.bitwise_xor(a0, (acc & 1).astype(a0.dtype)),
                         *rest)
                # consume EVERY leaf fully: one-element consumption
                # lets XLA slice-propagate whole ops away (this turned
                # several rows of this file into lies in round 2/3)
                for leaf in jax.tree_util.tree_leaves(out):
                    acc = acc + jnp.sum(leaf.astype(jnp.int32))
            return acc
        t0 = time.perf_counter()
        _ = np.asarray(run(*fnargs))
        comp = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run(*fnargs))
            best = min(best, time.perf_counter() - t0)
        s = max((best - rtt) / reps, 1e-9)
        print(f"{name:44s} {s*1e3:9.3f} ms", file=sys.stderr)

    for shape in [(2048, 4096), (4096, 4096), (1024, 8192), (2048, 8192),
                  (2048, 10432), (512, 16384), (256, 16896), (8192, 2048),
                  (16384, 1024)]:
        a = jnp.asarray(rng.integers(0, 1 << 30, shape, np.int32))
        nm = f"sort 1op {shape} [{shape[0]*shape[1]>>20}M]"
        timed(nm, lambda v: jax.lax.sort(v, dimension=1), a)
    a = jnp.asarray(rng.integers(0, 1 << 30, (2048, 4096), np.int32))
    b = jnp.asarray(rng.integers(0, 1 << 30, (2048, 4096), np.int32))
    c = jnp.asarray(rng.integers(0, 1 << 30, (2048, 4096), np.int32))
    d = jnp.asarray(rng.integers(0, 1 << 30, (2048, 4096), np.int32))
    timed("sort 1key+3pay (2048,4096)",
          lambda p, q, r, s_: jax.lax.sort((p, q, r, s_), dimension=1,
                                           num_keys=1), a, b, c, d)
    timed("sort 3key+1pay (2048,4096)",
          lambda p, q, r, s_: jax.lax.sort((p, q, r, s_), dimension=1,
                                           num_keys=3), a, b, c, d)
    timed("sort 2key (2048,4096)",
          lambda p, q: jax.lax.sort((p, q), dimension=1, num_keys=2), a, b)
    # vmapped dynamic_slice rows (tile extraction)
    flat = jnp.asarray(rng.integers(0, 1 << 30, (256, 16896), np.int32))
    starts = jnp.asarray(rng.integers(0, 10000, (256, 8), np.int32))
    def dslice(st, fl):
        def one(f, s0):
            return jax.vmap(lambda s: jax.lax.dynamic_slice(
                f, (s,), (6336,)))(s0)
        return jax.vmap(one)(fl, st)
    timed("vmapped dynamic_slice 8x6336 of 16896", dslice, starts, flat)
    # cummax at tiled shape
    timed("cummax (2048,4096)", lambda v: jax.lax.cummax(v, axis=1), a)


if __name__ == "__main__" and os.environ.get("PRIM_EXTRA"):
    extra()
