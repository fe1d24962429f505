"""Microbenchmarks of TPU primitives for the codec hot paths.

Timing methodology for the tunneled 'axon' platform: block_until_ready
does NOT sync there, and a host fetch costs ~29 ms RTT. So each
measurement chains REPS invocations inside one jitted function (data
dependency between reps forces sequential execution), ends with a tiny
reduction, fetches one scalar, and subtracts the separately measured RTT.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/lzs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, N = 64, 32768
REPS = 10


def measure_rtt():
    @jax.jit
    def triv(x):
        return x * 2
    x = jnp.float32(1.5)
    _ = np.asarray(triv(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np.asarray(triv(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


RTT = measure_rtt()
print(f"host-fetch RTT: {RTT*1e3:.2f} ms", file=sys.stderr)


def timed(name, chained_fn, *args, reps=REPS, per=1):
    """chained_fn must run its body `reps` times internally (data-chained)
    and return a small array/scalar. `per` = logical ops per rep."""
    fn = jax.jit(functools.partial(chained_fn, reps=reps))
    _ = np.asarray(fn(*args))          # compile + run once
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    ms = (best - RTT) * 1e3 / (reps * per)
    print(f"{name:46s} {ms:9.3f} ms/op")
    return ms


key = jax.random.PRNGKey(0)
u32 = jax.random.randint(key, (B, N), 0, 1 << 30, dtype=jnp.int32)
u32b = jax.random.randint(jax.random.PRNGKey(1), (B, N), 0, 1 << 30,
                          dtype=jnp.int32)


def chain(body):
    """Build a reps-chained runner from body: x -> x."""
    def run(x, *rest, reps=REPS):
        for i in range(reps):
            x = body(x ^ i, *rest)
        return x[..., :1]
    return run


# --- sorts ---
timed("lax.sort 1op (64,32K)",
      chain(lambda x: jax.lax.sort((x,), dimension=1, num_keys=1)[0]), u32)
timed("lax.sort 2op (64,32K)",
      chain(lambda x: jax.lax.sort((x, x + 1), dimension=1, num_keys=1)[0]),
      u32)
timed("lax.sort 4op 4key (64,32K)",
      chain(lambda x: jax.lax.sort((x, x + 1, x ^ 7, x * 3), dimension=1,
                                   num_keys=4)[0]), u32)
timed("lax.sort 4op 1key (64,32K)",
      chain(lambda x: jax.lax.sort((x, x + 1, x ^ 7, x * 3), dimension=1,
                                   num_keys=1)[0]), u32)


def batched10(x, reps=REPS):
    xs = jnp.broadcast_to(x[:, None, :], (B, 10, N)).reshape(B * 10, N)
    for i in range(reps):
        xs = jax.lax.sort((xs ^ i,), dimension=1, num_keys=1)[0]
    return xs[..., :1]


timed("lax.sort 1op (640,32K) [10x batch]", batched10, u32)


def _bitonic(x):
    n = x.shape[-1]
    logn = n.bit_length() - 1
    for k in range(1, logn + 1):
        size = 1 << k
        x = x.reshape(-1, n // size, size)
        lo, hi2 = x[..., :size // 2], jnp.flip(x[..., size // 2:], -1)
        x = jnp.concatenate(
            [jnp.minimum(lo, hi2), jnp.flip(jnp.maximum(lo, hi2), -1)], -1)
        for j in range(k - 2, -1, -1):
            stride = 1 << j
            x = x.reshape(-1, stride * 2)
            lo, hi2 = x[..., :stride], x[..., stride:]
            x = jnp.concatenate([jnp.minimum(lo, hi2),
                                 jnp.maximum(lo, hi2)], -1)
        x = x.reshape(-1, n)
    return x


timed("hand bitonic 1op (64,32K)",
      chain(lambda x: _bitonic(x).reshape(B, N)), u32)

# --- scatter / gather ---
timed("scatter-max 32K<-32K per block",
      chain(lambda x: jax.vmap(lambda d, v: jnp.full(
          (N,), -1, jnp.int32).at[d].max(v))(x & (N - 1), x)), u32)
timed("scatter-max 32K<-32K sorted idx",
      chain(lambda x: jax.vmap(lambda d, v: jnp.full(
          (N,), -1, jnp.int32).at[d].max(v, indices_are_sorted=True))(
          jax.lax.cummax(x & (N - 1), axis=1), x)), u32)
timed("xla gather 32K per block",
      chain(lambda x: jax.vmap(lambda v, i: v[i])(x, x & (N - 1))), u32)

# --- scans shaped like the decode parse ---


def scan_parse(x, reps=REPS):
    lanes = x[:, :160]

    def step(state, w):
        a, b = state
        for _ in range(28):
            a = a ^ (b >> 3) ^ w
            b = b + (a & 63)
        return (a, b), a

    for i in range(reps):
        xs = jnp.broadcast_to(lanes[None], (264, B, 160))
        (_, lanes), ys = jax.lax.scan(step, (lanes ^ i, lanes + 1), xs)
    return lanes[..., :1]


timed("scan 264x28op body (64,160)", scan_parse, u32)


def scan_parse_emit(x, reps=REPS):
    lanes = x[:, :160]

    def step(state, w):
        a, b = state
        outs = []
        for _ in range(4):
            a = a ^ (b >> 3) ^ w
            b = b + (a & 63)
            for _ in range(6):
                a = a + (b >> 5)
            outs.append(a)
        return (a, b), tuple(outs)

    for i in range(reps):
        xs = jnp.broadcast_to(lanes[None], (66, B, 160))
        (_, lanes), ys = jax.lax.scan(step, (lanes ^ i, lanes + 1), xs)
    return lanes[..., :1]


timed("scan 66x(4x7op) emit4 (64,160)", scan_parse_emit, u32)

# --- elementwise pass & cummax baselines ---
timed("cummax (64,32K)",
      chain(lambda x: jax.lax.cummax(x, axis=1)), u32)
timed("10 elementwise ops (64,32K)",
      chain(lambda x: functools.reduce(
          lambda a, i: (a ^ (a >> 3)) + i, range(10), x)), u32)

# --- mxu one-hot gather at decode-expansion shapes ---
sys.path.insert(0, ".")
from lzs_tpu.ops.vgather import mxu_gather


def mxu_g(x, reps=REPS):
    vals = x[:, :2048] & 0xFF
    idx = x[:, :1024] & 2047
    acc = idx
    for _ in range(reps):
        acc = mxu_gather(vals, acc & 2047)
    return acc[..., :1]


timed("mxu_gather 1024q/2048t per block", mxu_g, u32)
