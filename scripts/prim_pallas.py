"""Primitive microbenchmarks for round-4 kernel design decisions.

Measures, on the real chip:
  * lax.sort cost at the bench shape (floor for the sort-based encoder)
  * Pallas dynamic lane gather (take_along_axis) — does Mosaic lower it,
    and at what throughput
  * Pallas one-hot MXU gather for comparison
  * XLA take_along_axis baseline
"""
from __future__ import annotations

import sys
import time
import functools

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/lzs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bench import measure_rtt

REPS = 8


def timed(name, fn, *args):
    @jax.jit
    def run(a0, *rest):
        acc = jnp.int32(0)
        for _ in range(REPS):
            out = fn(jnp.bitwise_xor(a0, (acc & 1).astype(a0.dtype)), *rest)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + jnp.sum(leaf.astype(jnp.int32))
        return acc
    try:
        t0 = time.perf_counter()
        _ = np.asarray(run(*args))
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    s = max((best - RTT) / REPS, 1e-9)
    print(f"{name:40s} {s*1e3:9.3f} ms  (compile {comp:.1f}s)")
    return s


RTT = None


def main():
    global RTT
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    RTT = measure_rtt(jax, np)
    print(f"RTT {RTT*1e3:.1f} ms")
    rng = np.random.default_rng(0)

    B, N = 256, 32768
    key = jnp.asarray(rng.integers(0, 1 << 30, (B, N), np.int32))

    timed("lax.sort 1-op (256,32768) i32",
          lambda k: jax.lax.sort(k, dimension=1, is_stable=False), key)
    timed("lax.sort 2-op (256,32768) i32",
          lambda k: jax.lax.sort((k, k + 1), dimension=1, num_keys=1,
                                 is_stable=False), key)
    key16 = jnp.asarray(rng.integers(0, 1 << 15, (B, N), np.int32)
                        ).astype(jnp.uint16)
    timed("lax.sort 1-op (256,32768) u16",
          lambda k: jax.lax.sort(k, dimension=1, is_stable=False), key16)
    keyc = key.reshape(B * 8, N // 8)
    timed("lax.sort 1-op (2048,4096) i32",
          lambda k: jax.lax.sort(k, dimension=1, is_stable=False), keyc)

    # --- dynamic lane gather in Pallas: table rows of 128, idx rows of 128
    T = 65536  # rows
    tab = jnp.asarray(rng.integers(0, 1 << 20, (T, 128), np.int32))
    idx = jnp.asarray(rng.integers(0, 128, (T, 128), np.int32))

    def g_kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=-1)

    def pallas_gather(t, i):
        return pl.pallas_call(
            g_kernel,
            out_shape=jax.ShapeDtypeStruct(t.shape, t.dtype),
            grid=(T // 2048,),
            in_specs=[pl.BlockSpec((2048, 128), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((2048, 128), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i)

    timed("pallas lane-gather128 (65536,128) i32", pallas_gather, tab, idx)

    # gather from a 1024-entry table per row-group: (rows of 8x128 tiles)
    tab2 = jnp.asarray(rng.integers(0, 1 << 20, (512, 1024), np.int32))
    idx2 = jnp.asarray(rng.integers(0, 1024, (512, 8192), np.int32))

    def g2_kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            jnp.broadcast_to(t_ref[:], (8, 1024)).reshape(1, 8192)[
                :, :1024], i_ref[:, :1024], axis=-1) if False else (
            jnp.take_along_axis(t_ref[:], i_ref[:, :1024], axis=-1))

    def wide_gather(t, i):
        # gather with table width 1024 (lane dim 1024? must tile to 128)
        return pl.pallas_call(
            g2_kernel,
            out_shape=jax.ShapeDtypeStruct((512, 1024), t.dtype),
            grid=(4,),
            in_specs=[pl.BlockSpec((128, 1024), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, 8192), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, 1024), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i)

    timed("pallas wide-gather1024 (512x1024) i32", wide_gather, tab2, idx2)

    # XLA baseline
    timed("xla take_along_axis (65536,128) i32",
          lambda t, i: jnp.take_along_axis(t, i, axis=-1), tab, idx)

    # one-hot MXU gather in pallas for same shape
    def oh_kernel(t_ref, i_ref, o_ref):
        oh = (i_ref[:][:, :, None]
              == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
              ).astype(jnp.bfloat16)
        tv = t_ref[:].astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            oh, tv[:, :, None],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, :, 0].astype(jnp.int32)

    def oh_gather(t, i):
        return pl.pallas_call(
            oh_kernel,
            out_shape=jax.ShapeDtypeStruct(t.shape, t.dtype),
            grid=(T // 1024,),
            in_specs=[pl.BlockSpec((1024, 128), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((1024, 128), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i)

    timed("pallas onehot-mxu gather (65536,128)", oh_gather, tab, idx)


if __name__ == "__main__":
    main()
