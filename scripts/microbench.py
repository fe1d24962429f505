"""Microbenchmarks of TPU primitives used by the codec pipelines.

Answers, with measurements on the real chip:
  * lax.sort cost vs shape (is chunking the match search a win?)
  * XLA gather (jnp.take_along_axis) throughput
  * whether Pallas supports in-kernel lane gathers / scatters on this
    hardware, and what they cost
  * scan-step latency floor (bounds any sequential-scan design)
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lzs_jax_cache")
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import measure_rtt

    rtt = measure_rtt(jax, np)
    print(f"device {jax.devices()[0]}  rtt {rtt*1e3:.1f} ms")

    def timed(name, fn, *args, reps=8, elems=None):
        @jax.jit
        def run(a0, *rest):
            acc = jnp.int32(0)
            a = a0
            for _ in range(reps):
                out = fn(jnp.bitwise_xor(a, (acc & 1).astype(a.dtype)),
                         *rest)
                leaf = jax.tree_util.tree_leaves(out)[0]
                acc = acc + leaf.reshape(-1)[0].astype(jnp.int32)
            return acc
        try:
            _ = np.asarray(run(*args))
        except Exception as e:
            print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            return
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run(*args))
            best = min(best, time.perf_counter() - t0)
        s = max((best - rtt) / reps, 1e-9)
        extra = f"  {elems/s/1e9:7.2f} Gelem/s" if elems else ""
        print(f"{name:44s} {s*1e3:8.3f} ms{extra}")
        return s

    rng = np.random.default_rng(0)

    # ---- sorts ----
    for shape in [(256, 32768), (1024, 8192), (2048, 4096), (4096, 2048)]:
        x = jnp.asarray(rng.integers(0, 1 << 30, shape, dtype=np.int32))
        n = x.size
        timed(f"sort1 {shape}", lambda a: jax.lax.sort(a, dimension=1),
              x, elems=n)
    x = jnp.asarray(rng.integers(0, 1 << 30, (256, 32768), dtype=np.int32))
    y = jnp.asarray(rng.integers(0, 1 << 30, (256, 32768), dtype=np.int32))
    timed("sort2 (256,32768) 1key+1val",
          lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=1),
          x, y, elems=x.size)
    timed("sort4 (256,32768) 3key+1val",
          lambda a, b: jax.lax.sort((a, b, b, b), dimension=1, num_keys=3),
          x, y, elems=x.size)

    # ---- cumulative ops ----
    timed("cummax (256,32768)",
          lambda a: jax.lax.cummax(a, axis=1), x, elems=x.size)
    timed("cumsum (256,32768)",
          lambda a: jnp.cumsum(a, axis=1), x, elems=x.size)

    # ---- XLA gather ----
    idx = jnp.asarray(rng.integers(0, 32768, (256, 32768), dtype=np.int32))
    timed("take_along_axis (256,32768)",
          lambda a, i: jnp.take_along_axis(a, i, axis=1), x, idx,
          elems=x.size)
    small_idx = jnp.asarray(
        rng.integers(0, 32768, (256, 2048), dtype=np.int32))
    timed("take_along_axis (256,32768)->2048",
          lambda a, i: jnp.take_along_axis(a, i, axis=1), x, small_idx,
          elems=small_idx.size)

    # ---- XLA scatter ----
    timed("scatter-set (256,32768)",
          lambda a, i: jnp.zeros_like(a).at[
              jnp.arange(256)[:, None], i].set(a), x, idx, elems=x.size)

    # ---- pallas: lane gather in-kernel ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def pk_gather(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=-1)

    def pallas_gather(tab, idxs):
        return pl.pallas_call(
            pk_gather,
            out_shape=jax.ShapeDtypeStruct(idxs.shape, tab.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idxs)

    for shape in [(8, 1024), (256, 4096), (256, 32768)]:
        tab = jnp.asarray(
            rng.integers(0, 1 << 20, shape, dtype=np.int32))
        gidx = jnp.asarray(
            rng.integers(0, shape[1], shape, dtype=np.int32))
        timed(f"pallas take_along lane {shape}",
              lambda t, i: pallas_gather(t, i), tab, gidx, elems=tab.size)

    # gather along sublanes (axis 0)
    def pk_gather0(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    def pallas_gather0(tab, idxs):
        return pl.pallas_call(
            pk_gather0,
            out_shape=jax.ShapeDtypeStruct(idxs.shape, tab.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idxs)

    tab = jnp.asarray(rng.integers(0, 1 << 20, (1024, 256), dtype=np.int32))
    gidx = jnp.asarray(rng.integers(0, 1024, (1024, 256), dtype=np.int32))
    timed("pallas take_along sublane (1024,256)",
          lambda t, i: pallas_gather0(t, i), tab, gidx, elems=tab.size)

    # ---- pallas: scatter in-kernel (ref.at set with vector idx) ----
    def pk_scatter(idx_ref, val_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[idx_ref[:], :] = val_ref[:]

    def pallas_scatter(idxs, vals, m):
        return pl.pallas_call(
            pk_scatter,
            out_shape=jax.ShapeDtypeStruct((m, vals.shape[1]), vals.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idxs, vals)

    sidx = jnp.asarray(rng.permutation(1024).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 100, (1024, 256), dtype=np.int32))
    timed("pallas scatter rows (1024,256)",
          lambda i, v: pallas_scatter(i, v, 1024), sidx, vals,
          elems=vals.size)

    # ---- scan step latency floor ----
    def scan_floor(a, steps):
        def body(c, _):
            return c * 2 + 1, None
        c, _ = jax.lax.scan(body, a[0, 0], None, length=steps)
        return c
    for steps in [128, 1024]:
        timed(f"scan floor {steps} steps (scalar)",
              lambda a: scan_floor(a, steps), x)

    def scan_vec(a, steps):
        def body(c, _):
            return c * 2 + 1, None
        c, _ = jax.lax.scan(body, a, None, length=steps)
        return c
    timed("scan 128 steps (256,32768) body",
          lambda a: scan_vec(a, 128), x)


if __name__ == "__main__":
    main()
