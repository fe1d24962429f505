"""Ablation timing of encode_block internals to locate hidden costs."""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lzs_jax_cache")
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_corpus, measure_rtt
    from lzs_tpu.blocks import pad_blocks
    from lzs_tpu.ops import bitpack, encode as enc_ops, sortmatch, tokenize
    from lzs_tpu import spec

    data = make_corpus(1 << 23)
    x_np, lens_np = pad_blocks(data, 1 << 15)
    x = jax.device_put(jnp.asarray(x_np.astype(np.int32)))
    lens = jax.device_put(jnp.asarray(lens_np))
    rtt = measure_rtt(jax, np)
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr)
    reps = 4

    def timed(name, fn, *fnargs):
        @jax.jit
        def run(a0, *rest):
            acc = jnp.int32(0)
            for _ in range(reps):
                out = fn(jnp.bitwise_xor(a0, (acc & 1).astype(a0.dtype)),
                         *rest)
                leaf = jax.tree_util.tree_leaves(out)[0]
                acc = acc + leaf.reshape(-1)[0].astype(jnp.int32)
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
        print(f"{name:34s} {s*1e3:9.2f} ms  (compile {comp:.0f}s)",
              file=sys.stderr)

    def upto(stage):
        def fn(xb, nb):
            xb = xb.astype(jnp.int32)
            score, off = sortmatch.candidates(xb, nb)
            if stage == "cand":
                return score + off
            full, capped = sortmatch.small_extension(xb, nb, score, off, 12)
            if stage == "smallext":
                return full + capped
            score, off, full = sortmatch.best_matches(xb, nb)
            if stage == "match":
                return score + off + full
            value, width, starts, length = tokenize.emission_units(
                xb, nb, score, off, full)
            if stage == "emit":
                return value + width
            value = jnp.concatenate([value, jnp.array(
                [spec.END_MARKER_VALUE], jnp.int32)])
            width = jnp.concatenate([width, jnp.array(
                [spec.END_MARKER_BITS], jnp.int32)])
            comp, total_bits, offs = bitpack.pack_bits(
                value, width, enc_ops.cap_bytes(xb.shape[0]))
            return comp.astype(jnp.int32)
        return jax.vmap(fn)

    for stage in ["cand", "smallext", "match", "emit", "pack"]:
        f = upto(stage)
        timed(f"upto {stage}", lambda a, b, f=f: f(a, b), x, lens)

    venc = jax.vmap(lambda a, b: enc_ops.encode_block(a, b))
    timed("encode_block", lambda a, b: venc(a, b), x, lens)


if __name__ == "__main__":
    main()
