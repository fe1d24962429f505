"""Stage-level TPU timing for the encode/decode pipelines.

Times each pipeline stage separately with the chained-reps methodology
from bench.py (sequential data-dependent reps inside one jit; fetch RTT
subtracted) so the optimization target is evidence, not guesswork.

Usage: python scripts/profile_stages.py [--size BYTES] [--block N]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 23)
    ap.add_argument("--block", type=int, default=1 << 15)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--stages", type=str, default="")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lzs_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_corpus, measure_rtt
    from lzs_tpu.blocks import BlockCodec, pad_blocks
    from lzs_tpu.ops import bitpack, encode as enc_ops, decode2 as dec2
    from lzs_tpu.ops import sortmatch, tokenize

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    data = make_corpus(args.size)
    codec = BlockCodec(block=args.block)
    x_np, lens_np = pad_blocks(data, args.block)
    x = jax.device_put(jnp.asarray(x_np.astype(np.int32)))
    lens = jax.device_put(jnp.asarray(lens_np))
    rtt = measure_rtt(jax, np)
    print(f"RTT {rtt*1e3:.1f} ms, blocks {x.shape}", file=sys.stderr)
    reps = args.reps
    nbytes = len(data)

    def timed(name, fn, *fnargs):
        @jax.jit
        def run(a0, *rest):
            def body(acc, _):
                out = fn(jnp.bitwise_xor(a0, (acc & 1).astype(a0.dtype)),
                         *rest)
                # consume EVERY leaf with a full reduction: consuming one
                # element lets XLA slice-propagate the stage away (the
                # round-2 "parse 0.00 ms" lie)
                for leaf in jax.tree_util.tree_leaves(out):
                    acc = acc + jnp.sum(leaf.astype(jnp.int32))
                return acc, None
            acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=reps)
            return acc
        t0 = time.perf_counter()
        _ = np.asarray(run(*fnargs))
        comp = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run(*fnargs))
            best = min(best, time.perf_counter() - t0)
        flag = ""
        if best < rtt * 1.5:   # timing below fetch noise floor: untrusted
            flag = "  [WARN: < 1.5x RTT, unreliable]"
        s = max((best - rtt) / reps, 1e-9)
        print(f"{name:28s} {s*1e3:9.2f} ms   {nbytes/s/1e9:8.4f} GB/s   "
              f"(compile {comp:.1f}s){flag}", file=sys.stderr)
        return s

    want = set(args.stages.split(",")) if args.stages else None

    def on(name):
        return want is None or name in want

    # --- encode stages ---
    if on("cand"):
        timed("enc: candidates(sorts)",
              lambda a, b: sortmatch.candidates_batch(a, b), x, lens)
    score, off = jax.jit(sortmatch.candidates_batch)(x, lens)

    if on("ext"):
        timed("enc: extension",
              lambda a, b, s, o: sortmatch._extend_batch(a, b, s, o, 12),
              x, lens, score, off)

    if on("match"):
        timed("enc: best_matches(all)",
              lambda a, b: sortmatch.best_matches_batch(a, b), x, lens)
    score2, off2, full2 = jax.jit(sortmatch.best_matches_batch)(x, lens)

    i = jnp.arange(args.block, dtype=jnp.int32)

    def steps_of(s, f, n):
        is_m = (s >= 2) & (i < n)
        return jnp.where(i < n, jnp.where(is_m, f, 1), 1)

    steps = jax.jit(jax.vmap(steps_of))(score2, full2, lens)
    if on("starts"):
        timed("enc: token_starts",
              lambda st, n: jax.vmap(tokenize.token_starts)(st, n),
              steps, lens)

    vem = jax.vmap(lambda a, b, s, o, f: tokenize.emission_units(
        a, b, s, o, f))
    if on("emit"):
        timed("enc: emission_units",
              lambda a, b, s, o, f: vem(a, b, s, o, f),
              x, lens, score2, off2, full2)
    value, width, starts, length = jax.jit(vem)(x, lens, score2, off2, full2)

    cap_b = enc_ops.cap_bytes(args.block)
    if on("pack"):
        timed("enc: pack_bits",
              lambda v, w: bitpack.pack_bits_batch(v, w, cap_b),
              value, width)

    if on("encode"):
        timed("enc: encode_batch", lambda a, b: enc_ops.encode_batch(a, b),
              x, lens)
    vencs = enc_ops.encode_batch_sync
    if on("encode_sync"):
        timed("enc: encode_batch_sync", lambda a, b: vencs(a, b), x, lens)

    # --- decode stages ---
    comp, clen, sbit, sout, nsync = jax.jit(vencs)(x, lens)
    compi = comp.astype(jnp.int32)

    vparse = jax.vmap(lambda c, b, o: dec2._parse(
        c, b, o, enc_ops.SYNC_SPAN))
    if on("parse"):
        timed("dec: parse", lambda c, b, o: vparse(c, b, o),
              compi, sbit, sout)
    recs = jax.jit(vparse)(compi, sbit, sout)

    if on("fill"):
        timed("dec: record fill",
              lambda r: dec2._filled_records(r), recs)
    fill = jax.jit(dec2._filled_records)(recs)

    if on("expand"):
        from lzs_tpu.ops import pexpand
        timed("dec: expand_records",
              lambda f, n: pexpand.expand_records(f, n, args.block),
              fill, lens)

    if on("decode"):
        timed("dec: decode_batch_sync",
              lambda c, b, o, n: dec2.decode_batch_sync(
                  c.astype(jnp.uint8), b, o, n, out_cap=args.block),
              compi, sbit, sout, lens)


if __name__ == "__main__":
    main()
