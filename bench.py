"""Benchmark: LZS encode+decode throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Baseline (BASELINE.md section B): reference C incremental CLI on this
container's CPU — 19 MB/s encode, 88 MB/s decode, i.e. 15.6 MB/s
round-trip (harmonic combination). vs_baseline is measured round-trip
GB/s divided by that floor.

Pipeline measured: the container fast path — sort-based batch encoder with
sync-record emission, sync-parallel decoder — on device-resident data
(host marshalling excluded; first call compiles and is excluded).

Corpus: Silesia/enwik8 are not available offline, so a deterministic
mixed corpus is synthesized (source text, RLE runs, structured binary,
incompressible random) with a fixed seed; ~40% one-pass compression
ratio, comparable to the C-source baseline measurement.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import random
import sys
import time

import numpy as np

BASELINE_ROUNDTRIP_GBPS = 0.015632  # GB/s, see module docstring


def make_corpus(size: int, seed: int = 2026) -> bytes:
    rng = random.Random(seed)
    here = pathlib.Path(__file__).parent
    texts = []
    for p in sorted(here.glob("lzs_tpu/**/*.py")):
        texts.append(p.read_bytes())
    text = b"\n".join(texts) or b"fallback text corpus "
    parts = []
    total = 0
    while total < size:
        k = rng.randrange(10)
        if k < 5:  # source text slices
            a = rng.randrange(len(text))
            piece = text[a:a + rng.randrange(2000, 20000)]
        elif k < 7:  # RLE runs
            piece = bytes([rng.randrange(256)]) * rng.randrange(50, 4000)
        elif k < 9:  # structured binary (records with shared prefixes)
            rec = bytes(rng.randrange(256) for _ in range(16))
            piece = b"".join(rec[:12] + bytes([rng.randrange(256)]) * 4
                             for _ in range(rng.randrange(20, 200)))
        else:  # incompressible
            piece = bytes(rng.randrange(256)
                          for _ in range(rng.randrange(500, 5000)))
        parts.append(piece)
        total += len(piece)
    return b"".join(parts)[:size]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 23)
    ap.add_argument("--block", type=int, default=1 << 15)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--verify", action="store_true", default=True)
    ap.add_argument("--no-verify", dest="verify", action="store_false")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lzs_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lzs_tpu.blocks import BlockCodec, pad_blocks

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    data = make_corpus(args.size)
    codec = BlockCodec(block=args.block)
    x, lens = pad_blocks(data, args.block)
    xj, lj = jax.device_put(jnp.asarray(x)), jax.device_put(jnp.asarray(lens))

    # warm up / compile
    comp, clens, sbit, sout, nsync = codec.encode_batch(xj, lj)
    jax.block_until_ready(comp)

    enc_t = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        comp, clens, sbit, sout, nsync = codec.encode_batch(xj, lj)
        jax.block_until_ready(comp)
        enc_t.append(time.perf_counter() - t0)
    enc_s = min(enc_t)

    out = codec.decode_batch(comp, sbit, sout, lj)
    jax.block_until_ready(out)
    dec_t = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = codec.decode_batch(comp, sbit, sout, lj)
        jax.block_until_ready(out)
        dec_t.append(time.perf_counter() - t0)
    dec_s = min(dec_t)

    nbytes = len(data)
    clens_np = np.asarray(clens)
    csize = int(clens_np.sum())
    ratio = csize / nbytes

    if args.verify:
        out_np, len_np = np.asarray(out), np.asarray(lens)
        rt = b"".join(out_np[b, :len_np[b]].tobytes()
                      for b in range(out_np.shape[0]))
        assert rt == data, "round-trip mismatch"
        print("round-trip: OK", file=sys.stderr)

    enc_gbps = nbytes / enc_s / 1e9
    dec_gbps = nbytes / dec_s / 1e9
    rt_gbps = nbytes / (enc_s + dec_s) / 1e9
    print(f"encode: {enc_gbps:.4f} GB/s  decode: {dec_gbps:.4f} GB/s  "
          f"ratio: {ratio:.4f}  size: {nbytes}", file=sys.stderr)

    print(json.dumps({
        "metric": "lzs_roundtrip_throughput",
        "value": round(rt_gbps, 5),
        "unit": "GB/s",
        "vs_baseline": round(rt_gbps / BASELINE_ROUNDTRIP_GBPS, 2),
    }))


if __name__ == "__main__":
    main()
