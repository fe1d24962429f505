"""Benchmark: LZS encode+decode throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N, ...extras}

Baseline (BASELINE.md section B): reference C incremental CLI on this
container's CPU — 19 MB/s encode, 88 MB/s decode, i.e. 15.6 MB/s
round-trip (harmonic combination). vs_baseline is measured round-trip
GB/s divided by that floor.

Timing methodology: on the tunneled TPU platform, jax.block_until_ready
returns before device completion and a host fetch costs ~30 ms RTT, so
each measurement runs REPS data-chained pipeline invocations inside one
jitted function (the next rep consumes a value derived from the previous
rep's output, forcing sequential execution), ends with a scalar fetch,
and subtracts the separately measured fetch RTT.

Corpus: a frozen, self-contained deterministic mix (pseudo-text with
Zipfian word reuse, RLE runs, structured records with shared prefixes,
incompressible random) pinned by SHA-256 so numbers are comparable
across rounds. ~42% one-pass compression ratio, comparable to the
C-source baseline measurement in BASELINE.md.

Pipelines measured:
  container  sort-based batch encoder with sync-record emission +
             sync-parallel decoder (the flagship path)
  raw        reference-compatible concatenated per-block streams
             (encode_block without sync records; scan decoder)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

import numpy as np

BASELINE_ROUNDTRIP_GBPS = 0.015632  # GB/s, see module docstring
HBM_GBPS = 819.0                    # TPU v5e HBM bandwidth (roofline ref)

# SHA-256 of make_corpus(1 << 23) — the frozen benchmark input.
CORPUS_SHA = "2a852df4b8f7fa933e24ac6b21bfc0769e6e58a72db998cf64fe84f12536ead1"


def make_corpus(size: int, seed: int = 2026) -> bytes:
    """Deterministic self-contained corpus (no external files)."""
    rng = np.random.default_rng(seed)
    # pseudo-text: Zipfian draws from a generated vocabulary
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz_", np.uint8)
    vocab = [bytes(rng.choice(letters, rng.integers(2, 12)))
             for _ in range(400)]
    ranks = 1.0 / np.arange(1, len(vocab) + 1)
    probs = ranks / ranks.sum()
    parts = []
    total = 0
    while total < size:
        k = rng.integers(0, 10)
        if k < 5:  # text
            words = rng.choice(len(vocab), rng.integers(300, 3000), p=probs)
            piece = b" ".join(vocab[w] for w in words)
        elif k < 7:  # RLE runs
            piece = bytes([int(rng.integers(0, 256))]) * int(
                rng.integers(50, 4000))
        elif k < 9:  # structured records with shared 12-byte prefixes
            rec = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
            piece = b"".join(
                rec[:12] + bytes([int(rng.integers(0, 256))]) * 4
                for _ in range(int(rng.integers(20, 200))))
        else:  # incompressible
            piece = bytes(rng.integers(0, 256, int(rng.integers(500, 5000)),
                                       dtype=np.uint8))
        parts.append(piece)
        total += len(piece)
    return b"".join(parts)[:size]


def measure_rtt(jax, np_mod) -> float:
    f = jax.jit(lambda x: x * 2)
    _ = np_mod.asarray(f(1.5))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np_mod.asarray(f(1.5))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def retry(fn, *, tries: int = 4, label: str = "op"):
    """Run ``fn()`` with bounded retries on transient backend errors.

    The tunneled TPU backend occasionally throws FAILED_PRECONDITION /
    closed-connection errors mid-run (this nulled the round-2 official
    bench); one flake must not zero the scoreboard.
    """
    last = None
    for attempt in range(tries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — transient backend errors
            last = e
            print(f"[retry] {label} attempt {attempt + 1}/{tries} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            time.sleep(2.0 * (attempt + 1))
    raise last


def selftest_cases() -> list[bytes]:
    """Adversarial parity cases for the COMPILED on-chip kernels.

    Mirrors the reference's four decoder harnesses and closed-form
    property tests (test-lzs.c:93-167, test-lzs-decompression.c:106-290)
    plus the failure shapes found during development: steal-heavy small
    alphabets, RLE run ends, deep overlapped-copy chains, the exact
    window limit, and block-capacity edges.
    """
    rng = np.random.default_rng(404)
    cases: list[bytes] = [b"", b"A", b"AB", b"ABAB" * 3]
    # repeated-byte closed-form family (extension-nibble chains + RLE)
    for k in (1, 7, 8, 9, 22, 23, 37, 300, 2047, 2048, 4095, 4096):
        cases.append(b"X" * k)
    # no-repeated-2-gram sequence: literals only, exact 9/8 expansion
    seq = bytearray()
    for i in range(1, 250):
        seq += bytes([0, i])
    cases.append(bytes(seq[:506]))
    # steal-heavy tiny alphabets and periodic data with perturbed tails
    for a in (2, 3, 4):
        cases.append(bytes(rng.integers(97, 97 + a, 4000,
                                        dtype=np.uint8)))
    cases.append((b"abcdefg" * 600)[:4000])
    cases.append((b"ab" * 2000)[:3999] + b"Q")
    # RLE run ends followed by near-miss tails
    cases.append(b"Q" * 2000 + b"QRQS" * 20 + b"Q" * 100)
    cases.append(b"\x00" * 3000 + b"\x01" + b"\x00" * 1000)
    # window-limit pins: match at exactly 2047, miss at 2048
    probe = bytes(rng.integers(0, 256, 40, dtype=np.uint8))
    cases.append(probe + b"\xAA" * (2047 - len(probe)) + probe)
    cases.append(probe + b"\xAA" * (2048 - len(probe)) + probe)
    # deep overlapped-copy chains (offset < length, repeated extension)
    cases.append(b"zy" + b"zy" * 1800)
    cases.append(b"abc" + b"abc" * 1300 + b"abd")
    # structured records with shared 12-byte prefixes (plateau chains)
    rec = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
    cases.append(b"".join(
        rec[:12] + bytes([int(v)]) * 4
        for v in rng.integers(0, 256, 200)))
    # incompressible and mixed
    cases.append(bytes(rng.integers(0, 256, 4096, dtype=np.uint8)))
    cases.append(bytes(rng.integers(0, 256, 4093, dtype=np.uint8)))
    for _ in range(12):
        parts, total = [], 0
        while total < 3500:
            k = int(rng.integers(0, 4))
            if k == 0:
                parts.append(bytes([int(rng.integers(0, 256))])
                             * int(rng.integers(1, 400)))
            elif k == 1:
                parts.append(bytes(rng.integers(97, 103,
                                                int(rng.integers(10, 600)),
                                                dtype=np.uint8)))
            elif k == 2 and parts:
                prev = b"".join(parts)
                parts.append(prev[:int(rng.integers(0, min(len(prev),
                                                           900) + 1))])
            else:
                parts.append(bytes(rng.integers(0, 256,
                                                int(rng.integers(1, 300)),
                                                dtype=np.uint8)))
            total = sum(map(len, parts))
        cases.append(b"".join(parts)[:4096])
    return [c[:4096] for c in cases]


def run_selftest(record) -> None:
    """Adversarial cases through the COMPILED kernels on the real chip.

    Every case is (1) encoded on-device and compared byte-for-byte with
    the NumPy reference model (itself pinned to the C encoder by the
    test suite), (2) container-decoded on-device back to the input, and
    (3) raw-decoded on-device back to the input. One fused batch shape
    keeps it to three compiles.
    """
    import jax
    import jax.numpy as jnp

    from lzs_tpu import reference
    from lzs_tpu.ops import decode as dec_ops
    from lzs_tpu.ops import decode2 as dec2_ops
    from lzs_tpu.ops import encode as enc_ops

    block = 4096
    cases = selftest_cases()
    while len(cases) % 8:
        cases.append(b"pad")
    k = len(cases)
    x = np.zeros((k, block), np.uint8)
    lens = np.zeros(k, np.int32)
    for i, c in enumerate(cases):
        x[i, :len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    xj = jax.device_put(jnp.asarray(x))
    nj = jax.device_put(jnp.asarray(lens))
    comp, nbytes, sbit, sout, nsync = retry(
        lambda: enc_ops.encode_batch_sync(xj, nj), label="selftest encode")
    comp_np = np.asarray(comp)
    nbytes_np = np.asarray(nbytes)
    out_sync = retry(
        lambda: dec2_ops.decode_batch_sync(
            comp, sbit, sout, nj, out_cap=block)[0],
        label="selftest sync decode")
    dec_raw = dec_ops.make_decoder(enc_ops.cap_bytes(block), block)
    out_raw = retry(lambda: dec_raw(comp, nbytes)[0],
                    label="selftest raw decode")
    out_sync_np, out_raw_np = np.asarray(out_sync), np.asarray(out_raw)

    passed = total = 0
    fails = []
    for i, c in enumerate(cases):
        want = reference.lzs_compress(c)
        got = comp_np[i, :nbytes_np[i]].tobytes()
        for label, ok in (
                ("enc", got == want),
                ("dsync", out_sync_np[i, :len(c)].tobytes() == c),
                ("draw", out_raw_np[i, :len(c)].tobytes() == c)):
            total += 1
            if ok:
                passed += 1
            else:
                fails.append(f"{i}:{label}")
    record["selftest_pass"] = passed
    record["selftest_total"] = total
    if fails:
        record["selftest_fail"] = fails[:20]
    print(f"selftest: {passed}/{total} on-chip checks", file=sys.stderr)


def run_stream_bench(record, data: bytes) -> None:
    """Host streaming-path throughput (the C4/C7 parity surface) vs the
    reference incremental CLI's CPU floor (BASELINE.md: 19 MB/s encode,
    88 MB/s decode — and 8.9 / 110 MB/s re-measured on this corpus).

    The shipped ``compress_stream``/``decompress_stream`` route through
    the native C++ streaming runtime (byte-identical output); the pure
    Python class (the checkpointable parity surface) is sampled on a
    small slice for honesty — it is orders of magnitude slower.
    """
    from lzs_tpu import stream

    piece = data[:1 << 21]
    t0 = time.perf_counter()
    compd = stream.compress_stream(piece, feed_size=1 << 15)
    enc_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = stream.decompress_stream(compd, feed_size=1 << 15)
    dec_s = time.perf_counter() - t0
    assert out == piece, "stream round-trip mismatch"
    record["stream_encode_mbps"] = round(len(piece) / enc_s / 1e6, 2)
    record["stream_decode_mbps"] = round(len(piece) / dec_s / 1e6, 2)

    small = data[:1 << 16]
    # warm the matcher jit at the same pool shape before timing
    stream.compress_stream(small, feed_size=1 << 15, engine="python")
    t0 = time.perf_counter()
    pc = stream.compress_stream(small, feed_size=1 << 15, engine="python")
    penc_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    pout = stream.decompress_stream(pc, engine="python")
    pdec_s = time.perf_counter() - t0
    assert pout == small
    assert pc == stream.compress_stream(small, feed_size=1 << 15), \
        "native/python stream parity break"
    record["stream_py_encode_mbps"] = round(len(small) / penc_s / 1e6, 3)
    record["stream_py_decode_mbps"] = round(len(small) / pdec_s / 1e6, 3)
    print(f"stream: encode {record['stream_encode_mbps']} MB/s  "
          f"decode {record['stream_decode_mbps']} MB/s  "
          f"(python class: {record['stream_py_encode_mbps']} / "
          f"{record['stream_py_decode_mbps']})", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 23)
    ap.add_argument("--block", type=int, default=1 << 15)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--raw", action="store_true", default=True,
                    help="also measure the raw (reference-stream) path")
    ap.add_argument("--no-raw", dest="raw", action="store_false")
    ap.add_argument("--verify", action="store_true", default=True)
    ap.add_argument("--no-verify", dest="verify", action="store_false")
    ap.add_argument("--selftest", action="store_true", default=True,
                    help="adversarial on-chip kernel parity checks")
    ap.add_argument("--no-selftest", dest="selftest", action="store_false")
    ap.add_argument("--stream-bench", action="store_true", default=True)
    ap.add_argument("--no-stream-bench", dest="stream_bench",
                    action="store_false")
    ap.add_argument("--lazy-ratio", action="store_true", default=True)
    ap.add_argument("--no-lazy-ratio", dest="lazy_ratio",
                    action="store_false")
    args = ap.parse_args()

    import glob
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lzs_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _cache_warm = bool(glob.glob("/tmp/lzs_jax_cache/*"))

    # The scoreboard record: filled in progressively so that an exception
    # at ANY point still emits one valid JSON line (a transient backend
    # error nulled the entire round-2 record).
    record = {"metric": "lzs_roundtrip_throughput", "value": 0.0,
              "unit": "GB/s", "vs_baseline": 0.0,
              "compile_cache": "warm" if _cache_warm else "cold"}
    try:
        _run(args, record)
    except Exception as e:  # noqa: BLE001
        record["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        import traceback
        traceback.print_exc(file=sys.stderr)
    print(json.dumps(record))


def _run(args, record) -> None:
    import jax
    import jax.numpy as jnp

    from lzs_tpu.blocks import BlockCodec, pad_blocks
    from lzs_tpu.ops import encode as enc_ops

    dev = retry(lambda: jax.devices()[0], label="device init")
    print(f"device: {dev}", file=sys.stderr)

    data = make_corpus(args.size)
    if args.size == 1 << 23:
        got = hashlib.sha256(data).hexdigest()
        assert got == CORPUS_SHA, f"corpus drift: {got}"
    codec = BlockCodec(block=args.block)
    x_np, lens_np = pad_blocks(data, args.block)
    x = jax.device_put(jnp.asarray(x_np))
    lens = jax.device_put(jnp.asarray(lens_np))
    rtt = measure_rtt(jax, np)
    print(f"fetch RTT: {rtt*1e3:.1f} ms", file=sys.stderr)
    reps = args.reps

    def timed(fn, *fnargs):
        """Chained-reps timing; fn(arg0 ^ bit, *rest) -> pytree.

        The reps run as a lax.scan so the pipeline body compiles ONCE
        (a Python loop inlines it ``reps`` times — most of the old
        compile_s was that amplification); the carry-dependent XOR
        still forces sequential execution.
        """
        @jax.jit
        def run(a0, *rest):
            def body(acc, _):
                out = fn(jnp.bitwise_xor(a0, (acc & 1).astype(a0.dtype)),
                         *rest)
                # consume EVERY leaf fully — consuming a single element
                # lets XLA slice-propagate whole stages away
                for leaf in jax.tree_util.tree_leaves(out):
                    acc = acc + jnp.sum(leaf.astype(jnp.int32))
                return acc, None
            acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=reps)
            return acc

        t0 = time.perf_counter()
        _ = retry(lambda: np.asarray(run(*fnargs)), label="compile+run")
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = retry(lambda: np.asarray(run(*fnargs)), label="timed run")
            best = min(best, time.perf_counter() - t0)
        if best < rtt * 1.5:
            print(f"[warn] timing {best*1e3:.1f} ms < 1.5x RTT "
                  f"({rtt*1e3:.1f} ms): unreliable", file=sys.stderr)
        return max((best - rtt) / reps, 1e-9), compile_s

    # --- container path ---
    nbytes = len(data)
    enc_s, enc_compile = timed(
        lambda a, b: codec.encode_batch(a, b), x, lens)
    enc_gbps = nbytes / enc_s / 1e9
    record.update(encode_gbps=round(enc_gbps, 5),
                  compile_s=round(enc_compile, 1))

    comp, clens, sbit, sout, nsync = retry(
        lambda: codec.encode_batch(x, lens), label="encode for decode")
    clens_np = np.asarray(clens)
    ratio = int(clens_np.sum()) / nbytes
    record["ratio"] = round(ratio, 4)

    dec_s, dec_compile = timed(
        lambda c, b, o, m: codec.decode_batch(c.astype(jnp.uint8), b, o, m),
        comp.astype(jnp.int32), sbit, sout, lens)
    dec_gbps = nbytes / dec_s / 1e9
    rt_gbps = nbytes / (enc_s + dec_s) / 1e9
    record.update(
        value=round(rt_gbps, 5),
        vs_baseline=round(rt_gbps / BASELINE_ROUNDTRIP_GBPS, 2),
        decode_gbps=round(dec_gbps, 5),
        compile_s=round(enc_compile + dec_compile, 1),
        hbm_roofline_frac=round(rt_gbps / HBM_GBPS, 6))
    print(f"encode: {enc_gbps:.4f} GB/s  decode: {dec_gbps:.4f} GB/s  "
          f"ratio: {ratio:.4f}  size: {nbytes}  "
          f"compile: {enc_compile + dec_compile:.1f}s", file=sys.stderr)

    if args.verify:
        out = retry(lambda: codec.decode_batch(comp, sbit, sout, lens),
                    label="verify decode")
        out_np, len_np = np.asarray(out), np.asarray(lens_np)
        rt = b"".join(out_np[b, :len_np[b]].tobytes()
                      for b in range(out_np.shape[0]))
        assert rt == data, "round-trip mismatch"
        record["verified"] = True
        print("round-trip: OK", file=sys.stderr)

    if args.raw:
        raw_enc = enc_ops.encode_batch
        raw_enc_s, _ = timed(lambda a, b: raw_enc(a, b), x, lens)
        rcomp, rlens = retry(lambda: raw_enc(x, lens), label="raw")
        raw_dec_s, _ = timed(
            lambda c, m: codec.decode_batch_raw(c.astype(jnp.uint8), m),
            rcomp.astype(jnp.int32), rlens)
        record["raw_encode_gbps"] = round(nbytes / raw_enc_s / 1e9, 5)
        record["raw_decode_gbps"] = round(nbytes / raw_dec_s / 1e9, 5)

    if args.lazy_ratio:
        # corpus-framing note (the greedy 0.40 here is corpus-specific
        # and NOT comparable with BASELINE.md's 0.31 C-source-text
        # figure; per-stream byte parity with the C encoder makes greedy
        # size parity automatic)
        lcomp, lclens = retry(
            lambda: enc_ops.encode_batch(x, lens, policy="lazy"),
            label="lazy encode")
        lr = int(np.asarray(lclens).sum()) / nbytes
        record["lazy_ratio"] = round(lr, 4)
        # framing: corpus-specific figure, NOT comparable with
        # BASELINE.md's 0.31 C-source-text ratio; greedy size parity
        # with the C encoder is automatic (byte-identical streams)
        record["ratio_note"] = "corpus-specific; greedy == C encoder bytes"

        print(f"lazy ratio: {lr:.4f} (greedy {record['ratio']})",
              file=sys.stderr)

    if args.stream_bench:
        retry(lambda: run_stream_bench(record, data), label="stream bench")

    if args.selftest:
        retry(lambda: run_selftest(record), label="selftest")


if __name__ == "__main__":
    main()
