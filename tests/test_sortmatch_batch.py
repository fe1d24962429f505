"""Chunked-sort candidates_batch parity vs the whole-block sort oracle.

The chunked path rows cover [c*2048 - 2048, c*2048 + 2048); the LZS
window of 2047 (lzs.h:60) guarantees every in-window predecessor is in
the row, so results must be identical to the global sort.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lzs_tpu.ops import sortmatch


def _mixed_corpus(rng, npos):
    kinds = [
        lambda: (rng.integers(0, 4, npos) + 97),          # tiny alphabet
        lambda: np.tile(rng.integers(0, 256, 16), npos // 16 + 1)[:npos],
        lambda: rng.integers(0, 256, npos),                # random
        lambda: np.repeat(rng.integers(0, 256, npos // 64 + 1),
                          64)[:npos],                      # RLE runs
    ]
    return kinds[rng.integers(0, len(kinds))]().astype(np.int32)


@pytest.mark.parametrize("npos", [4096, 8192])
def test_candidates_batch_matches_oracle(npos):
    rng = np.random.default_rng(npos)
    b = 4
    x = np.stack([_mixed_corpus(rng, npos) for _ in range(b)])
    n = np.array([npos, npos - 17, npos // 2 + 3, 5], np.int32)
    for i in range(b):
        x[i, n[i]:] = 0
    sj, nj = jnp.asarray(x), jnp.asarray(n)
    gs, go = map(np.asarray, jax.jit(sortmatch.candidates_batch)(sj, nj))
    ws, wo = map(np.asarray, jax.jit(jax.vmap(
        lambda a, m: sortmatch.candidates(a, m)))(sj, nj))
    np.testing.assert_array_equal(gs, ws)
    np.testing.assert_array_equal(go, wo)


def test_best_matches_batch_matches_oracle():
    rng = np.random.default_rng(7)
    npos, b = 4096, 3
    x = np.stack([_mixed_corpus(rng, npos) for _ in range(b)])
    n = np.array([npos, npos - 1, 2048], np.int32)
    for i in range(b):
        x[i, n[i]:] = 0
    sj, nj = jnp.asarray(x), jnp.asarray(n)
    got = jax.jit(sortmatch.best_matches_batch)(sj, nj)
    want = jax.jit(jax.vmap(
        lambda a, m: sortmatch.best_matches(a, m)))(sj, nj)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_candidates_batch_pallas_glue_interpret():
    """The Pallas per-k glue path (pcand), interpreter mode, small shape."""
    rng = np.random.default_rng(3)
    npos, b = 512, 2
    x = np.stack([_mixed_corpus(rng, npos) for _ in range(b)])
    n = np.array([npos, npos - 29], np.int32)
    x[1, n[1]:] = 0
    sj, nj = jnp.asarray(x), jnp.asarray(n)
    gs, go = map(np.asarray, jax.jit(
        lambda a, m: sortmatch.candidates_batch(a, m, pallas_glue=True))(
        sj, nj))
    ws, wo = map(np.asarray, jax.jit(jax.vmap(
        lambda a, m: sortmatch.candidates(a, m)))(sj, nj))
    np.testing.assert_array_equal(gs, ws)
    np.testing.assert_array_equal(go, wo)


def test_candidates_batch_small_block_fallback():
    rng = np.random.default_rng(11)
    x = (rng.integers(0, 8, (2, 1024)) + 60).astype(np.int32)
    n = np.array([1024, 700], np.int32)
    gs, go = map(np.asarray, sortmatch.candidates_batch(
        jnp.asarray(x), jnp.asarray(n)))
    ws, wo = map(np.asarray, jax.vmap(
        lambda a, m: sortmatch.candidates(a, m))(jnp.asarray(x),
                                                 jnp.asarray(n)))
    np.testing.assert_array_equal(gs, ws)
    np.testing.assert_array_equal(go, wo)


def test_extend_batch_pext_kernels_match_extend():
    """The Pallas-scan extension path (pext break/fold/rank kernels,
    interpret mode) must equal the per-block _extend oracle."""
    import functools
    rng = np.random.default_rng(5)
    npos, b = 4096, 3
    x = np.stack([_mixed_corpus(rng, npos) for _ in range(b)])
    n = np.array([npos, npos - 13, 1999], np.int32)
    for i in range(b):
        x[i, n[i]:] = 0
    sj, nj = jnp.asarray(x), jnp.asarray(n)
    score, off = jax.jit(jax.vmap(
        lambda a, m: sortmatch.candidates(a, m)))(sj, nj)
    got = np.asarray(jax.jit(
        lambda: sortmatch._extend_batch(sj, nj, score, off, 12))())
    want = np.asarray(jax.jit(jax.vmap(
        functools.partial(sortmatch._extend, cap=12)))(sj, nj, score, off))
    np.testing.assert_array_equal(got, want)


def test_exhaustive_backend_matches_sort_backend():
    """C5 pinning: the brute-force windowed-compare kernel (ops.match,
    the analogue of lzs_simple_compress's O(N*W) scan,
    lzs-compression-simple.c:266-278) must agree with the sort-based
    search at every position, and encode_block(backend="exhaustive")
    must emit identical bytes."""
    from lzs_tpu.ops import match
    from lzs_tpu.ops.encode import encode_block

    rng = np.random.default_rng(23)
    npos = 2048
    for seed in range(3):
        r = np.random.default_rng(seed)
        x = _mixed_corpus(r, npos)
        n = npos - int(r.integers(0, 64))
        x[n:] = 0
        sj, nj = jnp.asarray(x), jnp.int32(n)
        es, eo, ef = map(np.asarray, match.best_matches(sj, nj))
        ss, so, sf = map(np.asarray, sortmatch.best_matches(sj, nj))
        # scores below MIN_MATCH are "no match" — the kernels encode
        # them differently (0 vs degenerate 1-byte runs) and emission
        # ignores both, so normalize before comparing
        em, sm = es >= 2, ss >= 2
        np.testing.assert_array_equal(em, sm)
        np.testing.assert_array_equal(np.where(em, es, 0),
                                      np.where(sm, ss, 0))
        np.testing.assert_array_equal(np.where(em, eo, 0),
                                      np.where(sm, so, 0))
        np.testing.assert_array_equal(np.where(em, ef, 0),
                                      np.where(sm, sf, 0))

    x = _mixed_corpus(rng, npos)
    sj, nj = jnp.asarray(x), jnp.int32(npos)
    ce, ne = encode_block(sj, nj, backend="exhaustive")
    cs, ns = encode_block(sj, nj, backend="sort")
    assert int(ne) == int(ns)
    np.testing.assert_array_equal(np.asarray(ce), np.asarray(cs))


def test_emission_units_batch_matches_vmapped():
    """The batched emission path (pext roll-scan ownership) must equal
    the per-block emission_units oracle."""
    from lzs_tpu.ops import tokenize

    rng = np.random.default_rng(12)
    b, npos = 3, 2048
    kinds = [lambda: rng.integers(97, 101, npos),
             lambda: np.repeat(rng.integers(0, 256, npos // 32),
                               32)[:npos],
             lambda: rng.integers(0, 256, npos)]
    x = np.stack([kinds[i % 3]().astype(np.int32) for i in range(b)])
    n = np.array([npos, npos - 13, 901], np.int32)
    for i in range(b):
        x[i, n[i]:] = 0
    sj, nj = jnp.asarray(x), jnp.asarray(n)
    score, off, full = jax.jit(sortmatch.best_matches_batch)(sj, nj)
    got = jax.jit(lambda: tokenize.emission_units_batch(
        sj, nj, score, off, full))()
    want = jax.jit(jax.vmap(tokenize.emission_units))(
        sj, nj, score, off, full)
    for gg, ww in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gg), np.asarray(ww))


def test_pext_scan_kernels_match_xla():
    """Direct pins for the pext roll-scan kernels (interpret mode)
    against the XLA reference forms."""
    from lzs_tpu.ops import pext

    rng = np.random.default_rng(31)
    for b, w in ((8, 1024), (3, 512)):
        v = jnp.asarray(rng.integers(-1000, 1000, (b, w)).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(pext.cummax_rows(v)),
            np.asarray(jax.lax.cummax(v, axis=1)))
        np.testing.assert_array_equal(
            np.asarray(pext.rcummin_rows(v)),
            np.asarray(jax.lax.cummin(v, axis=1, reverse=True)))
        m = v > 0
        np.testing.assert_array_equal(
            np.asarray(pext.rank_mask(m)),
            np.asarray(jnp.cumsum(m.astype(jnp.int32), axis=1)
                       - m.astype(jnp.int32)))
    wide = jnp.asarray(rng.integers(0, 25, (4, 4096)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(pext.cumsum_rows_wide(wide, tile=512)),
        np.asarray(jnp.cumsum(wide, axis=1)))
