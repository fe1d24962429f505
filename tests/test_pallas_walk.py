"""Pallas token-walk kernel vs the XLA jump-table oracle.

Runs the kernel in interpreter mode (tests run on the CPU backend); the
compiled path is exercised by the TPU bench, whose round-trip verify
would catch any divergence at scale.
"""

import numpy as np
import jax.numpy as jnp

from lzs_tpu.ops import pallas_walk, tokenize


def _check(step: np.ndarray, n: int) -> None:
    ref = np.asarray(tokenize._token_starts_xla(jnp.asarray(step),
                                                jnp.int32(n)))
    # interpret mode is automatic off-TPU (tests run on the CPU backend)
    got = np.asarray(pallas_walk.token_starts_walk(jnp.asarray(step),
                                                   jnp.int32(n)))
    bad = np.where(ref != got)[0]
    assert bad.size == 0, f"mismatch at {bad[:10]} (n={n})"


def test_walk_matches_xla_random():
    rng = np.random.default_rng(3)
    for npos in (256, 512, 1024):
        for _ in range(3):
            step = np.ones(npos, np.int32)
            nmatch = int(rng.integers(5, npos // 4))
            idx = rng.integers(0, npos, nmatch)
            step[idx] = rng.integers(2, 40, nmatch)
            step[rng.integers(0, npos, 3)] = rng.integers(
                60, max(npos // 2, 61), 3)
            _check(step, int(rng.integers(npos // 2, npos + 1)))


def test_walk_vmapped_batch():
    """The custom_vmap rule maps the batch onto the kernel grid."""
    import jax

    rng = np.random.default_rng(1)
    steps = np.ones((3, 256), np.int32)
    for b in range(3):
        idx = rng.integers(0, 256, 20)
        steps[b, idx] = rng.integers(2, 60, 20)
    ns = np.asarray([256, 200, 64], np.int32)
    ref = jax.vmap(tokenize._token_starts_xla)(jnp.asarray(steps),
                                               jnp.asarray(ns))
    got = jax.vmap(pallas_walk.token_starts_walk)(jnp.asarray(steps),
                                                  jnp.asarray(ns))
    assert bool(jnp.all(ref == got))


def test_walk_edge_cases():
    # all literals
    _check(np.ones(256, np.int32), 256)
    # one giant match spanning several tiles
    step = np.ones(512, np.int32)
    step[3] = 400
    _check(step, 512)
    # match ending exactly at a tile boundary
    step = np.ones(512, np.int32)
    step[100] = 28     # 100 + 28 = 128
    _check(step, 512)
    # n = 0
    _check(np.ones(256, np.int32), 0)
