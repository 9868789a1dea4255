"""Streaming segment row-sum kernel: parity with jax.ops.segment_sum on
sorted runs, including tile-spanning runs and empty segments."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sparkfm_tpu.ops import pallas_segsum as S


def _ref(g, seg, u):
    return np.asarray(jax.ops.segment_sum(jnp.asarray(g), jnp.asarray(seg),
                                          num_segments=u))


def _run(g, seg, u, tile=8):
    out = S.segment_rowsum(jnp.asarray(g), jnp.asarray(seg), u, tile=tile,
                           force="interpret")
    np.testing.assert_allclose(np.asarray(out), _ref(g, seg, u),
                               rtol=1e-5, atol=1e-5)


def _dense_ranks(rng, n):
    incr = rng.integers(0, 2, n)
    incr[0] = 0
    return np.cumsum(incr).astype(np.int32)


def test_basic_runs():
    rng = np.random.default_rng(0)
    n, w = 64, 128
    seg = _dense_ranks(rng, n)
    u = int(seg[-1]) + 3
    g = rng.normal(size=(n, w)).astype(np.float32)
    _run(g, seg, u)


def test_run_spans_many_tiles():
    rng = np.random.default_rng(1)
    n, w = 64, 128
    seg = np.zeros(n, np.int32)          # one giant run across all tiles
    g = rng.normal(size=(n, w)).astype(np.float32)
    _run(g, seg, 4)


def test_runs_align_with_tile_boundaries():
    rng = np.random.default_rng(2)
    n, w, tile = 64, 128, 8
    seg = np.repeat(np.arange(n // tile), tile).astype(np.int32)
    g = rng.normal(size=(n, w)).astype(np.float32)
    _run(g, seg, n // tile, tile=tile)


def test_unused_budget_above_count_is_zero():
    """Dense ranks (dedup contract: start 0, increments of <=1) with a
    budget far above the rank count — unused slots must read zero."""
    rng = np.random.default_rng(3)
    n, w, u = 32, 128, 50
    incr = rng.integers(0, 2, n); incr[0] = 0
    seg = np.cumsum(incr).astype(np.int32)      # dense ranks, max ~16
    g = rng.normal(size=(n, w)).astype(np.float32)
    _run(g, seg, u)


def test_every_slot_unique():
    rng = np.random.default_rng(4)
    n, w = 64, 128
    seg = np.arange(n, dtype=np.int32)
    g = rng.normal(size=(n, w)).astype(np.float32)
    _run(g, seg, n)


def test_pad_width_and_length():
    rng = np.random.default_rng(5)
    n, w = 50, 66          # n % tile != 0, w % 128 != 0
    seg = _dense_ranks(rng, n)
    u = int(seg[-1]) + 5
    g = rng.normal(size=(n, w)).astype(np.float32)
    _run(g, seg, u, tile=16)


def test_xla_fallback_matches():
    rng = np.random.default_rng(6)
    n, w, u = 40, 16, 12
    seg = np.sort(rng.integers(0, u, n)).astype(np.int32)
    g = rng.normal(size=(n, w)).astype(np.float32)
    out = S.segment_rowsum(jnp.asarray(g), jnp.asarray(seg), u, force="xla")
    np.testing.assert_allclose(np.asarray(out), _ref(g, seg, u), rtol=1e-6)


def test_random_stress():
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = int(rng.integers(17, 200))
        w = int(rng.choice([1, 33, 128]))
        incr = rng.integers(0, 2, n); incr[0] = 0
        seg = np.cumsum(incr).astype(np.int32)   # dense ranks
        u = int(seg[-1]) + int(rng.integers(1, 20))
        g = rng.normal(size=(n, w)).astype(np.float32)
        _run(g, seg, u, tile=8)
