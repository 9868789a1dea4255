"""Pallas row-writer kernel tests (interpret mode on CPU; the same kernel
compiles for TPU where it replaces XLA's ~200ns/row scatter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparkfm_tpu.ops import pallas_rowio as PR


@pytest.mark.parametrize("R,K,U,tile", [(256, 8, 64, 16), (512, 32, 128, 128)])
def test_scatter_set_rows_interpret(R, K, U, tile):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, K)).astype(np.float32))
    ids = jnp.asarray(np.sort(rng.choice(R, U, replace=False))
                      .astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(U, K)).astype(np.float32))
    out = PR.scatter_set_rows(table, ids, rows, tile=tile, interpret=True)
    expect = np.asarray(table).copy()
    expect[np.asarray(ids)] = np.asarray(rows)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


def test_dispatch_pads_and_squeezes():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(100,)).astype(np.float32))
    ids = jnp.asarray(np.array([3, 7, 50], np.int32))
    rows = jnp.asarray(np.array([1.0, 2.0, 3.0], np.float32))
    out = PR.scatter_set(table, ids, rows, force="interpret")
    expect = np.asarray(table).copy()
    expect[[3, 7, 50]] = [1.0, 2.0, 3.0]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


def test_dispatch_xla_matches_interpret():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
    ids = jnp.asarray(np.sort(rng.choice(64, 32, replace=False))
                      .astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    a = PR.scatter_set(table, ids, rows, force="xla")
    b = PR.scatter_set(table, ids, rows, force="interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
