"""ALS solver tests: exact parity vs a sequential NumPy Gauss-Seidel oracle
(block_size=1 makes the blocked schedule degenerate to the reference's
sequential order), plus convergence of the blocked schedule."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparkfm_tpu.config import ALSConfig, FMConfig, Task
from sparkfm_tpu.data import synth
from sparkfm_tpu.data.batching import SparseDataset
from sparkfm_tpu.models import fm as fm_model
from sparkfm_tpu.solvers import als


def numpy_als_oracle(w0, w, v, dense_x, y, reg0, regw, regv, sweeps=1):
    """Sequential coordinate descent, exactly the reference's schedule
    (ALS.scala:15-75): w0, then w by ascending feature, then per factor
    ascending feature; e patched after every coordinate by delta*h
    (ALS.scala:194-198), q patched per coordinate (ALS.scala:60-62)."""
    w0, w, v = float(w0), w.astype(np.float64).copy(), v.astype(np.float64).copy()
    x = dense_x.astype(np.float64)
    n, F = x.shape
    K = v.shape[1]

    def predict():
        lin = w0 + x @ w
        s = x @ v                       # (n, K)
        sq = (x ** 2) @ (v ** 2)
        return lin + 0.5 * np.sum(s ** 2 - sq, axis=1)

    for _ in range(sweeps):
        e = predict() - y
        # w0: h = 1
        den = float(n)
        new = (w0 * den - e.sum()) / (reg0 + den)
        if np.isfinite(new) and den > 0:
            e += new - w0
            w0 = new
        # w
        for j in range(F):
            h = x[:, j]
            den = np.sum(h ** 2)
            num = np.sum(e * h)
            new = (w[j] * den - num) / (regw + den) if (regw + den) != 0 else np.nan
            if np.isfinite(new) and den > 0:
                e += (new - w[j]) * h
                w[j] = new
        # v
        for f in range(K):
            q = x @ v[:, f]
            for j in range(F):
                h = x[:, j] * (q - x[:, j] * v[j, f])
                den = np.sum(h ** 2)
                num = np.sum(e * h)
                new = (v[j, f] * den - num) / (regv + den) if (regv + den) != 0 else np.nan
                if np.isfinite(new) and den > 0:
                    delta = new - v[j, f]
                    e += delta * h
                    q += delta * x[:, j]
                    v[j, f] = new
    return w0, w, v


def _dense_to_sparse(dense, y, num_features):
    rows = []
    for i in range(dense.shape[0]):
        idx = np.nonzero(dense[i])[0]
        rows.append((y[i], idx, dense[i][idx]))
    from sparkfm_tpu.data.batching import pack_examples
    return pack_examples(rows, num_features=num_features)


def test_als_block1_matches_sequential_oracle():
    rng = np.random.default_rng(0)
    n, F, K = 80, 12, 3
    dense = rng.normal(size=(n, F)) * (rng.random((n, F)) < 0.4)
    y = rng.normal(size=n)
    cfg = FMConfig(num_features=F, num_factors=K, reg0=0.1, reg_w=0.5,
                   reg_v=1.0, seed=0, init_stdev=0.1)
    params = fm_model.init_params(cfg)
    ds = _dense_to_sparse(dense, y, F)
    ws, nb = als.build_workspace(ds, cfg, ALSConfig(block_size=1))
    assert nb == F
    p = params
    for _ in range(2):
        p = als.als_sweep(p, ws, nb, F, cfg.reg0, cfg.reg_w, cfg.reg_v)
    ow0, ow, ov = numpy_als_oracle(
        np.asarray(params.w0), np.asarray(params.w), np.asarray(params.v),
        dense, y, cfg.reg0, cfg.reg_w, cfg.reg_v, sweeps=2)
    np.testing.assert_allclose(float(p.w0), ow0, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(p.w), ow, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(p.v), ov, rtol=5e-3, atol=5e-3)


def test_als_empty_columns_untouched():
    """Features never active keep their init values (reference skips empty
    columns: ALS.scala:39, isUpdatable den>0 guard)."""
    rng = np.random.default_rng(1)
    F = 20
    dense = np.zeros((30, F))
    dense[:, :10] = rng.normal(size=(30, 10)) * (rng.random((30, 10)) < 0.5)
    y = rng.normal(size=30)
    cfg = FMConfig(num_features=F, num_factors=2, reg_v=1.0, seed=1)
    params = fm_model.init_params(cfg)
    ds = _dense_to_sparse(dense, y, F)
    # all-zero rows would make pack skip entries; ensure at least 1 nnz
    ws, nb = als.build_workspace(ds, cfg, ALSConfig(block_size=4))
    p = als.als_sweep(params, ws, nb, F, cfg.reg0, cfg.reg_w, cfg.reg_v)
    np.testing.assert_array_equal(np.asarray(p.v)[10:], np.asarray(params.v)[10:])
    np.testing.assert_array_equal(np.asarray(p.w)[10:], np.asarray(params.w)[10:])


def test_als_blocked_converges_on_movielens_synth():
    ds = synth.synth_movielens(num_users=60, num_items=80,
                               num_examples=8000, rank=3, noise=0.1, seed=0)
    from sparkfm_tpu.data import split
    coll = split.split_by_random(ds, 0.8, 0.2, seed=0)
    cfg = FMConfig(num_features=ds.num_features, num_factors=8,
                   reg0=0.0, reg_w=0.1, reg_v=0.5, init_stdev=0.01, seed=0)
    res = als.train_als(cfg, ALSConfig(epochs=8, block_size=64),
                        coll.training, coll.test, eval_every=2)
    base_rmse = float(np.std(coll.test.y))
    final = res.history[-1]["eval_rmse"]
    assert final < 0.7 * base_rmse, (final, base_rmse)
    # monotone-ish improvement between first and last eval
    first = res.history[0]["eval_rmse"]
    assert final < first


def test_als_rejects_classification_and_ffm():
    cfg = FMConfig(num_features=10, num_factors=2, task=Task.CLASSIFICATION)
    ds = synth.synth_movielens(num_users=5, num_items=5, num_examples=50)
    with pytest.raises(ValueError):
        als.train_als(cfg, ALSConfig(epochs=1), ds)
    cfg2 = FMConfig(num_features=10, num_factors=2, num_fields=3)
    with pytest.raises(ValueError):
        als.train_als(cfg2, ALSConfig(epochs=1), ds)


def test_hbm_budget_check_raises_clearly(monkeypatch):
    """VERDICT r2 weak #8: ML-25M-scale ALS must fail fast with a clear
    message instead of OOMing mid-sweep."""
    from sparkfm_tpu.config import ALSConfig, FMConfig
    from sparkfm_tpu.data import synth
    from sparkfm_tpu.solvers import als as A

    ds = synth.synth_movielens(num_users=50, num_items=60,
                               num_examples=500, seed=0)
    cfg = FMConfig(num_features=ds.num_features, num_factors=4)
    need = A.workspace_hbm_bytes(ds, cfg)
    assert need < 1 << 20               # tiny problem, sane estimate
    monkeypatch.setenv("SPARKFM_HBM_BUDGET", str(int(need * 0.5)))
    with pytest.raises(ValueError, match="GiB HBM"):
        A.train_als(cfg, ALSConfig(epochs=1), ds)
    monkeypatch.setenv("SPARKFM_HBM_BUDGET", str(int(need * 100)))
    A.train_als(cfg, ALSConfig(epochs=1), ds)   # passes under the budget


def test_compact_sweep_matches_reference_sweep():
    """The round-4 factored compact sweep (als_sweep_compact: rank-space
    state, factored num/den streams, CSR-row patches) computes the same
    coordinate updates as the direct _sweep_impl."""
    from sparkfm_tpu.solvers.als import (ALSConfig, build_workspace,
                                         als_sweep, als_sweep_compact,
                                         slot_blocks)

    ds = synth.synth_movielens(num_users=40, num_items=60,
                               num_examples=1500, seed=41)
    cfg = FMConfig(num_features=ds.num_features, num_factors=4,
                   reg_w=0.1, reg_v=0.5, seed=41)
    ws, nb = build_workspace(ds, cfg, ALSConfig(
        feature_blocks=slot_blocks(ds)))
    params0 = fm_model.init_params(cfg, jax.random.PRNGKey(41))
    rw, rv = (jnp.asarray(x) for x in cfg.reg_vectors())
    n_ranks = int(ws.present.shape[0])

    pa = pb = params0
    for _ in range(3):
        pa = als_sweep(pa, ws, nb, cfg.num_features, cfg.reg0, rw, rv)
        pb = als_sweep_compact(pb, ws, nb, cfg.num_features, n_ranks,
                               cfg.reg0, rw, rv)
    np.testing.assert_allclose(np.asarray(pa.v), np.asarray(pb.v),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pa.w), np.asarray(pb.w),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(pa.w0), float(pb.w0), rtol=1e-5)


def test_compact_sweep_leaves_absent_features_untouched():
    from sparkfm_tpu.solvers.als import (ALSConfig, build_workspace,
                                         als_sweep_compact, slot_blocks)

    ds = synth.synth_movielens(num_users=10, num_items=12,
                               num_examples=200, seed=5)
    # widen num_features beyond what the data touches
    cfg = FMConfig(num_features=ds.num_features + 7, num_factors=3,
                   reg_v=0.5, seed=5)
    ds2 = dataclasses.replace(ds, num_features=cfg.num_features)
    ws, nb = build_workspace(ds2, cfg, ALSConfig(
        feature_blocks=slot_blocks(ds2)))
    params0 = fm_model.init_params(cfg, jax.random.PRNGKey(5))
    rw, rv = (jnp.asarray(x) for x in cfg.reg_vectors())
    p = als_sweep_compact(params0, ws, nb, cfg.num_features,
                          int(ws.present.shape[0]), cfg.reg0, rw, rv)
    absent = np.setdiff1d(np.arange(cfg.num_features),
                          np.asarray(ws.present))
    assert absent.size > 0
    np.testing.assert_array_equal(np.asarray(p.v)[absent],
                                  np.asarray(params0.v)[absent])


def test_column_pure_patches_match_generic():
    """The column-pure patch fast path (slot-aligned blocks: block b is
    CSR column b) computes the identical sweep."""
    from sparkfm_tpu.solvers.als import (ALSConfig, als_sweep_compact,
                                         blocks_are_column_pure,
                                         build_workspace, slot_blocks)

    ds = synth.synth_movielens(num_users=30, num_items=40,
                               num_examples=1000, seed=61)
    cfg = FMConfig(num_features=ds.num_features, num_factors=3,
                   reg_w=0.1, reg_v=0.5, seed=61)
    blocks = slot_blocks(ds)
    assert blocks_are_column_pure(ds, np.asarray(blocks))
    ws, nb = build_workspace(ds, cfg, ALSConfig(feature_blocks=blocks))
    params0 = fm_model.init_params(cfg, jax.random.PRNGKey(61))
    rw, rv = (jnp.asarray(x) for x in cfg.reg_vectors())
    nr = int(ws.present.shape[0])
    pa = als_sweep_compact(params0, ws, nb, cfg.num_features, nr,
                           cfg.reg0, rw, rv, column_pure=False)
    pb = als_sweep_compact(params0, ws, nb, cfg.num_features, nr,
                           cfg.reg0, rw, rv, column_pure=True)
    np.testing.assert_allclose(np.asarray(pa.v), np.asarray(pb.v),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pa.w), np.asarray(pb.w),
                               rtol=1e-6, atol=1e-7)

    # a layout that is NOT column-pure must be detected
    ids2 = ds.ids.copy()
    ids2[0, 0], ids2[0, 1] = ids2[0, 1], ids2[0, 0]   # swap one row's slots
    import dataclasses as _dc
    ds2 = _dc.replace(ds, ids=ids2)
    assert not blocks_are_column_pure(ds2, np.asarray(blocks))


def test_compact_sweep_csc_uniform_parity():
    """csc_uniform sliced-stream sweep == the full-stream sweep (round
    5: per-block streams restricted to the block's contiguous CSC run;
    host structure check csc_blocks_uniform)."""
    import jax
    from sparkfm_tpu.solvers import als as A
    from sparkfm_tpu.models import fm as fm_model
    from sparkfm_tpu.config import ALSConfig, FMConfig
    from sparkfm_tpu.data.batching import SparseDataset

    rng = np.random.default_rng(7)
    n, users, movies = 600, 40, 25
    ids = np.stack([rng.integers(0, users, n),
                    users + rng.integers(0, movies, n)], axis=1
                   ).astype(np.int32)
    vals = np.ones((n, 2), np.float32)
    y = rng.normal(size=(n,)).astype(np.float32)
    ds = SparseDataset(ids=ids, vals=vals, y=y, num_features=users + movies)
    cfg = FMConfig(num_features=users + movies, num_factors=4,
                   reg_w=0.1, reg_v=0.5, seed=0)
    als_cfg = ALSConfig(feature_blocks=A.slot_blocks(ds))
    ws, nb = A.build_workspace(ds, cfg, als_cfg)
    assert A.blocks_are_column_pure(ds, np.asarray(ws.block_of_feat))
    assert A.csc_blocks_uniform(ds, np.asarray(ws.block_of_feat))
    n_ranks = int(ws.present.shape[0])
    params = fm_model.init_params(cfg, jax.random.PRNGKey(0))
    a = params
    b = params
    for _ in range(2):
        a = A.als_sweep_compact(a, ws, nb, cfg.num_features, n_ranks,
                                cfg.reg0, cfg.reg_w, cfg.reg_v,
                                column_pure=True, csc_uniform=True)
        b = A.als_sweep_compact(b, ws, nb, cfg.num_features, n_ranks,
                                cfg.reg0, cfg.reg_w, cfg.reg_v,
                                column_pure=True, csc_uniform=False)
    np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.w), np.asarray(b.w),
                               rtol=1e-5, atol=1e-6)


def test_csc_blocks_uniform_rejects_nonuniform():
    from sparkfm_tpu.solvers import als as A
    from sparkfm_tpu.data.batching import SparseDataset
    # two slots drawing from OVERLAPPING id ranges -> not uniform
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 30, (100, 2)).astype(np.int32)
    ds = SparseDataset(ids=ids, vals=np.ones((100, 2), np.float32),
                      y=np.zeros((100,), np.float32), num_features=30)
    bof = (np.arange(30) >= 15).astype(np.int32)
    assert not A.csc_blocks_uniform(ds, bof)


def test_dispatched_sweep_matches_single_jit():
    """als_sweep_compact_dispatched (K+1 dispatches, the >60 s-dispatch
    workaround) == als_sweep_compact (one jit), exactly the same update
    sequence."""
    import jax
    from sparkfm_tpu.solvers import als as A
    from sparkfm_tpu.models import fm as fm_model
    from sparkfm_tpu.config import ALSConfig, FMConfig
    from sparkfm_tpu.data.batching import SparseDataset

    rng = np.random.default_rng(11)
    n, users, movies = 500, 30, 20
    ids = np.stack([rng.integers(0, users, n),
                    users + rng.integers(0, movies, n)], axis=1
                   ).astype(np.int32)
    ds = SparseDataset(ids=ids, vals=np.ones((n, 2), np.float32),
                       y=rng.normal(size=(n,)).astype(np.float32),
                       num_features=users + movies)
    cfg = FMConfig(num_features=users + movies, num_factors=3,
                   reg_w=0.1, reg_v=0.5, seed=0)
    ws, nb = A.build_workspace(ds, cfg,
                               ALSConfig(feature_blocks=A.slot_blocks(ds)))
    n_ranks = int(ws.present.shape[0])
    p0 = fm_model.init_params(cfg, jax.random.PRNGKey(0))
    a = A.als_sweep_compact(p0, ws, nb, cfg.num_features, n_ranks,
                            cfg.reg0, cfg.reg_w, cfg.reg_v,
                            column_pure=True)
    b = A.als_sweep_compact_dispatched(
        p0, ws, nb, cfg.num_features, n_ranks, cfg.reg0, cfg.reg_w,
        cfg.reg_v, column_pure=True)
    np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.w), np.asarray(b.w),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(a.w0), float(b.w0), rtol=1e-6)


def test_identity_slice_sweep_parity():
    """The slice-identity unrolled sweep (block 0's CSC run == example
    order after build_workspace's reorder) == the gathered form."""
    import jax
    from sparkfm_tpu.solvers import als as A
    from sparkfm_tpu.models import fm as fm_model
    from sparkfm_tpu.config import ALSConfig, FMConfig
    from sparkfm_tpu.data.batching import SparseDataset

    rng = np.random.default_rng(21)
    n, users, movies = 700, 35, 25
    ids = np.stack([rng.integers(0, users, n),
                    users + rng.integers(0, movies, n)], axis=1
                   ).astype(np.int32)
    ds = SparseDataset(ids=ids, vals=np.ones((n, 2), np.float32),
                       y=rng.normal(size=(n,)).astype(np.float32),
                       num_features=users + movies)
    cfg = FMConfig(num_features=users + movies, num_factors=4,
                   reg_w=0.1, reg_v=0.5, seed=0)
    ws, nb = A.build_workspace(ds, cfg,
                               ALSConfig(feature_blocks=A.slot_blocks(ds)))
    n_ranks = int(ws.present.shape[0])
    ident = A.csc_slice_identity(ws, nb, n)
    # the example reorder makes block 0's run the identity
    assert ident[0] is True
    p0 = fm_model.init_params(cfg, jax.random.PRNGKey(0))
    # force the large-N csc_uniform machinery on this small problem
    # (paired_minor would otherwise shadow it and make the test vacuous)
    old = A._PAIRED_MINOR_MAX_BYTES
    A._PAIRED_MINOR_MAX_BYTES = 0
    try:
        a = p0
        b = p0
        for _ in range(2):
            a = A.als_sweep_compact(a, ws, nb, cfg.num_features, n_ranks,
                                    cfg.reg0, cfg.reg_w, cfg.reg_v,
                                    column_pure=True, csc_uniform=True,
                                    slice_identity=ident)
            b = A.als_sweep_compact(b, ws, nb, cfg.num_features, n_ranks,
                                    cfg.reg0, cfg.reg_w, cfg.reg_v,
                                    column_pure=True, csc_uniform=True)
    finally:
        A._PAIRED_MINOR_MAX_BYTES = old
    np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.w), np.asarray(b.w),
                               rtol=1e-5, atol=1e-6)
