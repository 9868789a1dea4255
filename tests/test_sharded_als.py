"""Sharded ALS parity + convergence on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

import sparkfm_tpu as sfm
from sparkfm_tpu.config import ALSConfig, FMConfig
from sparkfm_tpu.data import synth
from sparkfm_tpu.models import fm as fm_model
from sparkfm_tpu.parallel import mesh as M
from sparkfm_tpu.parallel import sharded_als
from sparkfm_tpu.solvers import als as als_solver


@pytest.fixture(scope="module")
def ratings():
    return synth.synth_movielens(num_users=30, num_items=40,
                                 num_examples=999,  # not divisible by 4
                                 seed=0)


def test_sharded_sweep_matches_single_device(ratings):
    """psum-of-partials == global sums: the sharded sweep must produce the
    exact same parameters as the single-device blocked sweep."""
    cfg = FMConfig(num_features=ratings.num_features, num_factors=3,
                   reg0=0.1, reg_w=0.3, reg_v=0.5, seed=0, init_stdev=0.05)
    als_cfg = ALSConfig(block_size=16)
    params = fm_model.init_params(cfg, jax.random.PRNGKey(0))

    ws_s, nb_s = als_solver.build_workspace(ratings, cfg, als_cfg)
    p_single = als_solver.als_sweep(params, ws_s, nb_s, cfg.num_features,
                                    cfg.reg0, cfg.reg_w, cfg.reg_v)

    mesh = M.make_mesh(4, 2)
    ws_m, nb_m = sharded_als.build_sharded_workspace(ratings, cfg, als_cfg,
                                                     mesh)
    assert nb_m == nb_s
    sweep = sharded_als.make_sharded_sweep(cfg, nb_m, mesh)
    p_shard = sweep(params, ws_m)

    np.testing.assert_allclose(float(p_shard.w0), float(p_single.w0),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_shard.w), np.asarray(p_single.w),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_shard.v), np.asarray(p_single.v),
                               atol=1e-5)


def test_sharded_multi_sweep_parity(ratings):
    """Three consecutive sweeps stay in lockstep (error doesn't compound)."""
    cfg = FMConfig(num_features=ratings.num_features, num_factors=2,
                   reg_w=0.1, reg_v=0.5, seed=1, init_stdev=0.05)
    als_cfg = ALSConfig(block_size=8)
    params = fm_model.init_params(cfg, jax.random.PRNGKey(1))

    ws_s, nb = als_solver.build_workspace(ratings, cfg, als_cfg)
    mesh = M.make_mesh(8, 1)
    ws_m, _ = sharded_als.build_sharded_workspace(ratings, cfg, als_cfg,
                                                  mesh)
    sweep = sharded_als.make_sharded_sweep(cfg, nb, mesh)
    p_s, p_m = params, params
    for _ in range(3):
        p_s = als_solver.als_sweep(p_s, ws_s, nb, cfg.num_features,
                                   cfg.reg0, cfg.reg_w, cfg.reg_v)
        p_m = sweep(p_m, ws_m)
    np.testing.assert_allclose(np.asarray(p_m.v), np.asarray(p_s.v),
                               atol=5e-4)


def test_train_als_sharded_converges(ratings):
    cfg = FMConfig(num_features=ratings.num_features, num_factors=4,
                   reg_w=0.1, reg_v=0.5, seed=0)
    mesh = M.make_mesh(4, 2)
    res = sharded_als.train_als_sharded(
        cfg, ALSConfig(epochs=6, block_size=16), ratings, mesh,
        eval_ds=ratings, eval_every=5)
    rmses = [h["eval_rmse"] for h in res.history if "eval_rmse" in h]
    assert rmses[-1] < 0.45
    assert rmses[-1] <= rmses[0]


def test_sharded_mcmc_matches_single_device():
    """The shard_map'd Gibbs sweep (replicated key, psum'd conditionals)
    reproduces the single-device chain."""
    from sparkfm_tpu.config import MCMCConfig
    from sparkfm_tpu.parallel.sharded_als import train_mcmc_sharded
    from sparkfm_tpu.solvers.als import slot_blocks
    from sparkfm_tpu.solvers.mcmc import train_mcmc

    ds = synth.synth_movielens(num_users=30, num_items=40,
                               num_examples=960, seed=51)
    cfg = FMConfig(num_features=ds.num_features, num_factors=3, seed=51)
    mc = MCMCConfig(epochs=4, burn_in=1, feature_blocks=slot_blocks(ds))
    r1 = train_mcmc(cfg, mc, ds, eval_ds=ds, key=jax.random.PRNGKey(51))
    mesh = M.make_mesh(8, 1)
    r2 = train_mcmc_sharded(cfg, mc, ds, mesh, eval_ds=ds,
                            key=jax.random.PRNGKey(51))
    np.testing.assert_allclose(np.asarray(r1.params.v),
                               np.asarray(r2.params.v),
                               rtol=2e-4, atol=2e-5)
    a1 = [h["eval_rmse_avg"] for h in r1.history if "eval_rmse_avg" in h]
    a2 = [h["eval_rmse_avg"] for h in r2.history if "eval_rmse_avg" in h]
    np.testing.assert_allclose(a1, a2, rtol=1e-3)


def test_facade_als_and_mcmc_on_mesh():
    """FM(solver='als'|'mcmc', mesh=...) trains sharded end-to-end; an
    exchange pin is rejected (meaningless for coordinate solvers)."""
    import pytest

    from sparkfm_tpu.api import FM
    from sparkfm_tpu.config import MeshConfig

    ds = synth.synth_movielens(num_users=30, num_items=40,
                               num_examples=960, seed=52)
    m = FM(num_factors=3, solver="als", max_iter=4, reg_v=0.5,
           mesh=MeshConfig(data=8, model=1)).fit(ds, eval_ds=ds)
    assert m.history[-1]["eval_rmse"] < 0.6
    m2 = FM(num_factors=3, solver="mcmc", max_iter=4,
            mesh=MeshConfig(data=8, model=1)).fit(ds, eval_ds=ds)
    assert m2.history[-1]["eval_rmse_avg"] < 1.0
    with pytest.raises(ValueError, match="exchange"):
        FM(solver="als", mesh=MeshConfig(data=8, model=1,
                                         exchange="unique")).fit(ds)


def test_sharded_als_and_mcmc_honor_max_seconds():
    """max_seconds stops the sharded ALS sweep loop and the sharded
    Gibbs chain (code-review r5: both ignored it)."""
    from sparkfm_tpu.config import MCMCConfig
    from sparkfm_tpu.parallel.sharded_als import train_mcmc_sharded
    from sparkfm_tpu.solvers.als import slot_blocks

    ds = synth.synth_movielens(num_users=12, num_items=12,
                               num_examples=64, seed=0)
    mesh = M.make_mesh(4, 2)
    cfg = FMConfig(num_features=ds.num_features, num_factors=2,
                   reg_v=0.5, seed=0)
    res = sharded_als.train_als_sharded(
        cfg, ALSConfig(epochs=200, block_size=8, max_seconds=1e-6),
        ds, mesh)
    assert len(res.history) == 1
    mres = train_mcmc_sharded(
        cfg, MCMCConfig(epochs=200, burn_in=1, max_seconds=1e-6,
                        feature_blocks=slot_blocks(ds)),
        ds, mesh, key=jax.random.PRNGKey(0))
    assert len(mres.history) == 1
