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
