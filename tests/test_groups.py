"""Attribute-group regularization/hyperpriors (VERDICT r1 item 6; the
reference's Metadata capability, fm/bs/Metadata.scala:8-29)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparkfm_tpu.config import ALSConfig, FMConfig, MCMCConfig, SGDConfig
from sparkfm_tpu.data import synth
from sparkfm_tpu.solvers import als as als_solver
from sparkfm_tpu.solvers import mcmc as mcmc_solver
from sparkfm_tpu.solvers import sgd as sgd_solver
from sparkfm_tpu.training import trainer


def _groups_two(f):
    """First half group 0, second half group 1."""
    return tuple([0] * (f // 2) + [1] * (f - f // 2))


def test_reg_vectors_spread():
    cfg = FMConfig(num_features=6, feature_groups=(0, 0, 1, 1, 2, 2),
                   group_reg_w=(1.0, 2.0, 3.0), group_reg_v=(4.0, 5.0, 6.0))
    rw, rv = cfg.reg_vectors()
    np.testing.assert_array_equal(rw, [1, 1, 2, 2, 3, 3])
    np.testing.assert_array_equal(rv, [4, 4, 5, 5, 6, 6])
    assert cfg.num_groups == 3


def test_als_per_group_reg_shrinks_heavier_group():
    """Two identical feature populations; the heavily regularized group's
    learned weights must be uniformly smaller."""
    ds = synth.synth_movielens(num_users=40, num_items=40,
                               num_examples=2500, seed=17)
    f = ds.num_features
    groups = _groups_two(f)
    base = dict(num_features=f, num_factors=4, seed=17, reg_w=0.0)
    cfg = FMConfig(**base, feature_groups=groups,
                   group_reg_w=(0.01, 500.0), group_reg_v=(0.01, 500.0))
    res = als_solver.train_als(cfg, ALSConfig(epochs=5, block_size=8), ds)
    w = np.asarray(res.params.w)
    v = np.asarray(res.params.v)
    h = f // 2
    # heavier-regularized half must be much smaller in magnitude (ALS
    # shrink factor per coordinate is den/(reg+den); den here is ~60)
    assert np.mean(np.abs(w[h:])) < 0.35 * np.mean(np.abs(w[:h])) + 1e-6
    assert np.mean(np.abs(v[h:])) < 0.6 * np.mean(np.abs(v[:h]))


def test_sgd_per_group_reg_matches_manual():
    """SGD with per-group lambdas == SGD with the scalar lambda when all
    groups share the value (sanity), and differs when they don't."""
    ds = synth.synth_movielens(num_users=30, num_items=30,
                               num_examples=1200, seed=18)
    f = ds.num_features
    groups = _groups_two(f)
    sgd_cfg = SGDConfig(batch_size=256, learning_rate=0.1,
                        optimizer="adagrad", epochs=2)
    cfg_scalar = FMConfig(num_features=f, num_factors=3, seed=18,
                          reg_w=0.05, reg_v=0.05)
    cfg_same = cfg_scalar.replace(feature_groups=groups,
                                  group_reg_w=(0.05, 0.05),
                                  group_reg_v=(0.05, 0.05))
    cfg_diff = cfg_scalar.replace(feature_groups=groups,
                                  group_reg_w=(0.0, 5.0),
                                  group_reg_v=(0.0, 5.0))
    r_scalar = trainer.train_sgd(cfg_scalar, sgd_cfg, ds)
    r_same = trainer.train_sgd(cfg_same, sgd_cfg, ds)
    r_diff = trainer.train_sgd(cfg_diff, sgd_cfg, ds)
    np.testing.assert_allclose(np.asarray(r_same.params.v),
                               np.asarray(r_scalar.params.v),
                               rtol=1e-5, atol=1e-7)
    h = f // 2
    v_diff = np.asarray(r_diff.params.v)
    assert np.mean(np.abs(v_diff[h:])) < np.mean(np.abs(v_diff[:h]))


def test_mcmc_groups_get_different_lambdas():
    """Plant a model whose group-0 weights are large and group-1 weights
    tiny: the sampled per-group lambdas must separate (small lambda for the
    large group, large lambda for the tiny group)."""
    rng = np.random.default_rng(19)
    f, n, k = 60, 4000, 3
    groups = _groups_two(f)
    h = f // 2
    w_true = np.concatenate([rng.normal(0, 2.0, h),
                             rng.normal(0, 0.02, f - h)]).astype(np.float32)
    ids = rng.integers(0, f, (n, 4)).astype(np.int32)
    vals = np.ones((n, 4), np.float32)
    y = w_true[ids].sum(1) + rng.normal(0, 0.1, n).astype(np.float32)
    from sparkfm_tpu.data.batching import SparseDataset
    ds = SparseDataset(ids=ids, vals=vals, y=y, num_features=f)

    cfg = FMConfig(num_features=f, num_factors=k, seed=19,
                   feature_groups=groups)
    res = mcmc_solver.train_mcmc(
        cfg, MCMCConfig(epochs=25, burn_in=5, block_size=4), ds)
    st = res.extras["mcmc_state"]
    lam = np.asarray(st.lam_w)
    assert lam.shape == (2,)
    # tiny-weight group wants a much larger precision
    assert lam[1] > 5.0 * lam[0], lam
