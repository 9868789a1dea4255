"""MCMC (Gibbs) solver: convergence on synthetic data, determinism,
hyperparameter sanity, and the averaged-prediction win."""

import numpy as np
import pytest
import jax

from sparkfm_tpu.config import FMConfig, MCMCConfig, Task
from sparkfm_tpu.data import synth
from sparkfm_tpu.solvers import mcmc


@pytest.fixture(scope="module")
def ml_data():
    from sparkfm_tpu.data.split import split_by_random
    ds = synth.synth_movielens(num_users=30, num_items=40,
                               num_examples=3600, seed=0)
    col = split_by_random(ds, 5, 1, seed=0)
    return col.training, col.test


def test_mcmc_converges_and_averaging_helps(ml_data):
    train, test = ml_data
    cfg = FMConfig(num_features=train.num_features, num_factors=4, seed=0)
    mcfg = MCMCConfig(epochs=30, burn_in=3, block_size=16)
    res = mcmc.train_mcmc(cfg, mcfg, train, eval_ds=test)
    recs = [r for r in res.history if "eval_rmse_avg" in r]
    assert len(recs) == mcfg.epochs - mcfg.burn_in
    final_avg = recs[-1]["eval_rmse_avg"]
    final_sample = recs[-1]["eval_rmse_sample"]
    # learned something: well below the label std (~1.1 for synth movielens)
    y = test.y
    base = float(np.sqrt(np.mean(np.square(y - y.mean()))))
    assert final_avg < 0.9 * base, (final_avg, base)
    # posterior-mean prediction should not be (much) worse than the last
    # single sample — averaging is the point of MCMC
    assert final_avg <= final_sample * 1.05
    assert res.extras["avg_scores"] is not None


def test_mcmc_deterministic_under_seed(ml_data):
    train, test = ml_data
    cfg = FMConfig(num_features=train.num_features, num_factors=2, seed=7)
    mcfg = MCMCConfig(epochs=4, burn_in=1, block_size=32)
    r1 = mcmc.train_mcmc(cfg, mcfg, train, eval_ds=test)
    r2 = mcmc.train_mcmc(cfg, mcfg, train, eval_ds=test)
    np.testing.assert_allclose(np.asarray(r1.params.v),
                               np.asarray(r2.params.v), rtol=1e-6)
    assert r1.history[-1]["eval_rmse_avg"] == r2.history[-1]["eval_rmse_avg"]


def test_hyperparameters_sampled_and_finite(ml_data):
    train, _ = ml_data
    cfg = FMConfig(num_features=train.num_features, num_factors=2, seed=3)
    mcfg = MCMCConfig(epochs=3, burn_in=0, block_size=64)
    res = mcmc.train_mcmc(cfg, mcfg, train)
    st = res.extras["mcmc_state"]
    assert float(st.alpha) > 0 and np.isfinite(float(st.alpha))
    # lam_w/mu_w are per-group (G,) arrays since the grouped-hyperprior
    # change (solvers/mcmc.py::MCMCState); assert elementwise.
    assert np.all(np.asarray(st.lam_w) > 0)
    assert np.all(np.isfinite(np.asarray(st.lam_w)))
    assert np.all(np.asarray(st.lam_v) > 0)
    assert np.all(np.isfinite(np.asarray(st.params.v)))
    # alpha should move away from its init of 1.0 once fit to data
    alphas = [r["alpha"] for r in res.history]
    assert len(set(alphas)) > 1


def test_mcmc_rejects_classification(ml_data):
    train, _ = ml_data
    cfg = FMConfig(num_features=train.num_features, num_factors=2,
                   task=Task.CLASSIFICATION)
    with pytest.raises(ValueError, match="squared loss"):
        mcmc.train_mcmc(cfg, MCMCConfig(epochs=1), train)
