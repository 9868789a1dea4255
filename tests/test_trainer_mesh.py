"""The one-call mesh training entry (train_sgd(mesh=...), FM(mesh=...)).

VERDICT r1 item 3: a user must be able to type one command that trains
sharded. These run on the 8-device virtual CPU mesh (conftest.py).
"""

import jax
import numpy as np
import pytest

from sparkfm_tpu.api import FM
from sparkfm_tpu.config import FMConfig, MeshConfig, SGDConfig, Task
from sparkfm_tpu.data import synth
from sparkfm_tpu.data.split import split_by_random
from sparkfm_tpu.parallel import mesh as M
from sparkfm_tpu.training import trainer


def test_train_sgd_mesh_matches_single_device():
    """mesh= path trains to the same quality as the single-device path
    (identical data order, same seed, same optimizer)."""
    ds = synth.synth_movielens(num_users=60, num_items=80,
                               num_examples=3000, seed=11)
    coll = split_by_random(ds, 0.8, 0.2, seed=11)
    cfg = FMConfig(num_features=ds.num_features, num_factors=4,
                   reg_w=0.01, reg_v=0.02, seed=11)
    sgd_cfg = SGDConfig(batch_size=256, learning_rate=0.1,
                        optimizer="adagrad", epochs=3)

    res_mesh = trainer.train_sgd(cfg, sgd_cfg, coll.training, coll.test,
                                 mesh=M.make_mesh(4, 2))
    res_single = trainer.train_sgd(cfg, sgd_cfg, coll.training, coll.test)

    rm = res_mesh.history[-1]["eval_rmse"]
    rs = res_single.history[-1]["eval_rmse"]
    assert abs(rm - rs) < 0.02, (rm, rs)
    # returned params are host-usable and trimmed to the true feature count
    assert res_mesh.params.w.shape[0] == cfg.num_features
    assert np.all(np.isfinite(np.asarray(res_mesh.params.v)))
    # overflow surfacing exists on the unique exchange
    assert "unique_overflow_steps" in res_mesh.history[-1]


def test_train_sgd_mesh_accepts_meshconfig():
    ds = synth.synth_movielens(num_users=20, num_items=25,
                               num_examples=400, seed=12)
    cfg = FMConfig(num_features=ds.num_features, num_factors=2, seed=12)
    sgd_cfg = SGDConfig(batch_size=128, learning_rate=0.1,
                        optimizer="adagrad", epochs=1)
    res = trainer.train_sgd(cfg, sgd_cfg, ds,
                            mesh=MeshConfig(data=2, model=4))
    assert res.history and np.isfinite(res.history[-1]["train_loss"])


def test_fm_facade_mesh_string():
    """FM(mesh='4x2') — the single-call user entry point."""
    ds = synth.synth_ctr(num_examples=3000, num_fields=5, num_buckets=512,
                         seed=13)
    coll = split_by_random(ds, 0.8, 0.2, seed=13)
    m = FM(num_factors=4, task=Task.CLASSIFICATION, max_iter=3,
           solver="sgd", reg_v=1e-4, learning_rate=0.1, batch_size=256,
           mesh="4x2").fit(coll.training, eval_ds=coll.test)
    auc = m.evaluate(coll.test)["auc"]
    assert auc > 0.6, auc
    # the fitted model predicts on plain host arrays
    p = m.predict(coll.test.ids[:8], coll.test.vals[:8])
    assert p.shape == (8,)


def test_fm_facade_mesh_rejects_unsupported_solver():
    # sgd/als/mcmc all reach the mesh now (round 4); a CALLABLE solver
    # has no sharded form — still rejected loudly.
    with pytest.raises(ValueError):
        FM(solver=lambda *a: None, mesh="4x2").fit(
            synth.synth_movielens(num_examples=100, seed=1))


def test_mesh_batch_size_divisibility_error():
    ds = synth.synth_movielens(num_examples=300, seed=14)
    cfg = FMConfig(num_features=ds.num_features, num_factors=2, seed=14)
    sgd_cfg = SGDConfig(batch_size=100, optimizer="adagrad", epochs=1)
    with pytest.raises(ValueError):
        trainer.train_sgd(cfg, sgd_cfg, ds, mesh=M.make_mesh(8, 1))


def test_meshconfig_exchange_pinning():
    """MeshConfig.exchange pins the sparse exchange; all three strategies
    train to the same result through the one-call entry point."""
    ds = synth.synth_movielens(num_users=40, num_items=50,
                               num_examples=1200, seed=21)
    coll = split_by_random(ds, 0.8, 0.2, seed=21)
    cfg = FMConfig(num_features=ds.num_features, num_factors=3,
                   reg_v=0.01, seed=21)
    sgd_cfg = SGDConfig(batch_size=256, learning_rate=0.1,
                        optimizer="adagrad", epochs=2,
                        shuffle_each_epoch=False)
    rmses = {}
    for ex in ("auto", "global", "unique", "dense"):
        res = trainer.train_sgd(cfg, sgd_cfg, coll.training, coll.test,
                                mesh=MeshConfig(data=4, model=2,
                                                exchange=ex))
        rmses[ex] = res.history[-1]["eval_rmse"]
    base = rmses["auto"]
    for ex, r in rmses.items():
        assert abs(r - base) < 1e-4, rmses

    with pytest.raises(ValueError, match="host_plan"):
        trainer.train_sgd(
            cfg, SGDConfig(batch_size=256, host_plan=False),
            coll.training, mesh=MeshConfig(data=4, model=2,
                                           exchange="global"))
