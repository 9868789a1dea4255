"""Checkpoint/resume tests (the reference has no persistence at all —
SURVEY §5 — so these pin down a brand-new capability: exact resume and
sharded save/restore)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sparkfm_tpu as sfm
from sparkfm_tpu.data import synth
from sparkfm_tpu.models import fm as fm_model
from sparkfm_tpu.solvers import sgd as sgd_solver
from sparkfm_tpu.training import trainer
from sparkfm_tpu.utils.checkpoint import Checkpointer


def tree_allclose(a, b, atol=0.0):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_state_roundtrip(tmp_path):
    cfg = sfm.FMConfig(num_features=32, num_factors=4, seed=1)
    state = sgd_solver.init_state(fm_model.init_params(cfg))
    with Checkpointer(str(tmp_path / "ck")) as ck:
        ck.save(0, state, extra={"epoch": 0, "note": "hi"})
        ck.wait()
        restored, extra = ck.restore(template=state)
    tree_allclose(state, restored)
    assert extra["epoch"] == 0 and extra["note"] == "hi"


def test_latest_step_and_retention(tmp_path):
    cfg = sfm.FMConfig(num_features=8, num_factors=2)
    state = sgd_solver.init_state(fm_model.init_params(cfg))
    with Checkpointer(str(tmp_path / "ck"), max_to_keep=2) as ck:
        for s in (0, 1, 2, 3):
            ck.save(s, state)
        ck.wait()
        assert ck.latest_step() == 3
        assert list(ck.all_steps()) == [2, 3]


def test_restore_missing_raises(tmp_path):
    with Checkpointer(str(tmp_path / "empty")) as ck:
        with pytest.raises(FileNotFoundError):
            ck.restore()


def test_resume_reproduces_uninterrupted_run(tmp_path):
    """Interrupted-at-epoch-3 + resumed run == straight 6-epoch run."""
    ds = synth.synth_movielens(num_users=30, num_items=40,
                               num_examples=1000, seed=0)
    cfg = sfm.FMConfig(num_features=ds.num_features, num_factors=4,
                       reg_v=0.01, seed=5)
    mk = lambda e: sfm.SGDConfig(batch_size=128, epochs=e, learning_rate=0.1)

    straight = trainer.train_sgd(cfg, mk(6), ds)

    ckdir = str(tmp_path / "resume_ck")
    trainer.train_sgd(cfg, mk(3), ds, checkpoint_dir=ckdir)
    resumed = trainer.train_sgd(cfg, mk(6), ds, checkpoint_dir=ckdir,
                                resume=True)

    tree_allclose(straight.params, resumed.params, atol=1e-7)


def test_sharded_save_restore(tmp_path):
    """Row-sharded state saves per-shard and restores with its sharding."""
    from sparkfm_tpu.parallel import mesh as M
    from sparkfm_tpu.parallel import sharded_sgd

    mesh = M.make_mesh(2, 4)
    cfg = sfm.FMConfig(num_features=64, num_factors=4, seed=0)
    state, pcfg = sharded_sgd.init_sharded_state(cfg, mesh,
                                                 jax.random.PRNGKey(0))
    with Checkpointer(str(tmp_path / "shck")) as ck:
        ck.save(0, state, extra={"epoch": 0})
        ck.wait()
        restored, _ = ck.restore(template=state)
    tree_allclose(state, restored)
    assert restored.params.w.sharding == state.params.w.sharding
    assert restored.params.v.sharding == state.params.v.sharding
