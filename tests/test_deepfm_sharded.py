"""Sharded DeepFM (BASELINE config 5 on a mesh; VERDICT r2 missing #5).

The (data, model) shard_map step must compute the same update as the
single-device dedup step: tables move through the unique-row exchange,
the tower is data-parallel with psum'd grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sparkfm_tpu as sfm
from sparkfm_tpu.config import FMConfig, SGDConfig, Task
from sparkfm_tpu.data import synth
from sparkfm_tpu.data.batching import batch_iterator
from sparkfm_tpu.models import deepfm as DF
from sparkfm_tpu.parallel import mesh as M
from sparkfm_tpu.parallel import sharded_deepfm as SD


def _data(n=2048, fields=8, buckets=512, seed=0):
    return synth.synth_ctr(num_examples=n, num_fields=fields,
                           num_buckets=buckets, seed=seed)


@pytest.mark.parametrize("mesh_shape,opt", [((4, 2), "adagrad"),
                                            ((2, 4), "sgd"),
                                            ((8, 1), "adagrad"),
                                            ((1, 8), "adagrad")])
def test_sharded_deepfm_matches_single_device(mesh_shape, opt):
    ds = _data()
    mesh = M.make_mesh(*mesh_shape)
    fm_cfg = FMConfig(num_features=ds.num_features, num_factors=4,
                      task=Task.CLASSIFICATION, reg_w=0.01, reg_v=0.02,
                      num_fields=8, seed=0)
    cfg = DF.DeepFMConfig(fm=fm_cfg, hidden=(16, 8))
    sgd_cfg = SGDConfig(batch_size=256, learning_rate=0.1, optimizer=opt,
                        update_path="dedup", unique_budget=2048)

    state_sh, pcfg = SD.init_sharded_state(cfg, mesh,
                                           jax.random.PRNGKey(1))
    step_sh = SD.make_sharded_train_step(pcfg, sgd_cfg, mesh)

    # reference: single-device dedup step from the identical padded init
    params0 = DF.init_params(pcfg, jax.random.PRNGKey(1))
    state_ref = DF.init_state(params0)
    # padded cfg already has the dummy row inside num_features; the
    # single-device dedup step expects the +1 dummy appended, so emulate
    # by treating the padded table's last row as dummy: shrink by one.
    ref_cfg = DF.DeepFMConfig(
        fm=pcfg.fm.replace(num_features=pcfg.fm.num_features - 1),
        hidden=cfg.hidden)
    step_ref = DF.make_train_step(ref_cfg, sgd_cfg)

    it1 = batch_iterator(ds, sgd_cfg.batch_size, shuffle=False)
    it2 = batch_iterator(ds, sgd_cfg.batch_size, shuffle=False)
    for _ in range(3):
        state_sh, aux_sh = step_sh(state_sh, next(it1))
        state_ref, aux_ref = step_ref(state_ref, next(it2))
        np.testing.assert_allclose(float(aux_sh["loss"]),
                                   float(aux_ref["loss"]), rtol=1e-5)

    p_sh, p_ref = state_sh["params"], state_ref["params"]
    F = ds.num_features          # compare true rows only: the dummy row is
    #                              zeroed by the single-device write-back
    #                              but left at init by the sharded
    #                              scatter-add (both are garbage by
    #                              contract and trimmed before scoring)
    np.testing.assert_allclose(np.asarray(p_sh.fm.w0),
                               np.asarray(p_ref.fm.w0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_sh.fm.v)[:F],
                               np.asarray(p_ref.fm.v)[:F],
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(p_sh.mlp_w, p_ref.mlp_w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_deepfm_rejects_adam():
    mesh = M.make_mesh(4, 2)
    cfg = DF.DeepFMConfig(
        fm=FMConfig(num_features=64, num_factors=2, num_fields=4),
        hidden=(8,))
    with pytest.raises(ValueError, match="adagrad"):
        SD.make_sharded_train_step(cfg, SGDConfig(optimizer="adam"), mesh)


def test_deepfm_optimizer_honored_or_rejected():
    """VERDICT r2 weak #5: FM(model='deepfm', optimizer='adam') must not
    silently train adagrad."""
    ds = _data(n=512)
    with pytest.raises(ValueError, match="adagrad"):
        sfm.FM(model="deepfm", solver="sgd", optimizer="adam",
               num_fields=8, max_iter=1).fit(ds)
    # plain sgd is actually honored: same config trains and the tables
    # move without any accumulator state
    m = sfm.FM(model="deepfm", solver="sgd", optimizer="sgd",
               learning_rate=0.05, num_fields=8, max_iter=1,
               batch_size=256, task="classification")
    model = m.fit(ds)
    assert np.isfinite(np.asarray(model.params.fm.v)).all()


def test_facade_deepfm_on_mesh_end_to_end():
    """FM(mesh=..., model='deepfm') — previously raised (api.py rejected
    mesh+deepfm); now config 5 runs on the 8-device mesh and learns."""
    ds = _data(n=4096)
    m = sfm.FM(model="deepfm", solver="sgd", task="classification",
               num_factors=4, num_fields=8, hidden=(16, 8),
               learning_rate=0.1, batch_size=512, max_iter=3,
               mesh="4x2", seed=0)
    model = m.fit(ds, eval_ds=ds)
    aucs = [r["eval_auc"] for r in model.history if "eval_auc" in r]
    assert aucs[-1] > 0.62, aucs
    # scoring path (replicated, trimmed params) still works off-mesh
    s = model.predict_dataset(ds)
    assert np.isfinite(s).all()


def test_deepfm_global_plan_matches_device_dedup():
    """Sharded DeepFM with a global host plan (backward = one psum)
    matches the device-dedup per-shard exchange (backward all_gather)."""
    import dataclasses

    from sparkfm_tpu.ops import embedding as E

    ds = synth.synth_ctr(num_examples=1024, num_fields=5, num_buckets=256,
                         seed=27)
    cfg = DF.DeepFMConfig(
        fm=FMConfig(num_features=ds.num_features, num_factors=4,
                    num_fields=5, task=Task.CLASSIFICATION,
                    reg_w=1e-4, reg_v=1e-4, seed=27),
        hidden=(16,))
    sgd_cfg = SGDConfig(batch_size=256, learning_rate=0.1,
                        optimizer="adagrad", unique_budget=256)
    mesh = M.make_mesh(4, 2)
    finals, losses = [], []
    for use_global in (True, False):
        state, pcfg = SD.init_sharded_state(cfg, mesh,
                                            jax.random.PRNGKey(28))
        fill = pcfg.fm.num_features - 1
        step = SD.make_sharded_train_step(pcfg, sgd_cfg, mesh)
        ls = []
        for i, b in enumerate(batch_iterator(ds, 256, shuffle=False)):
            if i == 3:
                break
            if use_global:
                hp = E.host_dedup(np.asarray(b.ids), 256, fill)
                plan = E.DedupBatch(
                    uids=jnp.asarray(hp.uids), ranks=jnp.asarray(hp.ranks),
                    count=jnp.asarray(hp.count),
                    overflow=jnp.asarray(hp.overflow),
                    order=None, seg=None)
                b = dataclasses.replace(b, plan=plan)
            state, aux = step(state, b)
            assert not bool(aux["unique_overflow"])
            ls.append(float(aux["loss"]))
        finals.append(jax.tree_util.tree_map(np.asarray, state["params"]))
        losses.append(ls)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    np.testing.assert_allclose(finals[0].fm.v, finals[1].fm.v,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(finals[0].mlp_w[0], finals[1].mlp_w[0],
                               rtol=1e-4, atol=1e-6)


def test_deepfm_mesh_exchange_honored_or_rejected():
    """MeshConfig.exchange must not be silently dropped by the DeepFM
    sharded path (ADVICE r3 low): dense -> rejected; unique -> trains
    through stacked plans to the same quality as the global default."""
    import pytest

    from sparkfm_tpu.api import FM
    from sparkfm_tpu.config import MeshConfig

    ds = synth.synth_ctr(num_examples=768, num_fields=4, num_buckets=128,
                         seed=31)
    kw = dict(num_factors=4, task="classification", solver="sgd",
              max_iter=2, model="deepfm", hidden=(8,), num_fields=4,
              batch_size=128, learning_rate=0.05, seed=31)
    with pytest.raises(ValueError, match="dense"):
        FM(mesh=MeshConfig(data=4, model=2, exchange="dense"),
           **kw).fit(ds)
    m_u = FM(mesh=MeshConfig(data=4, model=2, exchange="unique"),
             **kw).fit(ds, eval_ds=ds)
    m_g = FM(mesh=MeshConfig(data=4, model=2), **kw).fit(ds, eval_ds=ds)
    au = m_u.history[-1]["eval_auc"]
    ag = m_g.history[-1]["eval_auc"]
    assert abs(au - ag) < 5e-3, (au, ag)


def test_deepfm_mesh_checkpoint_bitexact_resume(tmp_path):
    """Sharded DeepFM checkpoint/resume on the virtual mesh: the resumed
    run matches an uninterrupted one bit-for-bit."""
    from sparkfm_tpu.api import FM
    from sparkfm_tpu.config import MeshConfig

    ds = synth.synth_ctr(num_examples=768, num_fields=4, num_buckets=128,
                         seed=18)
    kw = dict(num_factors=4, task="classification", solver="sgd",
              model="deepfm", hidden=(8,), num_fields=4, batch_size=128,
              learning_rate=0.05, seed=18)

    m_full = FM(max_iter=4, mesh=MeshConfig(data=4, model=2), **kw).fit(ds)
    ck = str(tmp_path / "dfm_mesh_ck")
    FM(max_iter=2, mesh=MeshConfig(data=4, model=2), **kw).fit(
        ds, checkpoint_dir=ck)
    m_res = FM(max_iter=4, mesh=MeshConfig(data=4, model=2), **kw).fit(
        ds, checkpoint_dir=ck)

    np.testing.assert_array_equal(np.asarray(m_full.params.fm.v),
                                  np.asarray(m_res.params.fm.v))
    np.testing.assert_array_equal(np.asarray(m_full.params.fm.w),
                                  np.asarray(m_res.params.fm.w))
    for a, b in zip(m_full.params.mlp_w, m_res.params.mlp_w):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
