"""MicroBatcher: coalesced scoring == per-request scoring."""

import numpy as np
import jax
import jax.numpy as jnp

from sparkfm_tpu.config import FMConfig, Task
from sparkfm_tpu.models import fm as fm_model
from sparkfm_tpu.serving import MicroBatcher, _pad_batch_size


def test_pad_ladder():
    assert _pad_batch_size(1, 4096) == 1
    assert _pad_batch_size(3, 4096) == 4
    assert _pad_batch_size(257, 4096) == 512
    assert _pad_batch_size(9000, 4096) == 4096


def test_microbatcher_matches_direct_scores():
    rng = np.random.default_rng(0)
    cfg = FMConfig(num_features=512, num_factors=4, seed=0)
    params = fm_model.init_params(cfg, jax.random.PRNGKey(0))
    mb = MicroBatcher(params, cfg, max_batch=64)
    reqs = []
    for i in range(7):
        n = int(rng.integers(1, 5))
        ids = rng.integers(0, 512, (n, 6)).astype(np.int32)
        vals = rng.normal(size=(n, 6)).astype(np.float32)
        reqs.append((ids, vals))
        idx = mb.submit(ids if n > 1 else ids[0],
                        vals if n > 1 else vals[0])
        assert idx == i
    assert mb.pending == sum(r[0].shape[0] for r in reqs)
    out = mb.flush()
    assert mb.pending == 0
    assert len(out) == 7
    for (ids, vals), got in zip(reqs, out):
        ref = np.asarray(fm_model.scores(params, cfg, ids, vals))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_microbatcher_big_table_plans_and_chunking():
    """Big table -> host plans engage; >max_batch queue flushes in
    ladder chunks; results still map per request."""
    rng = np.random.default_rng(1)
    cfg = FMConfig(num_features=1 << 17, num_factors=4, seed=1,
                   task=Task.CLASSIFICATION)
    params = fm_model.init_params(cfg, jax.random.PRNGKey(1))
    mb = MicroBatcher(params, cfg, max_batch=128)
    assert mb.use_plans
    reqs = []
    for _ in range(3):
        n = 100
        ids = rng.integers(0, 1 << 17, (n, 8)).astype(np.int32)
        vals = np.ones((n, 8), np.float32)
        reqs.append((ids, vals))
        mb.submit(ids, vals)
    out = mb.flush()
    from scipy.special import expit
    for (ids, vals), got in zip(reqs, out):
        ref = expit(np.asarray(fm_model.scores(params, cfg, ids, vals)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_microbatcher_deepfm():
    from sparkfm_tpu.config import FMConfig, Task
    from sparkfm_tpu.models import deepfm as DF
    rng = np.random.default_rng(3)
    dcfg = DF.DeepFMConfig(
        fm=FMConfig(num_features=256, num_factors=4, num_fields=5,
                    task=Task.CLASSIFICATION, seed=0),
        hidden=(8,))
    params = DF.init_params(dcfg, jax.random.PRNGKey(0))
    mb = MicroBatcher(params, dcfg, max_batch=32, model="deepfm")
    reqs = []
    per = 256 // 5
    for _ in range(4):
        n = int(rng.integers(1, 6))
        ids = (rng.integers(0, per, (n, 5)).astype(np.int32)
               + per * np.arange(5, dtype=np.int32)[None, :])
        vals = np.ones((n, 5), np.float32)
        reqs.append((ids, vals))
        mb.submit(ids, vals)
    out = mb.flush()
    for (ids, vals), got in zip(reqs, out):
        ref = np.asarray(DF.predict(params, dcfg, jnp.asarray(ids),
                                    jnp.asarray(vals)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_microbatcher_rejects_mixed_field_submissions():
    import pytest
    cfg = FMConfig(num_features=64, num_factors=2, num_fields=3, seed=0)
    params = fm_model.init_params(cfg, jax.random.PRNGKey(0))
    mb = MicroBatcher(params, cfg, max_batch=16)
    ids = np.zeros((1, 3), np.int32)
    vals = np.ones((1, 3), np.float32)
    mb.submit(ids, vals, field_ids=np.arange(3, dtype=np.int32)[None])
    with pytest.raises(ValueError, match="mixed"):
        mb.submit(ids, vals)                  # no field_ids
    # the queue is NOT poisoned: the good request still flushes
    out = mb.flush()
    assert len(out) == 1
