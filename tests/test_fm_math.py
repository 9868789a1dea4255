"""FM core-math tests against a brute-force O(nnz^2) pairwise oracle.

The oracle computes y(x) = w0 + <w,x> + sum_{i<j} <v_i, v_j> x_i x_j directly
on dense vectors; the framework path uses the O(k*nnz) identity
(reference math: fm/FMModel.scala:34-63). SURVEY §7 step 1.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparkfm_tpu.config import FMConfig, Task
from sparkfm_tpu.models import fm as fm_model
from sparkfm_tpu.ops import interaction as I


def dense_oracle(w0, w, v, x_dense):
    """Brute force pairwise FM on a dense batch (B, F)."""
    B, F = x_dense.shape
    out = np.full((B,), w0, np.float64)
    out += x_dense @ w
    for b in range(B):
        for i in range(F):
            if x_dense[b, i] == 0:
                continue
            for j in range(i + 1, F):
                if x_dense[b, j] == 0:
                    continue
                out[b] += np.dot(v[i], v[j]) * x_dense[b, i] * x_dense[b, j]
    return out


def random_sparse_batch(rng, B, F, L):
    """Random padded CSR batch with distinct ids per row + its dense form."""
    ids = np.zeros((B, L), np.int32)
    vals = np.zeros((B, L), np.float32)
    dense = np.zeros((B, F), np.float64)
    for b in range(B):
        nnz = rng.integers(0, L + 1)
        cols = rng.choice(F, size=nnz, replace=False)
        v = rng.normal(size=nnz)
        ids[b, :nnz] = cols
        vals[b, :nnz] = v
        dense[b, cols] = v
    return ids, vals, dense


@pytest.mark.parametrize("B,F,L,K", [(5, 12, 6, 4), (7, 30, 10, 8), (3, 8, 8, 1)])
def test_fm_scores_match_pairwise_oracle(B, F, L, K):
    rng = np.random.default_rng(0)
    w0 = rng.normal()
    w = rng.normal(size=F)
    v = rng.normal(size=(F, K))
    ids, vals, dense = random_sparse_batch(rng, B, F, L)

    got = I.fm_scores(jnp.float32(w0), jnp.asarray(w, jnp.float32),
                      jnp.asarray(v, jnp.float32),
                      jnp.asarray(ids), jnp.asarray(vals))
    want = dense_oracle(w0, w, v, dense)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_padding_is_exact_noop():
    """Extra slots with val==0 (any id) must not change the score."""
    rng = np.random.default_rng(1)
    F, K = 20, 4
    w0 = rng.normal()
    w = jnp.asarray(rng.normal(size=F), jnp.float32)
    v = jnp.asarray(rng.normal(size=(F, K)), jnp.float32)
    ids = jnp.asarray([[3, 7, 11]], jnp.int32)
    vals = jnp.asarray([[0.5, -1.0, 2.0]], jnp.float32)
    ids_pad = jnp.asarray([[3, 7, 11, 0, 5, 19]], jnp.int32)
    vals_pad = jnp.asarray([[0.5, -1.0, 2.0, 0.0, 0.0, 0.0]], jnp.float32)
    a = I.fm_scores(jnp.float32(w0), w, v, ids, vals)
    b = I.fm_scores(jnp.float32(w0), w, v, ids_pad, vals_pad)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_duplicate_ids_follow_math_not_dedup():
    """Two slots with the same id behave like x_i split in two (the identity
    sums over slots): (a+b) in the sum term — verified against oracle with
    merged value."""
    rng = np.random.default_rng(2)
    F, K = 10, 3
    w0 = 0.0
    w = rng.normal(size=F)
    v = rng.normal(size=(F, K))
    # duplicate id 4 with values 0.3 and 0.7 == dense x[4] = 1.0 for the
    # linear and "sum" part, but the self-interaction differs: the identity
    # treats slots as separate features with zero self-interaction between
    # them... actually (sum)^2 - sum(sq) over slots gives cross term
    # 2*0.3*0.7*<v4,v4>, i.e. duplicates DO interact with themselves —
    # matching libFM semantics where a repeated index contributes pairwise.
    ids = jnp.asarray([[4, 4]], jnp.int32)
    vals = jnp.asarray([[0.3, 0.7]], jnp.float32)
    got = I.fm_scores(jnp.float32(w0), jnp.asarray(w, jnp.float32),
                      jnp.asarray(v, jnp.float32), ids, vals)
    want = (w[4] * 1.0 + np.dot(v[4], v[4]) * 0.3 * 0.7)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-5)


def test_init_params_keyed_and_shaped():
    cfg = FMConfig(num_features=100, num_factors=8, seed=42, init_stdev=0.01)
    p1 = fm_model.init_params(cfg)
    p2 = fm_model.init_params(cfg)
    assert p1.v.shape == (100, 8)
    assert p1.w.shape == (100,)
    assert p1.w0.shape == ()
    # deterministic under seed (reference ignores its seed: FMModel.scala:14)
    np.testing.assert_array_equal(np.asarray(p1.v), np.asarray(p2.v))
    p3 = fm_model.init_params(cfg.replace(seed=43))
    assert not np.array_equal(np.asarray(p1.v), np.asarray(p3.v))
    assert abs(float(jnp.std(p1.v)) - 0.01) < 0.002


def test_predict_heads():
    cfg = FMConfig(num_features=10, num_factors=2, task=Task.CLASSIFICATION)
    p = fm_model.init_params(cfg)
    ids = jnp.zeros((4, 3), jnp.int32)
    vals = jnp.zeros((4, 3), jnp.float32)
    prob = fm_model.predict(p, cfg, ids, vals)
    assert np.all(np.asarray(prob) >= 0) and np.all(np.asarray(prob) <= 1)
    cfg_r = cfg.replace(task=Task.REGRESSION)
    raw = fm_model.predict(p, cfg_r, ids, vals)
    np.testing.assert_allclose(np.asarray(raw), float(p.w0), atol=1e-6)


def test_fm_scores_jit_and_grad():
    cfg = FMConfig(num_features=50, num_factors=4)
    p = fm_model.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 50, (8, 5)), jnp.int32)
    vals = jnp.asarray(np.random.default_rng(4).normal(size=(8, 5)), jnp.float32)

    @jax.jit
    def loss(p):
        s = fm_model.scores(p, cfg, ids, vals)
        return jnp.mean(jnp.square(s))

    g = jax.grad(loss)(p)
    assert g.v.shape == p.v.shape
    assert np.isfinite(float(loss(p)))
    assert np.all(np.isfinite(np.asarray(g.v)))


def test_scores_with_host_plan_exact():
    """scores(plan=host ladder plan) == scores(no plan) bit-for-bit on the
    same ids — the serving hot path (models/fm.scores plan= route)."""
    import numpy as np
    from sparkfm_tpu.config import FMConfig
    from sparkfm_tpu.models import fm as fm_model
    from sparkfm_tpu.ops import embedding as E

    rng = np.random.default_rng(31)
    F, B, L, K = 1 << 17, 64, 7, 8
    cfg = FMConfig(num_features=F, num_factors=K, seed=31)
    params = fm_model.init_params(cfg, jax.random.PRNGKey(31))
    ids = rng.integers(0, F, (B, L)).astype(np.int32)
    vals = rng.normal(size=(B, L)).astype(np.float32)

    s_ref = np.asarray(fm_model.scores(
        params, cfg, jnp.asarray(ids), jnp.asarray(vals)))

    hp = E.host_dedup(ids, E.auto_budget(B * L), fill=0)
    rung = E.ladder_budget(int(hp.count))
    hp = hp._replace(uids=hp.uids[:rung])
    plan = E.DedupBatch(
        uids=jnp.asarray(hp.uids), ranks=jnp.asarray(hp.ranks),
        count=jnp.asarray(hp.count), overflow=jnp.asarray(hp.overflow),
        order=None, seg=None)
    s_plan = np.asarray(fm_model.scores(
        params, cfg, jnp.asarray(ids), jnp.asarray(vals), plan=plan))
    np.testing.assert_allclose(s_plan, s_ref, rtol=1e-6, atol=1e-6)

    # predict_dataset / evaluate route plans automatically for big tables
    from sparkfm_tpu.data.batching import SparseDataset
    from sparkfm_tpu.training import trainer as T
    ds = SparseDataset(ids=ids, vals=vals,
                       y=rng.normal(size=(B,)).astype(np.float32),
                       num_features=F)
    m = T.evaluate(params, cfg, ds, batch_size=32)
    direct_rmse = float(np.sqrt(np.mean(np.square(s_ref - ds.y))))
    np.testing.assert_allclose(m["rmse"], direct_rmse, rtol=1e-5)
