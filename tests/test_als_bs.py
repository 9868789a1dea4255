"""BS-ALS: non-materialized relational ALS (VERDICT r2 missing #2).

The sweep must be mathematically identical to running solvers/als.py on
the materialized matrix — same global block partition, same guarded theta
rule, same exact quadratic e/q patches — while never building anything of
size N x (Lm + sum Lr). Parity is asserted parameter-by-parameter.
"""

import jax
import numpy as np
import pytest

from sparkfm_tpu.config import ALSConfig, FMConfig
from sparkfm_tpu.data import datasets as D
from sparkfm_tpu.data.split import split_by_random
from sparkfm_tpu.models import fm as fm_model
from sparkfm_tpu.solvers import als as als_mod
from sparkfm_tpu.solvers import als_bs


def _relational(n=800, with_blocks=False):
    """A genuine relational dataset: the MovieLens fixture with the
    users.dat side table, in block-structure form. with_blocks also
    returns field-aligned feature blocks (one block per one-hot source
    column, relation sub-columns separate) — within such a block no two
    features ever co-occur, so Jacobi == Gauss-Seidel exactly."""
    import os
    fix = os.path.join(os.path.dirname(__file__), "fixtures", "ml_fixture")
    from sparkfm_tpu.data.schema import Identity, Ignored, Target
    from sparkfm_tpu.data.schema import read_delimited
    from sparkfm_tpu.data.vectorizer import RelationVectorizer
    vec = RelationVectorizer([Identity("user"), Identity("item"),
                              Target("rating"), Ignored("ts")])
    vec.add_relation(read_delimited(os.path.join(fix, "users.dat"), "::"),
                     [Target("uid"), Identity("gender"), Identity("age"),
                      Identity("occupation"), Ignored("zip")],
                     join_column=0)
    rows = list(read_delimited(os.path.join(fix, "ratings.dat"), "::"))[:n]
    vec.fit(rows)
    rel = vec.transform_relational(rows)
    if not with_blocks:
        return rel
    blocks = np.zeros(vec.dimension, np.int32)
    nb = 0
    cols = sorted(vec.offsets, key=lambda i: vec.offsets[i])
    for g, col in enumerate(cols):
        start = vec.offsets[col]
        end = (vec.offsets[cols[g + 1]] if g + 1 < len(cols)
               else vec.dimension)
        if col in getattr(vec, "relations", {}):
            rv = vec.relations[col][0]
            rcols = sorted(rv.offsets, key=lambda i: rv.offsets[i])
            for h, rc in enumerate(rcols):
                rs = rv.offsets[rc]
                re_ = (rv.offsets[rcols[h + 1]] if h + 1 < len(rcols)
                       else rv.dimension)
                blocks[start + rs:start + re_] = nb
                nb += 1
        else:
            blocks[start:end] = nb
            nb += 1
    return rel, tuple(int(b) for b in blocks)


@pytest.mark.parametrize("block_mode", ["sequential", "field"])
def test_bs_sweep_matches_materialized_sweep(block_mode):
    if block_mode == "field":
        rel, blocks = _relational(with_blocks=True)
    else:
        rel = _relational()
        # strict sequential Gauss-Seidel: one feature per block, same
        # explicit partition on both paths (block_size=1 equivalent)
        blocks = tuple(range(rel.num_features))
    flat = rel.materialize()
    cfg = FMConfig(num_features=rel.num_features, num_factors=3,
                   reg_w=0.05, reg_v=0.1, seed=0)
    als_cfg = ALSConfig(epochs=3, block_size=1, feature_blocks=blocks)
    params0 = fm_model.init_params(cfg, jax.random.PRNGKey(2))

    res_flat = als_mod.train_als(cfg, als_cfg, flat, params=params0,
                                 eval_ds=flat)
    res_bs = als_bs.train_als_relational(cfg, als_cfg, rel, params=params0,
                                         eval_ds=rel)

    # Per-coordinate sums match the materialized path to float32 noise
    # (verified against a float64 brute force during development:
    # <5e-5 relative on num/den), but hundreds of SEQUENTIAL block
    # updates amplify summation-order noise chaotically — SURVEY §7:
    # "parity is judged on final RMSE, not per-sweep trajectories".
    np.testing.assert_allclose(float(res_bs.params.w0),
                               float(res_flat.params.w0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res_bs.params.w),
                               np.asarray(res_flat.params.w),
                               rtol=5e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res_bs.params.v),
                               np.asarray(res_flat.params.v),
                               rtol=5e-2, atol=5e-3)
    # the gate that matters: identical training quality
    r_flat = res_flat.history[-1]["eval_rmse"]
    r_bs = res_bs.history[-1]["eval_rmse"]
    assert abs(r_flat - r_bs) < 1e-3, (r_flat, r_bs)


def test_bs_als_trains_to_band_without_materialize(monkeypatch):
    """End-to-end: BS-ALS reaches the same RMSE band as materialized ALS
    on the fixture — with materialize() forbidden on the training path."""
    rel, blocks = _relational(n=4000, with_blocks=True)

    calls = {"n": 0}
    orig = type(rel).materialize

    def guarded(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(type(rel), "materialize", guarded)
    cfg = FMConfig(num_features=rel.num_features, num_factors=8,
                   reg_w=0.02, reg_v=0.05, seed=0)
    res = als_bs.train_als_relational(
        cfg, ALSConfig(epochs=8, feature_blocks=blocks), rel)
    assert calls["n"] == 0, "training must not materialize"

    flat_eval = rel.materialize()
    from sparkfm_tpu.training import trainer as T
    rmse = T.evaluate(res.params, cfg, flat_eval)["rmse"]
    # demographics-only user info: between full model (~0.88) and the
    # mean baseline (~1.14); see tests/test_real_data.py relational band
    assert rmse < 1.06, rmse


def test_facade_relational_als_routes_bs():
    """FM(solver='als').fit(RelationalDataset) uses the BS path (the
    reference's 'Method 2') instead of materializing first."""
    import sparkfm_tpu as sfm
    rel = _relational(n=1000)
    m = sfm.FM(solver="als", num_factors=4, max_iter=3, reg_v=0.1, seed=0)
    model = m.fit(rel, eval_ds=rel)
    assert np.isfinite(np.asarray(model.params.v)).all()
    recs = [r for r in model.history if "eval_rmse" in r]
    assert recs and recs[-1]["eval_rmse"] < 1.3


def test_relational_als_honors_max_seconds():
    """The wall-clock budget (reference `timeout`, FM.scala:30) stops
    the BS-ALS loop too (code-review r5: it was silently ignored on the
    relational path)."""
    rel = _relational()
    cfg = FMConfig(num_features=rel.num_features, num_factors=2,
                   reg_v=0.1, seed=0)
    res = als_bs.train_als_relational(
        cfg, ALSConfig(epochs=200, block_size=4, max_seconds=1e-6), rel)
    assert len(res.history) == 1
