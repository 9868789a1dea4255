"""Block-structure (relational) data path tests.

The reference's BS extension is half-built (FMLearn.scala:14 self-recursion,
ALS.scala:77-136 commented out); here the gather-composition path must be a
working equal of the materialized path: identical feature space, identical
scores, and trainable end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np

import sparkfm_tpu as sfm
from sparkfm_tpu.data import relational as R
from sparkfm_tpu.data.schema import Identity, Number, Target
from sparkfm_tpu.data.vectorizer import RelationVectorizer
from sparkfm_tpu.models import fm as fm_model
from sparkfm_tpu.solvers import sgd as sgd_solver
from sparkfm_tpu.training import trainer

USERS = [["1", "F", "25"], ["2", "M", "35"], ["3", "F", "40"]]
USER_SCHEMA = [Target("uid"), Identity("gender"), Number("age")]
RATINGS = [["5.0", "1", "m1"], ["3.0", "2", "m2"], ["4.0", "1", "m2"],
           ["2.0", "3", "m3"], ["1.0", "999", "m1"]]  # 999: missing join


def fitted_vec():
    vec = RelationVectorizer([Target("rating"), Identity("user"),
                              Identity("movie")])
    vec.add_relation(USERS, USER_SCHEMA, join_column=1)
    vec.fit(RATINGS)
    return vec


class TestComposition:
    def test_materialize_matches_flat_transform(self):
        vec = fitted_vec()
        flat = vec.transform(RATINGS)
        rel = vec.transform_relational(RATINGS)
        assert rel.num_features == flat.num_features
        # Same dense rows under both paths.
        def dense(ds):
            out = np.zeros((ds.num_examples, ds.num_features))
            ids, vals = np.asarray(ds.ids), np.asarray(ds.vals)
            for i in range(ds.num_examples):
                for j in range(ids.shape[1]):
                    if vals[i, j] != 0:
                        out[i, ids[i, j]] += vals[i, j]
            return out
        np.testing.assert_allclose(dense(rel.materialize()), dense(flat))

    def test_missing_key_null_row(self):
        vec = fitted_vec()
        rel = vec.transform_relational(RATINGS)
        # row 4 joins key "999" -> null row (last row, all-zero vals)
        assert rel.keys[4, 0] == rel.tables[0].num_rows - 1
        np.testing.assert_allclose(
            np.asarray(rel.tables[0].vals)[rel.keys[4, 0]], 0.0)

    def test_scores_parity_composed_vs_materialized(self):
        vec = fitted_vec()
        rel = vec.transform_relational(RATINGS)
        flat = rel.materialize()
        cfg = sfm.FMConfig(num_features=rel.num_features, num_factors=4,
                           seed=1)
        params = fm_model.init_params(cfg, jax.random.PRNGKey(1))
        score_fn = R.make_relational_score_fn(cfg)
        tables = R.tables_to_device(rel.tables)
        batch = next(R.relational_batch_iterator(rel, rel.num_examples))
        s_rel = np.asarray(score_fn(params, batch, tables))
        s_flat = np.asarray(fm_model.scores(
            params, cfg, jnp.asarray(flat.ids), jnp.asarray(flat.vals)))
        np.testing.assert_allclose(s_rel, s_flat, rtol=1e-6, atol=1e-6)

    def test_train_step_parity_with_flat_path(self):
        """One SGD step on composed batches == one step on the materialized
        dataset (identical params after update)."""
        vec = fitted_vec()
        rel = vec.transform_relational(RATINGS)
        flat = rel.materialize()
        cfg = sfm.FMConfig(num_features=rel.num_features, num_factors=3,
                           reg_v=0.01, seed=0)
        sgd_cfg = sfm.SGDConfig(batch_size=rel.num_examples,
                                learning_rate=0.1, optimizer="adagrad")
        params = fm_model.init_params(cfg, jax.random.PRNGKey(0))

        # donate_argnums deletes the state's param buffers; give each run
        # its own copy.
        copy = lambda p: jax.tree_util.tree_map(jnp.array, p)
        s1 = sgd_solver.init_state(copy(params))
        step_rel = R.make_relational_train_step(cfg, sgd_cfg)
        tables = R.tables_to_device(rel.tables)
        rb = next(R.relational_batch_iterator(rel, rel.num_examples))
        s1, aux1 = step_rel(s1, rb, tables)

        s2 = sgd_solver.init_state(copy(params))
        step_flat = sgd_solver.make_train_step(cfg, sgd_cfg)
        from sparkfm_tpu.data.batching import batch_iterator
        fb = next(batch_iterator(flat, flat.num_examples))
        s2, aux2 = step_flat(s2, fb)

        np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.params.w),
                                   np.asarray(s2.params.w), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.params.v),
                                   np.asarray(s2.params.v), atol=1e-6)

    def test_tail_batch_padding(self):
        vec = fitted_vec()
        rel = vec.transform_relational(RATINGS)
        batches = list(R.relational_batch_iterator(rel, 3))
        assert len(batches) == 2
        assert batches[1].main_ids.shape[0] == 3
        assert int(jnp.sum(batches[1].mask)) == 2
        # padded rows key into null rows
        assert int(batches[1].keys[2, 0]) == rel.tables[0].num_rows - 1


def test_end_to_end_relational_training():
    """train_sgd_relational converges on planted relational data."""
    rng = np.random.default_rng(0)
    n_users, n_movies = 40, 50
    users = [[str(u), "MF"[u % 2], str(20 + u % 30)] for u in range(n_users)]
    rows = []
    for _ in range(3000):
        u, m = int(rng.integers(n_users)), int(rng.integers(n_movies))
        y = 3.0 + 0.5 * (u % 2) - 0.4 * (m % 4) + rng.normal(0, 0.1)
        rows.append([f"{y:.3f}", str(u), f"m{m}"])
    vec = RelationVectorizer([Target(), Identity("user"), Identity("movie")])
    # age as categorical: raw magnitudes ~35 would dominate early adagrad
    # steps; binning/standardizing numeric side features is data prep.
    vec.add_relation(users, [Target("uid"), Identity("gender"),
                             Identity("age")], join_column=1)
    vec.fit(rows)
    rel = vec.transform_relational(rows)
    cfg = sfm.FMConfig(num_features=rel.num_features, num_factors=4,
                       reg_v=0.01, seed=0)
    res = trainer.train_sgd_relational(
        cfg, sfm.SGDConfig(batch_size=512, epochs=30, learning_rate=0.2),
        rel, eval_ds=rel, eval_every=10)
    rmses = [h["eval_rmse"] for h in res.history if "eval_rmse" in h]
    assert rmses[-1] < 0.5, rmses
    assert rmses[-1] < rmses[0]


def test_facade_fits_relational_dataset():
    """FM facade routes RelationalDataset to the gather-join SGD path (the
    reference's FM.withRelation analog) and to materialize for ALS."""
    import numpy as np
    import sparkfm_tpu as sfm
    from sparkfm_tpu.data import relational as R

    rng = np.random.default_rng(0)
    n, keys_n = 400, 12
    # relation table: 3 one-hot features per key (relation-local ids 0..2)
    tbl = R.RelationTable(
        ids=jnp.asarray(np.concatenate(
            [rng.integers(0, 3, (keys_n, 1)), np.zeros((1, 1), int)]
        ).astype(np.int32)),
        vals=jnp.asarray(np.concatenate(
            [np.ones((keys_n, 1)), np.zeros((1, 1))]).astype(np.float32)),
        offset=20)
    main_ids = rng.integers(0, 20, (n, 2)).astype(np.int32)
    main_vals = np.ones((n, 2), np.float32)
    keys = rng.integers(0, keys_n, (n, 1)).astype(np.int32)
    y = rng.normal(size=(n,)).astype(np.float32)
    ds = R.RelationalDataset(main_ids=main_ids, main_vals=main_vals, y=y,
                             keys=keys, tables=(tbl,), num_features=23)
    m_sgd = sfm.FM(num_factors=2, solver="sgd", max_iter=2,
                   batch_size=64, reg_v=0.1).fit(ds)
    m_als = sfm.FM(num_factors=2, solver="als", max_iter=2,
                   reg_v=1.0).fit(ds)
    flat = ds.materialize()
    for m in (m_sgd, m_als):
        p = m.predict_dataset(flat)
        assert p.shape == (n,) and np.all(np.isfinite(p))
