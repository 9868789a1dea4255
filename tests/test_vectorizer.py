"""Schema-driven vectorization tests (reference parity: StandardVectorizor /
RelationVectorizor / DataNode semantics, fm/util/*.scala)."""

import numpy as np
import pytest

from sparkfm_tpu.data.schema import (Column, ColumnKind, Hashed, Identity,
                                     Ignored, List, Number, Target, Time,
                                     read_delimited, target_index,
                                     timestamp_to_days)
from sparkfm_tpu.data.vectorizer import RelationVectorizer, Vectorizer


def dense_row(ds, i):
    out = np.zeros(ds.num_features)
    for j in range(ds.max_nnz):
        if ds.vals[i, j] != 0:
            out[ds.ids[i, j]] += ds.vals[i, j]
    return out


class TestStandardVectorizer:
    def test_identity_one_hot_blocks(self):
        rows = [["3.0", "a", "x"], ["1.0", "b", "y"], ["2.0", "a", "y"]]
        vec = Vectorizer([Target(), Identity("u"), Identity("i")])
        ds = vec.fit_transform(rows)
        # blocks: col1 {a,b}+oov -> dim 3 at offset 0; col2 {x,y}+oov at 3
        assert vec.dimension == 6 == ds.num_features
        assert vec.offsets[1] == 0 and vec.offsets[2] == 3
        np.testing.assert_allclose(ds.y, [3.0, 1.0, 2.0])
        np.testing.assert_allclose(dense_row(ds, 0),
                                   [1, 0, 0, 1, 0, 0])  # a, x
        np.testing.assert_allclose(dense_row(ds, 1),
                                   [0, 1, 0, 0, 1, 0])  # b, y
        np.testing.assert_allclose(dense_row(ds, 2),
                                   [1, 0, 0, 0, 1, 0])  # a, y

    def test_vocab_deterministic_sorted(self):
        rows1 = [["0", "b"], ["0", "a"], ["0", "c"]]
        rows2 = [["0", "c"], ["0", "b"], ["0", "a"]]
        v1 = Vectorizer([Target(), Identity()]).fit(rows1)
        v2 = Vectorizer([Target(), Identity()]).fit(rows2)
        assert v1.vocabs[1] == v2.vocabs[1] == {"a": 0, "b": 1, "c": 2}

    def test_number_and_time(self):
        rows = [["1", "2.5", "86400"], ["0", "0.0", "172800"]]
        vec = Vectorizer([Target(), Number("n"), Time("t")])
        ds = vec.fit_transform(rows)
        assert vec.dimension == 2
        np.testing.assert_allclose(dense_row(ds, 0), [2.5, 1.0])
        # value 0.0 emits nothing (sparse semantics)
        np.testing.assert_allclose(dense_row(ds, 1), [0.0, 2.0])
        assert timestamp_to_days("86400") == 1.0

    def test_list_distribution_weights(self):
        # Reference DataNode.distribution: each element weight 1/len
        # (DataNode.scala:48-50).
        rows = [["0", "g1|g2"], ["1", "g1|g2|g3"], ["1", "g3"]]
        vec = Vectorizer([Target(), List("genres", separator="|")])
        ds = vec.fit_transform(rows)
        assert vec.vocabs[1] == {"g1": 0, "g2": 1, "g3": 2}
        np.testing.assert_allclose(dense_row(ds, 0), [0.5, 0.5, 0, 0])
        np.testing.assert_allclose(dense_row(ds, 1),
                                   [1 / 3, 1 / 3, 1 / 3, 0])
        np.testing.assert_allclose(dense_row(ds, 2), [0, 0, 1, 0])

    def test_list_unnormalized(self):
        rows = [["0", "a,b"]]
        vec = Vectorizer([Target(), List(normalize=False)])
        ds = vec.fit_transform(rows)
        np.testing.assert_allclose(dense_row(ds, 0)[:2], [1.0, 1.0])

    def test_malformed_rows_dropped(self):
        # Reference filter: features.size == definition.size
        # (StandardVectorizor.scala:12).
        rows = [["1", "a"], ["2", "b", "extra"], ["bad-target", "c"], ["3"]]
        vec = Vectorizer([Target(), Identity()])
        ds = vec.fit_transform(rows)
        assert ds.num_examples == 1
        assert vec.rows_dropped == 3

    def test_oov_bucket_on_unseen(self):
        train = [["1", "a"], ["0", "b"]]
        vec = Vectorizer([Target(), Identity()]).fit(train)
        ds = vec.transform([["1", "zzz"]])
        # unseen -> oov index 2 (vocab size 2)
        np.testing.assert_allclose(dense_row(ds, 0), [0, 0, 1])

    def test_no_oov_drops_unseen(self):
        vec = Vectorizer([Target(), Identity(oov=False)]).fit([["1", "a"]])
        ds = vec.transform([["1", "zzz"]])
        np.testing.assert_allclose(dense_row(ds, 0), [0.0])

    def test_hashed_column_stable(self):
        rows = [["0", "foo"], ["1", "bar"], ["0", "foo"]]
        vec = Vectorizer([Target(), Hashed(num_buckets=16)])
        ds = vec.fit_transform(rows)
        assert vec.dimension == 16
        assert ds.ids[0, 0] == ds.ids[2, 0]          # same value same bucket
        assert 0 <= int(ds.ids[1, 0]) < 16

    def test_ignored_column(self):
        rows = [["1", "drop-me", "a"]]
        vec = Vectorizer([Target(), Ignored(), Identity()])
        ds = vec.fit_transform(rows)
        assert vec.dimension == 2  # a + oov only

    def test_requires_exactly_one_target(self):
        with pytest.raises(ValueError):
            target_index([Identity(), Identity()])
        with pytest.raises(ValueError):
            target_index([Target(), Target()])

    def test_transform_before_fit_raises(self):
        with pytest.raises(RuntimeError):
            Vectorizer([Target(), Identity()]).transform([["1", "a"]])

    def test_vocab_save_load_roundtrip(self, tmp_path):
        rows = [["1", "a", "x,y"], ["0", "b", "y"]]
        vec = Vectorizer([Target(), Identity(), List()])
        ds1 = vec.fit_transform(rows)
        p = str(tmp_path / "vocab.json")
        vec.save_vocab(p)
        vec2 = Vectorizer([Target(), Identity(), List()]).load_vocab(p)
        ds2 = vec2.transform(rows)
        assert vec2.dimension == vec.dimension
        np.testing.assert_allclose(dense_row(ds1, 0), dense_row(ds2, 0))
        np.testing.assert_allclose(dense_row(ds1, 1), dense_row(ds2, 1))


class TestRelationVectorizer:
    """MovieLens-style join: ratings(user, movie, rating) x users(side)."""

    USERS = [["1", "F", "25"], ["2", "M", "35"]]          # key, gender, age
    RATINGS = [["5.0", "1", "m1"], ["3.0", "2", "m2"], ["4.0", "1", "m2"]]
    USER_SCHEMA = [Target("user_id"), Identity("gender"), Number("age")]

    def _vec(self):
        vec = RelationVectorizer([Target("rating"), Identity("user"),
                                  Identity("movie")])
        vec.add_relation(self.USERS, self.USER_SCHEMA, join_column=1)
        return vec

    def test_spliced_dimensions(self):
        vec = self._vec()
        ds = vec.fit_transform(self.RATINGS)
        # user column block = relation dim: gender {F,M}+oov (3) + age (1) = 4
        # movie block = {m1,m2}+oov = 3
        assert vec.block_dims[1] == 4
        assert vec.block_dims[2] == 3
        assert ds.num_features == 7

    def test_spliced_features(self):
        vec = self._vec()
        ds = vec.fit_transform(self.RATINGS)
        # row 0: user 1 -> gender F (idx 0), age 25; movie m1
        np.testing.assert_allclose(dense_row(ds, 0),
                                   [1, 0, 0, 25, 1, 0, 0])
        # row 1: user 2 -> gender M (idx 1), age 35; movie m2
        np.testing.assert_allclose(dense_row(ds, 1),
                                   [0, 1, 0, 35, 0, 1, 0])
        np.testing.assert_allclose(ds.y, [5.0, 3.0, 4.0])

    def test_missing_join_key_empty_block(self):
        vec = self._vec()
        vec.fit_transform(self.RATINGS)
        ds = vec.transform([["2.0", "999", "m1"]])
        np.testing.assert_allclose(dense_row(ds, 0), [0, 0, 0, 0, 1, 0, 0])

    def test_join_on_target_rejected(self):
        vec = RelationVectorizer([Target(), Identity()])
        with pytest.raises(ValueError):
            vec.add_relation(self.USERS, self.USER_SCHEMA, join_column=0)


def test_read_delimited(tmp_path):
    p = tmp_path / "ratings.dat"
    p.write_text("1::1193::5\n\n2::661::3\n", encoding="utf-8")
    rows = list(read_delimited(str(p), "::"))
    assert rows == [["1", "1193", "5"], ["2", "661", "3"]]


def test_end_to_end_vectorize_then_train():
    """Vectorized synthetic ratings -> SGD training improves RMSE (the
    reference's canonical flow, driver.scala:73-113, minus Spark)."""
    import sparkfm_tpu as sfm
    from sparkfm_tpu.training import trainer

    rng = np.random.default_rng(0)
    users = [f"u{i}" for i in range(30)]
    items = [f"m{i}" for i in range(40)]
    bias_u = {u: rng.normal(0, 0.5) for u in users}
    bias_i = {m: rng.normal(0, 0.5) for m in items}
    rows = []
    for _ in range(2000):
        u, m = users[rng.integers(30)], items[rng.integers(40)]
        y = 3.0 + bias_u[u] + bias_i[m] + rng.normal(0, 0.1)
        rows.append([f"{y:.3f}", u, m])
    vec = Vectorizer([Target(), Identity(), Identity()])
    ds = vec.fit_transform(rows)
    cfg = sfm.FMConfig(num_features=ds.num_features, num_factors=4,
                       reg_v=0.01, seed=0)
    res = trainer.train_sgd(
        cfg, sfm.SGDConfig(batch_size=256, epochs=8, learning_rate=0.1),
        ds, eval_ds=ds)
    assert res.history[-1]["eval_rmse"] < 0.35
