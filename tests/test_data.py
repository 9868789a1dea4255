"""Data layer tests: libFM round-trip, splits, batching, synthetic sets."""

import os

import numpy as np
import pytest

from sparkfm_tpu.data import libfm, split, synth
from sparkfm_tpu.data.batching import (SparseDataset, batch_iterator,
                                       pack_examples)


def test_libfm_round_trip(tmp_path):
    """Save->load is exact (fixes the reference's 1-based-write/0-based-read
    shift, FMUtils.scala:63 vs :33, and its ~3-decimal truncation :71-74)."""
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(50):
        nnz = rng.integers(1, 6)
        ids = np.sort(rng.choice(100, nnz, replace=False))
        vals = rng.normal(size=nnz)
        rows.append((rng.normal(), ids, vals))
    ds = pack_examples(rows, num_features=100)
    path = str(tmp_path / "data.libfm")
    libfm.save_libfm(ds, path)
    ds2 = libfm.load_libfm(path, num_features=100)
    assert ds2.num_examples == ds.num_examples
    for i in range(ds.num_examples):
        a = {int(j): float(v) for j, v in zip(ds.ids[i], ds.vals[i]) if v != 0}
        b = {int(j): float(v) for j, v in zip(ds2.ids[i], ds2.vals[i]) if v != 0}
        assert a == b
        assert ds.y[i] == pytest.approx(ds2.y[i], abs=0)


def test_libfm_parses_comments_and_infers_dim(tmp_path):
    path = str(tmp_path / "t.libfm")
    with open(path, "w") as f:
        f.write("# comment line\n")
        f.write("1.5 0:1.0 7:2.5\n")
        f.write("\n")
        f.write("-1 3:0.5\n")
    ds = libfm.load_libfm(path)
    assert ds.num_examples == 2
    assert ds.num_features == 8  # max index + 1 (FMUtils.scala:40-47 semantics)
    assert ds.y[0] == 1.5 and ds.y[1] == -1.0
    assert ds.vals[0, 1] == 2.5 and ds.ids[0, 1] == 7


def test_split_deterministic_and_disjoint():
    ds = synth.synth_movielens(num_users=20, num_items=30, num_examples=500)
    c1 = split.split_by_random(ds, 0.8, 0.2, seed=5)
    c2 = split.split_by_random(ds, 0.8, 0.2, seed=5)
    np.testing.assert_array_equal(c1.training.y, c2.training.y)
    assert c1.training.num_examples + c1.test.num_examples == 500
    assert abs(c1.training.num_examples - 400) <= 1
    c3 = split.split_by_random(ds, 0.8, 0.2, seed=6)
    assert not np.array_equal(c1.training.y, c3.training.y)
    with pytest.raises(ValueError):
        split.split_by_random(ds, 0.0, 1.0)


def test_split_with_validation():
    ds = synth.synth_movielens(num_users=10, num_items=10, num_examples=300)
    c = split.split_by_random(ds, 0.6, 0.2, 0.2, seed=1)
    total = (c.training.num_examples + c.test.num_examples
             + c.validation.num_examples)
    assert total == 300


def test_batch_iterator_tail_masking():
    ds = synth.synth_movielens(num_users=5, num_items=5, num_examples=10)
    batches = list(batch_iterator(ds, batch_size=4))
    assert len(batches) == 3
    assert all(b.ids.shape == (4, 2) for b in batches)
    last = batches[-1]
    assert np.asarray(last.mask).sum() == 2
    # padded rows zeroed
    assert np.all(np.asarray(last.vals)[2:] == 0)
    # drop_remainder drops the tail
    assert len(list(batch_iterator(ds, 4, drop_remainder=True))) == 2


def test_batch_iterator_shuffle_keyed():
    ds = synth.synth_movielens(num_users=5, num_items=5, num_examples=64)
    a = list(batch_iterator(ds, 32, shuffle=True, seed=1, epoch=0))
    b = list(batch_iterator(ds, 32, shuffle=True, seed=1, epoch=0))
    c = list(batch_iterator(ds, 32, shuffle=True, seed=1, epoch=1))
    np.testing.assert_array_equal(np.asarray(a[0].y), np.asarray(b[0].y))
    assert not np.array_equal(np.asarray(a[0].y), np.asarray(c[0].y))


def test_synth_ctr_shapes_and_fields():
    ds = synth.synth_ctr(num_examples=100, num_fields=4, num_buckets=1 << 10)
    assert ds.ids.shape == (100, 4)
    assert ds.field_ids is not None
    assert set(np.unique(ds.field_ids)) == {0, 1, 2, 3}
    assert set(np.unique(ds.y)) <= {0.0, 1.0}
    fmap = synth.field_of_feature_map(1 << 10, 4)
    np.testing.assert_array_equal(fmap[ds.ids], ds.field_ids)
