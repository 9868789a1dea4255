"""High-level FM facade + CLI driver tests (reference L4/L6 surface:
FM.apply/learnWith, driver.scala flows)."""

import json

import numpy as np
import pytest

import sparkfm_tpu as sfm
from sparkfm_tpu import cli
from sparkfm_tpu.data import libfm, synth


@pytest.fixture(scope="module")
def ratings():
    return synth.synth_movielens(num_users=50, num_items=60,
                                 num_examples=4000, seed=0)


class TestFMFacade:
    def test_fit_als_and_metrics(self, ratings):
        model = sfm.FM(num_factors=4, max_iter=4, solver="als",
                       reg_v=0.1, seed=0).fit(ratings, eval_ds=ratings)
        rmse = model.compute_rmse(ratings)
        assert rmse < 0.6
        assert model.compute_mae(ratings) < rmse  # true MAE <= RMSE
        assert 0.0 <= model.compute_accuracy(ratings) <= 1.0
        assert model.history  # per-epoch records kept

    def test_fit_sgd(self, ratings):
        model = sfm.FM(num_factors=4, max_iter=6, solver="sgd",
                       learning_rate=0.1, batch_size=512, reg_v=0.01,
                       seed=0).fit(ratings)
        assert model.compute_rmse(ratings) < 0.8

    def test_custom_solver_callable(self, ratings):
        """The pluggable-solver slot (reference learnWith, FM.scala:19)."""
        calls = {}

        def my_solver(cfg, train, eval_ds, eval_every, key):
            calls["cfg"] = cfg
            from sparkfm_tpu.solvers.als import train_als
            return train_als(cfg, sfm.ALSConfig(epochs=2), train)

        model = sfm.FM(num_factors=3, solver=my_solver).fit(ratings)
        assert calls["cfg"].num_factors == 3
        assert np.isfinite(model.compute_rmse(ratings))

    def test_save_load_roundtrip(self, ratings, tmp_path):
        model = sfm.FM(num_factors=3, max_iter=2, solver="als",
                       reg_v=0.1).fit(ratings)
        d = str(tmp_path / "model")
        model.save(d)
        loaded = sfm.FMModel.load(d)
        assert loaded.cfg == model.cfg
        a = model.predict(ratings.ids[:8], ratings.vals[:8])
        b = loaded.predict(ratings.ids[:8], ratings.vals[:8])
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_unknown_solver_raises(self, ratings):
        with pytest.raises(ValueError):
            sfm.FM(solver="newton").fit(ratings)


class TestCLI:
    def _run(self, capsys, argv):
        rc = cli.main(argv)
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return json.loads(out)

    def test_movielens_demo(self, capsys):
        res = self._run(capsys, ["movielens-demo", "--synth-examples", "4000",
                                 "--iters", "3"])
        assert res["test_rmse"] < 1.2
        assert res["train_examples"] == 3200

    def test_vectorize_then_train_then_eval(self, capsys, tmp_path):
        # vectorize: write raw '::' file, export to libFM
        raw = tmp_path / "ratings.dat"
        rng = np.random.default_rng(0)
        with open(raw, "w") as f:
            for _ in range(2000):
                u, m = rng.integers(40), rng.integers(50)
                y = 3.0 + 0.5 * (u % 2) - 0.3 * (m % 3) + rng.normal(0, 0.1)
                f.write(f"u{u}::m{m}::{y:.3f}\n")
        out_libfm = str(tmp_path / "out.libfm")
        res = self._run(capsys, [
            "vectorize", "--input", str(raw), "--separator", "::",
            "--schema", "identity,identity,target",
            "--output", out_libfm,
            "--save-vocab", str(tmp_path / "vocab.json")])
        assert res["examples"] == 2000

        # train on the exported file, save the model
        model_dir = str(tmp_path / "model")
        res = self._run(capsys, [
            "train", "--libfm", out_libfm, "--solver", "als",
            "--factors", "4", "--iters", "4", "--reg-v", "0.1",
            "--split", "0.8,0.2", "--save-model", model_dir])
        assert res["test_rmse"] < 0.6
        assert res["saved_to"] == model_dir

        # eval the saved model
        res = self._run(capsys, ["eval", "--model", model_dir,
                                 "--libfm", out_libfm])
        assert res["rmse"] < 0.6

    def test_train_ffm_via_cli(self, capsys):
        res = self._run(capsys, [
            "train", "--synth", "ctr", "--synth-examples", "3000",
            "--task", "classification", "--solver", "sgd",
            "--factors", "4", "--fields", "16", "--iters", "2",
            "--reg-v", "1e-6", "--batch-size", "512", "--split", "0.8,0.2"])
        assert 0.4 <= res["test_auc"] <= 1.0

    def test_train_synth_sgd_classification(self, capsys):
        res = self._run(capsys, [
            "train", "--synth", "ctr", "--synth-examples", "3000",
            "--task", "classification", "--solver", "sgd",
            "--factors", "4", "--iters", "2", "--reg-v", "1e-6",
            "--batch-size", "512", "--split", "0.8,0.2"])
        assert 0.4 <= res["test_auc"] <= 1.0

    def test_parse_schema_dsl(self):
        cols = cli.parse_schema("target,identity,list:|,number,time,"
                                "hashed:64,ignored")
        from sparkfm_tpu.data.schema import ColumnKind
        kinds = [c.kind for c in cols]
        assert kinds == [ColumnKind.TARGET, ColumnKind.IDENTITY,
                         ColumnKind.LIST, ColumnKind.NUMBER,
                         ColumnKind.NUMBER, ColumnKind.HASHED,
                         ColumnKind.IGNORED]
        assert cols[2].separator == "|"
        assert cols[5].num_buckets == 64
        with pytest.raises(ValueError):
            cli.parse_schema("target,wat")
