"""Native C++ libFM parser: build, parity with the Python reference parser,
and throughput sanity."""

import os
import time

import numpy as np
import pytest

from sparkfm_tpu.data import libfm, native_io


@pytest.fixture(scope="module")
def sample_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("libfm") / "data.libfm"
    rng = np.random.default_rng(0)
    lines = ["# comment line", ""]
    for i in range(500):
        nnz = int(rng.integers(1, 8))
        idx = np.sort(rng.choice(1000, nnz, replace=False))
        toks = [f"{rng.normal():.6f}"] + [
            f"{j}:{rng.normal():.4f}" for j in idx]
        lines.append(" ".join(toks))
        if i % 100 == 0:
            lines.append("# interleaved comment")
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_native_builds():
    assert native_io.available(), (
        "native parser failed to build — check native/Makefile and g++")


def test_parity_with_python_parser(sample_file):
    if not native_io.available():
        pytest.skip("no native lib")
    labels, idx_rows, val_rows = libfm._parse_lines_python(sample_file)
    y, ids, vals, max_idx = native_io.parse_libfm_padded(sample_file)
    assert len(y) == len(labels)
    np.testing.assert_allclose(y, np.asarray(labels, np.float32), rtol=1e-6)
    assert max_idx == max(int(r.max()) for r in idx_rows if len(r))
    L = ids.shape[1]
    for i in range(len(labels)):
        k = len(idx_rows[i])
        np.testing.assert_array_equal(ids[i, :k], idx_rows[i])
        np.testing.assert_allclose(vals[i, :k], val_rows[i], rtol=1e-5)
        assert (ids[i, k:] == 0).all() and (vals[i, k:] == 0).all()


def test_load_libfm_uses_native_and_roundtrips(sample_file, tmp_path):
    ds = libfm.load_libfm(sample_file)
    out = str(tmp_path / "rt.libfm")
    libfm.save_libfm(ds, out)
    ds2 = libfm.load_libfm(out, num_features=ds.num_features)
    assert ds2.num_examples == ds.num_examples
    np.testing.assert_allclose(ds2.y, ds.y, rtol=1e-6)
    # dense-equal rows (padding layout may differ)
    for i in range(0, ds.num_examples, 97):
        d1 = np.zeros(ds.num_features)
        d2 = np.zeros(ds.num_features)
        for j in range(ds.max_nnz):
            if ds.vals[i, j]:
                d1[ds.ids[i, j]] += ds.vals[i, j]
        for j in range(ds2.max_nnz):
            if ds2.vals[i, j]:
                d2[ds2.ids[i, j]] += ds2.vals[i, j]
        np.testing.assert_allclose(d2, d1, rtol=1e-5)


def test_scientific_notation_and_edge_values(tmp_path):
    if not native_io.available():
        pytest.skip("no native lib")
    p = tmp_path / "sci.libfm"
    p.write_text("1.5e2 0:1e-3 5:-2.5E1 9:+0.125\n-3 2:4\n")
    y, ids, vals, max_idx = native_io.parse_libfm_padded(str(p))
    np.testing.assert_allclose(y, [150.0, -3.0])
    np.testing.assert_allclose(vals[0, :3], [1e-3, -25.0, 0.125], rtol=1e-6)
    np.testing.assert_array_equal(ids[0, :3], [0, 5, 9])
    assert max_idx == 9


def test_native_throughput(tmp_path):
    """Native parse should beat the Python loop by a wide margin on a
    few-MB file (informational threshold: >=5x)."""
    if not native_io.available():
        pytest.skip("no native lib")
    p = tmp_path / "big.libfm"
    rng = np.random.default_rng(1)
    with open(p, "w") as f:
        for _ in range(40000):
            idx = rng.integers(0, 100000, 10)
            f.write("1 " + " ".join(f"{j}:0.5" for j in idx) + "\n")
    sz = os.path.getsize(p) / 1e6

    def best_of(fn, n=2):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(str(p))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_native = best_of(native_io.parse_libfm_padded)
    t_py = best_of(libfm._parse_lines_python)
    print(f"native {sz/t_native:.0f} MB/s vs python {sz/t_py:.0f} MB/s "
          f"({t_py/t_native:.1f}x)")
    # Typical speedup is >10x, but a loaded CI box squeezes the
    # multithreaded native parser hardest — only require "not slower".
    assert t_native < t_py


class TestNativeDedupPlan:
    """native/dedup_plan.cpp must match ops.embedding.host_dedup's numpy
    path element-for-element, including the STABLE sort order (ties keep
    slot order — the hybrid step's svals/sex depend on it)."""

    def _pair(self, ids, budget, fill, vals=None, monkeypatch=None):
        from sparkfm_tpu.ops import embedding as E
        nat = E.host_dedup(ids, budget, fill=fill, vals=vals)
        monkeypatch.setenv("SPARKFM_NO_NATIVE", "1")
        ref = E.host_dedup(ids, budget, fill=fill, vals=vals)
        monkeypatch.delenv("SPARKFM_NO_NATIVE")
        return nat, ref

    def test_parity_criteo_shape(self, monkeypatch):
        from sparkfm_tpu.data import native_io
        if not native_io._load_dedup():
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(0)
        ids = ((rng.zipf(1.3, size=(512, 39)).astype(np.int64)
                * 2654435761) % (1 << 22)).astype(np.int32)
        vals = rng.normal(size=(512, 39)).astype(np.float32)
        nat, ref = self._pair(ids, 1 << 12, 1 << 22, vals, monkeypatch)
        for f in ("uids", "ranks", "count", "overflow", "order", "seg",
                  "svals", "sex"):
            np.testing.assert_array_equal(
                np.asarray(getattr(nat, f)), np.asarray(getattr(ref, f)),
                err_msg=f)

    def test_parity_overflow_and_small_ids(self, monkeypatch):
        from sparkfm_tpu.data import native_io
        if not native_io._load_dedup():
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(1)
        # budget smaller than uniques -> overflow branch; 1-pass radix
        ids = rng.integers(0, 300, (64, 5)).astype(np.int32)
        nat, ref = self._pair(ids, 16, 300, None, monkeypatch)
        assert bool(nat.overflow) and bool(ref.overflow)
        for f in ("uids", "ranks", "count", "order", "seg"):
            np.testing.assert_array_equal(
                np.asarray(getattr(nat, f)), np.asarray(getattr(ref, f)),
                err_msg=f)
