"""Profiling utils + multihost helpers (single-process, CPU mesh)."""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from sparkfm_tpu.parallel import mesh as M
from sparkfm_tpu.parallel import multihost
from sparkfm_tpu.utils import profiling


def test_step_timer_stats():
    t = profiling.StepTimer(sync="block")
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((128,))
    for _ in range(5):
        t.start()
        t.stop(f(x))
    s = t.stats()
    assert s["steps"] == 5 and s["mean_ms"] > 0
    assert s["p95_ms"] >= s["p50_ms"]


def test_trace_writes_files(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones((64,))))
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "profiler produced no files"


def test_annotate_compiles():
    @jax.jit
    def f(x):
        with profiling.annotate("interaction"):
            return jnp.sum(x * x)
    assert float(f(jnp.ones((8,)))) == 8.0


def test_log_metrics_format(caplog):
    with caplog.at_level(logging.INFO, logger="sparkfm_tpu"):
        profiling.log_metrics(3, {"loss": 0.5, "auc": 0.75})
    assert "step=3" in caplog.text and "auc=0.75" in caplog.text


def test_multihost_single_process_helpers():
    multihost.initialize()          # no-op on CPU single process
    mesh = multihost.global_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    sl = multihost.process_batch_slice(64)
    assert sl == slice(0, 64)

    from jax.sharding import PartitionSpec as P
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    g = multihost.host_local_to_global(mesh, P("data", None), x)
    np.testing.assert_allclose(np.asarray(g), x)
    assert g.sharding.spec == P("data", None)


def test_global_batch_lift():
    from sparkfm_tpu.data.batching import SparseBatch
    mesh = multihost.global_mesh(8, 1)
    b = SparseBatch(ids=jnp.zeros((8, 4), jnp.int32),
                    vals=jnp.ones((8, 4), jnp.float32),
                    y=jnp.zeros((8,), jnp.float32),
                    mask=jnp.ones((8,), bool))
    g = multihost.global_batch(mesh, b)
    assert g.ids.sharding.spec[0] == "data"
    assert g.field_ids is None
