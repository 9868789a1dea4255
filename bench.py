"""Headline benchmark: Criteo-shape logistic FM training throughput, 1 chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "examples/sec", "vs_baseline": N}

Config matches BASELINE.json config 3 (the headline): hashed sparse features,
rank-32 logistic FM, adagrad SGD with sparse row updates. The reference
publishes no numbers (BASELINE.md), so `vs_baseline` is measured against the
BASELINE.json north-star *per-chip* rate: >10M examples/s on a v5p-16
(8 chips) => 1.25M examples/s/chip. vs_baseline = value / 1.25e6.

Env knobs (all optional):
  BENCH_BUCKETS   feature buckets (default 2^22)
  BENCH_BATCH     batch size      (default 16384)
  BENCH_NNZ       actives/example (default 39, the Criteo field count)
  BENCH_RANK      factors         (default 32)
  BENCH_STEPS     timed steps     (default 30)
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sparkfm_tpu.config import FMConfig, SGDConfig, Task
    from sparkfm_tpu.data.batching import SparseBatch
    from sparkfm_tpu.models import fm as fm_model
    from sparkfm_tpu.solvers import sgd as sgd_solver

    buckets = int(os.environ.get("BENCH_BUCKETS", 1 << 22))
    batch = int(os.environ.get("BENCH_BATCH", 16384))
    nnz = int(os.environ.get("BENCH_NNZ", 39))
    rank = int(os.environ.get("BENCH_RANK", 32))
    steps = int(os.environ.get("BENCH_STEPS", 30))

    cfg = FMConfig(num_features=buckets, num_factors=rank,
                   task=Task.CLASSIFICATION, reg_w=1e-6, reg_v=1e-6, seed=0)
    sgd_cfg = SGDConfig(batch_size=batch, learning_rate=0.05,
                        optimizer="adagrad")

    params = fm_model.init_params(cfg, jax.random.PRNGKey(0))
    state = sgd_solver.init_state(params)
    step_fn = sgd_solver.make_train_step(cfg, sgd_cfg)

    # Pre-stage a handful of distinct device batches (power-law ids, like
    # synth_ctr but generated directly to keep host prep cheap).
    rng = np.random.default_rng(0)
    n_batches = 8
    batches = []
    for i in range(n_batches):
        raw = rng.zipf(1.3, size=(batch, nnz)).astype(np.int64)
        ids = ((raw * 2654435761) % buckets).astype(np.int32)
        y = rng.integers(0, 2, (batch,)).astype(np.float32)
        batches.append(SparseBatch(
            ids=jnp.asarray(ids),
            vals=jnp.ones((batch, nnz), jnp.float32),
            y=jnp.asarray(y),
            mask=jnp.ones((batch,), bool)))

    # Warmup / compile.
    state, aux = step_fn(state, batches[0])
    jax.block_until_ready(aux["loss"])
    for i in range(2):
        state, aux = step_fn(state, batches[(i + 1) % n_batches])
    jax.block_until_ready(aux["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, aux = step_fn(state, batches[i % n_batches])
    jax.block_until_ready(aux["loss"])
    dt = time.perf_counter() - t0

    eps = steps * batch / dt
    baseline_per_chip = 10e6 / 8  # north-star: 10M ex/s on v5p-16 (8 chips)
    print(json.dumps({
        "metric": "criteo_logistic_fm_rank32_train_throughput_1chip",
        "value": round(eps, 1),
        "unit": "examples/sec",
        "vs_baseline": round(eps / baseline_per_chip, 4),
    }))


if __name__ == "__main__":
    main()
