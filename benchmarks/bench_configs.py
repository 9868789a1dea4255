"""TPU perf characterization for the non-headline BASELINE configs.

Invoked by bench.py as BENCH_MODE=als|ffm|deepfm (VERDICT r3 #2: of the
five BASELINE configs only config 3 had any measured TPU story). Each mode
stages synthetic data at its config's published shape, warms up, emits a
provisional JSON line, then the final line — the same stdout/stderr
contract as the headline bench, so the same parent supervisor hardening
applies.

  als     BASELINE config 2 — MovieLens-25M shape rating regression:
          rank-32 FM, full-dataset ALS sweeps (F = 162541 users + 59047
          movies = 221588 one-hot features, L = 2 slots/example),
          N = THE FULL 25M examples by default (VERDICT r4 #3; measured
          r5: 100.2 s/sweep on v5e — the r4 linear extrapolation from a
          500K slice said 59 s, optimistic because the memory-safe
          large-N gather forms cost ~1.7x the small-N paired forms and
          the sweep runs as K+1 dispatches past the runtime's ~60 s
          single-dispatch kill). Reference analog: the driver-sequential
          sweep at ALS.scala:15-75; here it is the blocked device sweep
          (solvers/als.py). Value = examples swept / sec; extra key
          sweep_ms = per-sweep wall time at the measured N.
  ffm     BASELINE config 4 — Avazu shape CTR: field-aware FM, 22 fields,
          hashed buckets (default 2^20; BENCH_BUCKETS=4194304 for the
          full 2^22 table — same throughput since the round-5 fused
          record), rank 8, B=8192, fused-record path + host ladder plans.
  deepfm  BASELINE config 5 — Criteo-shape DeepFM: 39 fields, 2^20
          buckets, rank 16, tower (256, 128), B=8192 (fused-record path
          + host ladder plans).

vs_baseline is NULL for these modes (VERDICT r4 #6): the reference
publishes no numbers for ANY config (BASELINE.md), and dividing by the
headline's 1.25M ex/s/chip north-star denominator wrote wrong-looking
ratios into the machine-read artifact (FFM does num_fields x the flops
per example; ALS is a different algorithm entirely). Each record instead
carries its own "baseline" note naming the comparison that WOULD apply.

Env knobs: BENCH_ALS_N (default 25_000_000 = the full dataset size; staging takes ~3.5 min through the tunnel), BENCH_STEPS (default 2 for als).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

def _emit(metric, value, extra=None, provisional=False, baseline=None):
    """One JSON line. vs_baseline is null for the config modes — no
    published reference number exists for any of them (see module doc);
    `baseline` is a human-readable note naming the would-be comparison."""
    rec = {"metric": metric, "value": round(value, 1),
           "unit": "examples/sec", "vs_baseline": None,
           "baseline": baseline or ("no published reference number for "
                                    "this config (BASELINE.md)")}
    if extra:
        rec.update(extra)
    if provisional:
        rec["provisional"] = True
    print(json.dumps(rec), flush=True)


def _rpc_latency(hb):
    import jax
    import jax.numpy as jnp
    tiny = jax.jit(lambda x: x + 1)
    y = tiny(jnp.float32(1.0)); _ = float(y)
    lat = []
    for _ in range(3):
        t0 = time.perf_counter(); y = tiny(y); _ = float(y)
        lat.append(time.perf_counter() - t0)
    hb(f"rpc latency {min(lat) * 1e3:.1f} ms")
    return min(lat)


def bench_als(hb):
    import jax
    import jax.numpy as jnp

    from sparkfm_tpu.config import ALSConfig, FMConfig
    from sparkfm_tpu.data.batching import SparseDataset
    from sparkfm_tpu.models import fm as fm_model
    from sparkfm_tpu.solvers import als as A

    n = int(os.environ.get("BENCH_ALS_N", 25_000_000))
    users, movies = 162541, 59047                 # true ML-25M cardinality
    f = users + movies
    rng = np.random.default_rng(0)
    hb(f"als: generating {n:,} examples, F={f}")
    uid = rng.integers(0, users, n).astype(np.int32)
    # zipf-ish movie popularity (real ratings are head-heavy)
    mid = ((rng.zipf(1.3, size=n).astype(np.int64) * 2654435761) % movies
           ).astype(np.int32)
    ids = np.stack([uid, users + mid], axis=1)
    vals = np.ones((n, 2), np.float32)
    y = (rng.integers(1, 11, n) * 0.5).astype(np.float32)
    ds = SparseDataset(ids=ids, vals=vals, y=y, num_features=f)

    cfg = FMConfig(num_features=f, num_factors=32, reg_w=0.1, reg_v=1.0,
                   seed=0)
    als_cfg = ALSConfig(feature_blocks=A.slot_blocks(ds))
    hb("als: staging workspace on device")
    ws, nb = A.build_workspace(ds, cfg, als_cfg)
    jax.block_until_ready(ws.col_val)
    params = fm_model.init_params(cfg, jax.random.PRNGKey(0))
    rw, rv = cfg.reg_vectors() if cfg.feature_groups is not None else (
        cfg.reg_w, cfg.reg_v)

    n_ranks = int(ws.present.shape[0])
    cpure = A.blocks_are_column_pure(ds, np.asarray(ws.block_of_feat))
    uniform = cpure and A.csc_blocks_uniform(ds,
                                             np.asarray(ws.block_of_feat))
    ident = A.csc_slice_identity(ws, nb, n) if uniform else ()
    # the runtime kills single dispatches over ~60 s ("TPU worker
    # crashed", measured): above an estimated ~25 s of sweep (nnz*K,
    # calibrated 100 s at 50M*32) run it as K+1 dispatches — identical
    # update sequence (tests/test_als.py)
    dispatched = ds.ids.size * cfg.num_factors > (4 * 10**8)
    hb(f"als: column_pure={cpure} csc_uniform={uniform} "
       f"dispatched={dispatched}")
    hb(f"als: slice_identity={ident}")
    if dispatched:
        sweep = lambda p, w: A.als_sweep_compact_dispatched(
            p, w, nb, cfg.num_features, n_ranks, cfg.reg0, rw, rv,
            column_pure=cpure, csc_uniform=uniform, slice_identity=ident)
    else:
        sweep = jax.jit(lambda p, w: A.als_sweep_compact(
            p, w, nb, cfg.num_features, n_ranks, cfg.reg0, rw, rv,
            column_pure=cpure, csc_uniform=uniform,
            slice_identity=ident))
    rpc = _rpc_latency(hb)
    hb("als: compiling sweep")
    params = sweep(params, ws)
    _ = float(params.w0)
    metric = "ml25m_shape_als_rank32_sweep_throughput_1chip"

    def run(k):
        nonlocal params
        t0 = time.perf_counter()
        for _ in range(k):
            params = sweep(params, ws)
        _ = float(params.w0) + float(jnp.sum(params.v[0]))
        dt = time.perf_counter() - t0 - rpc
        return k * n / dt, dt / k

    hb("als: provisional (1 sweep)")
    eps, sw = run(1)
    _emit(metric, eps, {"sweep_ms": round(sw * 1e3, 1), "n_examples": n},
          provisional=True)
    k = int(os.environ.get("BENCH_STEPS", 2))
    hb(f"als: measuring ({k} sweeps)")
    eps, sw = run(k)
    _emit(metric, eps, {"sweep_ms": round(sw * 1e3, 1), "n_examples": n})
    hb(f"als: {sw * 1e3:.0f} ms/sweep, {eps:,.0f} ex/s; done")


def _ctr_batches(rng, n_batches, batch, nnz, buckets, field_major,
                 host_plan_fill=None, ladder=None):
    """Zipf-id CTR batches (+ optional host dedup plans at a shared rung)."""
    from sparkfm_tpu.ops import embedding as E
    out = []
    rung = [1]
    cap = E.auto_budget(batch * nnz)
    for _ in range(n_batches):
        raw = rng.zipf(1.3, size=(batch, nnz)).astype(np.int64)
        ids = ((raw * 2654435761) % buckets).astype(np.int32)
        if field_major:
            # one feature per field: offset each slot into its own bucket
            # range (the synth_ctr layout)
            per = buckets // nnz
            ids = (ids % per) + per * np.arange(nnz, dtype=np.int32)[None, :]
        y = rng.integers(0, 2, (batch,)).astype(np.float32)
        hp = None
        if host_plan_fill is not None:
            hp = E.host_dedup(ids, cap, host_plan_fill)
            rung[0] = max(rung[0], E.ladder_budget(int(hp.count), cap=cap))
        out.append((ids, y, hp))
    return out, rung[0]


def bench_ffm(hb):
    import jax
    import jax.numpy as jnp

    from sparkfm_tpu.config import FMConfig, SGDConfig, Task
    from sparkfm_tpu.data.batching import SparseBatch
    from sparkfm_tpu.solvers import sgd as sgd_solver

    fields = 22
    # Default = the FULL published 2^22 Avazu table (BASELINE config 4).
    # Round 4 made it fit one chip (flat (F, nf*k) v layout, lean
    # non-adam slots) at 90K ex/s; the round-5 fused record erased the
    # table-size penalty entirely (489K at 2^22 vs 490K at 2^20), so
    # the bench now measures the real shape. Sharding over `model`
    # remains the production layout ("multi-host all-to-all").
    buckets = int(os.environ.get("BENCH_BUCKETS", 1 << 22))
    rank = 8
    batch = int(os.environ.get("BENCH_BATCH", 8192))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    # slot_major_fields: the Avazu layout is one feature per field per
    # example (field_ids == arange), so the interaction takes the static
    # transpose form (ops/interaction.py::ffm_interaction_slot_major).
    cfg = FMConfig(num_features=buckets, num_factors=rank,
                   num_fields=fields, task=Task.CLASSIFICATION,
                   reg_v=1e-6, seed=0, slot_major_fields=True)
    sgd_cfg = SGDConfig(batch_size=batch, learning_rate=0.05,
                        optimizer="adagrad")
    path = sgd_solver.resolve_update_path(cfg, sgd_cfg)
    hb(f"ffm: path={path}, staging")
    from sparkfm_tpu.models import fm as fm_model
    if path == "fused":
        from sparkfm_tpu.solvers import sgd_fused
        state = sgd_fused.init_fused_state(cfg, jax.random.PRNGKey(0))
        step_fn = sgd_fused.make_fused_train_step(cfg, sgd_cfg)
        w0_of = lambda st: st.w0
    else:
        params = fm_model.init_params(cfg, jax.random.PRNGKey(0))
        state = sgd_solver.init_state(params, optimizer=sgd_cfg.optimizer)
        if path == "dedup":
            state = sgd_solver.pad_state_for_dedup(state)
        step_fn = sgd_solver.make_train_step(cfg, sgd_cfg)
        w0_of = lambda st: st.params.w0

    rng = np.random.default_rng(0)
    hbs, rung = _ctr_batches(rng, 6, batch, fields, buckets,
                             field_major=True,
                             host_plan_fill=buckets
                             if path in ("dedup", "fused") else None)
    from sparkfm_tpu.ops import embedding as E
    batches = []
    fid = np.broadcast_to(np.arange(fields, dtype=np.int32),
                          (batch, fields))
    for ids, y, hp in hbs:
        plan = None
        if hp is not None:
            hp = hp._replace(uids=hp.uids[:rung])
            plan = E.DedupBatch(
                uids=jnp.asarray(hp.uids), ranks=jnp.asarray(hp.ranks),
                count=jnp.asarray(hp.count),
                overflow=jnp.asarray(hp.overflow),
                order=jnp.asarray(hp.order), seg=jnp.asarray(hp.seg))
        batches.append(SparseBatch(
            ids=jnp.asarray(ids), vals=jnp.ones((batch, fields),
                                                jnp.float32),
            y=jnp.asarray(y), mask=jnp.ones((batch,), bool),
            field_ids=jnp.asarray(fid), plan=plan))
    jax.block_until_ready(batches[-1].ids)
    rpc = _rpc_latency(hb)
    hb("ffm: compiling step")
    state, aux = step_fn(state, batches[0])
    _ = float(aux["loss"]) + float(w0_of(state))
    metric = "avazu_shape_ffm_rank8_train_throughput_1chip"

    def run(k, s0):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(k):
            state, aux = step_fn(state, batches[(s0 + i) % len(batches)])
        _ = float(aux["loss"]) + float(w0_of(state))
        return k * batch / (time.perf_counter() - t0 - rpc)

    hb("ffm: provisional (4 steps)")
    _emit(metric, run(4, 1), provisional=True)
    hb(f"ffm: measuring ({steps} steps)")
    eps = run(steps, 5)
    _emit(metric, eps)
    hb(f"ffm: {eps:,.0f} ex/s; done")


def bench_deepfm(hb):
    import jax
    import jax.numpy as jnp

    from sparkfm_tpu.config import FMConfig, SGDConfig, Task
    from sparkfm_tpu.data.batching import SparseBatch
    from sparkfm_tpu.models import deepfm as DF

    fields = 39
    buckets = 1 << 20
    batch = int(os.environ.get("BENCH_BATCH", 8192))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    cfg = DF.DeepFMConfig(
        fm=FMConfig(num_features=buckets, num_factors=16,
                    num_fields=fields, task=Task.CLASSIFICATION,
                    reg_v=1e-6, seed=0),
        hidden=(256, 128))
    sgd_cfg = SGDConfig(batch_size=batch, learning_rate=0.05,
                        optimizer="adagrad")
    path = DF.resolve_deepfm_path(cfg, sgd_cfg)
    hb(f"deepfm: path={path}, staging")
    if path == "fused":
        state = DF.init_fused_deepfm_state(cfg, jax.random.PRNGKey(0))
        w0_of = lambda st: st["w0"]
    else:
        state = DF.pad_deepfm_state_for_dedup(
            DF.init_state(DF.init_params(cfg, jax.random.PRNGKey(0))))
        w0_of = lambda st: st["params"].fm.w0
    step_fn = DF.make_train_step(cfg, sgd_cfg)

    rng = np.random.default_rng(0)
    hbs, rung = _ctr_batches(rng, 6, batch, fields, buckets,
                             field_major=True, host_plan_fill=buckets)
    from sparkfm_tpu.ops import embedding as E
    batches = []
    for ids, y, hp in hbs:
        hp = hp._replace(uids=hp.uids[:rung])
        plan = E.DedupBatch(
            uids=jnp.asarray(hp.uids), ranks=jnp.asarray(hp.ranks),
            count=jnp.asarray(hp.count), overflow=jnp.asarray(hp.overflow),
            order=jnp.asarray(hp.order), seg=jnp.asarray(hp.seg))
        batches.append(SparseBatch(
            ids=jnp.asarray(ids),
            vals=jnp.ones((batch, fields), jnp.float32),
            y=jnp.asarray(y), mask=jnp.ones((batch,), bool), plan=plan))
    jax.block_until_ready(batches[-1].ids)
    rpc = _rpc_latency(hb)
    hb("deepfm: compiling step")
    state, aux = step_fn(state, batches[0])
    _ = float(aux["loss"]) + float(w0_of(state))
    metric = "criteo_shape_deepfm16_train_throughput_1chip"

    def run(k, s0):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(k):
            state, aux = step_fn(state, batches[(s0 + i) % len(batches)])
        _ = float(aux["loss"]) + float(w0_of(state))
        return k * batch / (time.perf_counter() - t0 - rpc)

    hb("deepfm: provisional (4 steps)")
    _emit(metric, run(4, 1), provisional=True)
    hb(f"deepfm: measuring ({steps} steps)")
    eps = run(steps, 5)
    _emit(metric, eps)
    hb(f"deepfm: {eps:,.0f} ex/s; done")


def run_config_bench(mode: str, hb) -> None:
    {"als": bench_als, "ffm": bench_ffm, "deepfm": bench_deepfm}[mode](hb)
