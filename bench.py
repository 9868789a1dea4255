"""Headline benchmark: Criteo-shape logistic FM training throughput, 1 chip.

Prints ONE final JSON line (stdout):
  {"metric": "...", "value": N, "unit": "examples/sec", "vs_baseline": N}

Config matches BASELINE.json config 3 (the headline): hashed sparse features,
rank-32 logistic FM, adagrad SGD with sparse row updates. The reference
publishes no numbers (BASELINE.md), so `vs_baseline` is measured against the
BASELINE.json north-star *per-chip* rate: >10M examples/s on a v5p-16
(8 chips) => 1.25M examples/s/chip. vs_baseline = value / 1.25e6.

Hardening (round 4, VERDICT r3 #1 — the round-3 capture was lost to a
wedged tunneled backend): the measurement runs in a CHILD process
supervised by this parent. The child heartbeats each phase to stderr,
emits a *provisional* JSON line after a short first measurement window,
then the final line. If the child produces no JSON within a deadline the
parent kills it (exact PID, never by pattern) and retries ONCE in a fresh
process (a fresh process = a fresh backend client, the only reliable
"re-init" for a wedged tunnel). The LAST JSON line seen wins, so even a
wedge after the provisional still records a measured number. A persistent
XLA compilation cache (.jax_cache/) makes retries and re-runs skip
compilation entirely.

Timing notes: on tunneled TPU backends `block_until_ready` can return before
execution finishes, so the timed region ends with a host fetch of scalars
that depend on the final step's full state (loss + a parameter), and the
measured RPC latency of a trivial fetch is subtracted once.

Env knobs (all optional):
  BENCH_MODE      unset (default) = training throughput; "score" =
                  serving throughput of models/fm.scores with host
                  ladder plans (BENCH_HOSTPLAN=0: device-dedup fallback);
                  "als" | "ffm" | "deepfm" = the other BASELINE configs
                  (benchmarks/bench_configs.py): ALS sweep-time at ML-25M
                  shape, FFM / DeepFM train throughput at their config
                  shapes.
  BENCH_BUCKETS   feature buckets (default 2^22)
  BENCH_BATCH     batch size      (default 16384)
  BENCH_NNZ       actives/example (default 39, the Criteo field count)
  BENCH_RANK      factors         (default 32)
  BENCH_STEPS     timed steps (default 60: the first dispatches after
                  warmup still run below steady state — 30 steps
                  under-measures by ~6%; 60 adds <0.5 s wall)
  BENCH_OPT       optimizer: adagrad (default) | adagrad_row | sgd
  BENCH_DIST      id distribution: zipf (default; Criteo-like) | uniform
  BENCH_PATH      update path: auto (default) | direct | dedup | fused
  BENCH_HOSTPLAN  1 (default) = batches carry host-computed dedup plans
                  (the production input pipeline computes these overlapped
                  with device compute — data.batching.prefetch); 0 = the
                  step dedups on device
  BENCH_BUDGET    unique-id budget U. Default "ladder" = the library's
                  auto behavior (ops.embedding.ladder_budget): each
                  pre-staged batch's plan is padded to the coarse rung
                  just above its ACTUAL unique count (~40K uniques ->
                  rung 49152), exactly what trainer-driven host plans
                  do. Overflow is impossible by construction and still
                  asserted 0. A numeric value pins a static budget.
  BENCH_GROUP     hybrid steps per dispatch (default 2; lax.scan over
                  stacked staged batches — SGDConfig.steps_per_dispatch,
                  amortizes the ~1.6 ms launch floor; 1 = single-step)
  BENCH_TIMEOUT   parent per-attempt deadline seconds (default 240)
  BENCH_NO_FORK   1 = run the measurement in-process (no supervisor);
                  what the child itself runs.
"""

import json
import os
import sys
import time

import numpy as np

_T0 = time.time()


def hb(msg: str) -> None:
    """Phase heartbeat on stderr (never stdout — stdout is the one JSON
    line contract)."""
    print(f"[bench +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _enable_compile_cache():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:            # older jax: fail open, just slower
        hb(f"compile cache unavailable: {e}")


def child_main():
    hb("importing jax")
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from sparkfm_tpu.config import FMConfig, SGDConfig, Task
    from sparkfm_tpu.data.batching import SparseBatch
    from sparkfm_tpu.models import fm as fm_model
    from sparkfm_tpu.solvers import sgd as sgd_solver

    mode = os.environ.get("BENCH_MODE", "")
    if mode in ("als", "ffm", "deepfm"):
        from benchmarks.bench_configs import run_config_bench
        return run_config_bench(mode, hb)

    buckets = int(os.environ.get("BENCH_BUCKETS", 1 << 22))
    batch = int(os.environ.get("BENCH_BATCH", 16384))
    nnz = int(os.environ.get("BENCH_NNZ", 39))
    rank = int(os.environ.get("BENCH_RANK", 32))
    steps = int(os.environ.get("BENCH_STEPS", 60))
    dist = os.environ.get("BENCH_DIST", "zipf")
    path = os.environ.get("BENCH_PATH", "auto")
    budget_env = os.environ.get("BENCH_BUDGET", "ladder")
    budget = 0 if budget_env == "ladder" else int(budget_env)
    baseline_per_chip = 10e6 / 8  # north-star: 10M ex/s on v5p-16 (8 chips)

    hb(f"init backend ({jax.default_backend()}), "
       f"devices={len(jax.devices())}")

    cfg = FMConfig(num_features=buckets, num_factors=rank,
                   task=Task.CLASSIFICATION, reg_w=1e-6, reg_v=1e-6, seed=0)

    if mode == "score":
        # Serving-path throughput: models/fm.scores with host ladder dedup
        # plans (the serving pipeline precomputes them like training;
        # BENCH_HOSTPLAN=0 measures the device-dedup fallback).
        from sparkfm_tpu.ops import embedding as E
        params = fm_model.init_params(cfg, jax.random.PRNGKey(0))
        score_fn = jax.jit(lambda p, ids, vals, plan: fm_model.scores(
            p, cfg, ids, vals, plan=plan))
        use_plan = os.environ.get("BENCH_HOSTPLAN", "1") == "1"
        rng = np.random.default_rng(0)
        cap = E.auto_budget(batch * nnz)
        rung = [1]
        hbs = []
        hb("staging score batches")
        for _ in range(8):
            ids = ((rng.zipf(1.3, size=(batch, nnz)).astype(np.int64)
                    * 2654435761) % buckets).astype(np.int32)
            hp = None
            if use_plan:
                hp = E.host_dedup(ids, cap, fill=buckets - 1)
                rung[0] = max(rung[0], E.ladder_budget(int(hp.count),
                                                       cap=cap))
            hbs.append((ids, hp))
        staged = []
        for ids, hp in hbs:
            plan = None
            if hp is not None:
                hp = hp._replace(uids=hp.uids[:rung[0]])
                plan = E.DedupBatch(
                    uids=jnp.asarray(hp.uids), ranks=jnp.asarray(hp.ranks),
                    count=jnp.asarray(hp.count),
                    overflow=jnp.asarray(hp.overflow),
                    order=None, seg=None)
            staged.append((jnp.asarray(ids), plan))
        vals = jnp.ones((batch, nnz), jnp.float32)
        tiny = jax.jit(lambda x: x + 1)
        y = tiny(jnp.float32(1.0)); _ = float(y)
        t0 = time.perf_counter(); y = tiny(y); _ = float(y)
        rpc = time.perf_counter() - t0
        hb("compiling score fn")
        out = score_fn(params, staged[0][0], vals, staged[0][1])
        _ = float(out[0])
        metric = "criteo_logistic_fm_rank32_score_throughput_1chip"

        import dataclasses as _dc

        def run(n):
            # Chain a vanishing perturbation of w0 through acc: every
            # iteration is a DISTINCT computation (staged batches repeat
            # after 8, and a tunneled backend may memoize identical
            # (params, batch) calls — observed 2.6x inflation), at the
            # cost of serializing the chain (a lower bound: real serving
            # pipelines independent requests).
            acc = jnp.float32(0)
            t0 = time.perf_counter()
            for i in range(n):
                ids_i, plan_i = staged[i % 8]
                p_i = _dc.replace(params, w0=params.w0 + acc * 1e-30)
                acc = acc + score_fn(p_i, ids_i, vals, plan_i)[0]
            _ = float(acc)
            return n * batch / (time.perf_counter() - t0 - rpc)

        hb("provisional window (5 iters)")
        prov = run(5)
        print(json.dumps({
            "metric": metric, "value": round(prov, 1),
            "unit": "examples/sec",
            "vs_baseline": round(prov / baseline_per_chip, 4),
            "provisional": True}), flush=True)
        hb(f"provisional {prov:,.0f} ex/s; measuring ({steps} iters)")
        eps = run(steps)
        print(json.dumps({
            "metric": metric, "value": round(eps, 1),
            "unit": "examples/sec",
            "vs_baseline": round(eps / baseline_per_chip, 4)}), flush=True)
        hb("done")
        return

    sgd_cfg = SGDConfig(batch_size=batch, learning_rate=0.05,
                        optimizer=os.environ.get("BENCH_OPT", "adagrad"),
                        update_path=path, unique_budget=budget,
                        accumulate=os.environ.get("BENCH_ACC", "auto"))

    resolved = sgd_solver.resolve_update_path(cfg, sgd_cfg)
    hb(f"update path: {resolved}")
    if resolved in ("fused", "sorted", "hybrid"):
        from sparkfm_tpu.solvers import sgd_fused
        state = sgd_fused.init_fused_state(cfg, jax.random.PRNGKey(0))
        if resolved == "sorted":
            from sparkfm_tpu.solvers import sgd_sorted
            step_fn = sgd_sorted.make_sorted_train_step(cfg, sgd_cfg)
        elif resolved == "hybrid":
            from sparkfm_tpu.solvers import sgd_hybrid
            step_fn = sgd_hybrid.make_hybrid_train_step(cfg, sgd_cfg)
        else:
            step_fn = sgd_fused.make_fused_train_step(cfg, sgd_cfg)
        final_scalar = lambda s: s.w0
    else:
        params = fm_model.init_params(cfg, jax.random.PRNGKey(0))
        state = sgd_solver.init_state(params)
        if resolved == "dedup":
            state = sgd_solver.pad_state_for_dedup(state)
        step_fn = sgd_solver.make_train_step(cfg, sgd_cfg)
        final_scalar = lambda s: s.params.w0

    # Measure RPC/fetch latency with a trivial dependent fetch.
    tiny = jax.jit(lambda x: x + 1)
    y = tiny(jnp.float32(1.0)); _ = float(y)
    lat = []
    for _ in range(3):
        t0 = time.perf_counter(); y = tiny(y); _ = float(y)
        lat.append(time.perf_counter() - t0)
    rpc_lat = min(lat)
    hb(f"rpc latency {rpc_lat * 1e3:.1f} ms")

    # Pre-stage distinct device batches (fresh ids each — identical inputs
    # can be memoized by tunneled backends).
    rng = np.random.default_rng(0)
    n_batches = 8
    host_plan = os.environ.get("BENCH_HOSTPLAN", "1") == "1" and resolved in (
        "dedup", "fused", "hybrid")

    # Ladder mode mirrors the trainer's host-plan auto behavior: size every
    # plan to the shared monotonic rung above the actual unique counts.
    from sparkfm_tpu.ops import embedding as E
    ladder = budget == 0
    ladder_cap = E.auto_budget(batch * nnz)
    rung = [1]

    def make_host_batch():
        if dist == "uniform":
            ids = rng.integers(0, buckets, (batch, nnz)).astype(np.int32)
        else:
            raw = rng.zipf(1.3, size=(batch, nnz)).astype(np.int64)
            ids = ((raw * 2654435761) % buckets).astype(np.int32)
        y = rng.integers(0, 2, (batch,)).astype(np.float32)
        vals = np.ones((batch, nnz), np.float32)
        hp = None
        if host_plan:
            hp = E.host_dedup(ids, ladder_cap if ladder else budget,
                              fill=buckets, vals=vals)
            if ladder:
                rung[0] = max(rung[0],
                              E.ladder_budget(int(hp.count), cap=ladder_cap))
        return ids, vals, y, hp

    hb("staging batches")
    host_batches = [make_host_batch() for _ in range(n_batches)]

    def stage(hbt):
        ids, vals, y, hp = hbt
        plan = None
        if hp is not None:
            if ladder:
                # all batches share the final monotonic rung -> one compile
                hp = hp._replace(uids=hp.uids[:rung[0]])
            plan = E.DedupBatch(
                uids=jnp.asarray(hp.uids), ranks=jnp.asarray(hp.ranks),
                count=jnp.asarray(hp.count),
                overflow=jnp.asarray(hp.overflow),
                order=jnp.asarray(hp.order), seg=jnp.asarray(hp.seg),
                svals=jnp.asarray(hp.svals), sex=jnp.asarray(hp.sex))
        return SparseBatch(
            ids=jnp.asarray(ids),
            vals=jnp.asarray(vals),
            y=jnp.asarray(y),
            mask=jnp.ones((batch,), bool),
            plan=plan)

    batches = [stage(hbt) for hbt in host_batches]
    for b in batches:
        jax.block_until_ready(b.ids)

    # Multi-step dispatch (hybrid only): scan BENCH_GROUP staged batches
    # per jitted call, amortizing the ~1.6 ms/dispatch launch floor.
    group = int(os.environ.get("BENCH_GROUP", "2"))
    if group > 1 and resolved == "hybrid":
        from sparkfm_tpu.solvers import sgd_hybrid
        step_fn = sgd_hybrid.make_hybrid_multi_step(cfg, sgd_cfg, group)
        assert n_batches % group == 0
        batches = [sgd_hybrid.stack_batches(batches[i:i + group])
                   for i in range(0, n_batches, group)]
        n_batches = len(batches)
        batch *= group          # examples per dispatch
        steps = max(1, steps // group)
        hb(f"grouped: {group} steps/dispatch")

    # Warmup / compile; force real completion with a dependent fetch.
    hb("compiling train step")
    state, aux = step_fn(state, batches[0])
    _ = float(aux["loss"]) + float(final_scalar(state))
    hb("warmup")
    for i in range(2):
        state, aux = step_fn(state, batches[(i + 1) % n_batches])
    _ = float(aux["loss"]) + float(final_scalar(state))

    metric = "criteo_logistic_fm_rank32_train_throughput_1chip"

    def run(n, start):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n):
            state, aux = step_fn(state, batches[(start + i) % n_batches])
        final = float(aux["loss"]) + float(final_scalar(state))
        dt = time.perf_counter() - t0 - rpc_lat
        assert np.isfinite(final)
        if "unique_overflow" in aux:
            assert not bool(aux["unique_overflow"]), (
                "unique budget overflowed — raise BENCH_BUDGET")
        return n * batch / dt

    # Provisional first: even if the backend wedges later, a measured
    # number reaches the parent.
    hb("provisional window (6 steps)")
    prov = run(6, 0)
    print(json.dumps({
        "metric": metric, "value": round(prov, 1),
        "unit": "examples/sec",
        "vs_baseline": round(prov / baseline_per_chip, 4),
        "provisional": True}), flush=True)
    hb(f"provisional {prov:,.0f} ex/s; measuring ({steps} steps)")

    eps = run(steps, 6)
    print(json.dumps({
        "metric": metric,
        "value": round(eps, 1),
        "unit": "examples/sec",
        "vs_baseline": round(eps / baseline_per_chip, 4),
    }), flush=True)
    hb(f"final {eps:,.0f} ex/s; done")


def supervise() -> int:
    """Run child_main in a subprocess; heartbeat-stream its stderr, keep
    the LAST JSON line it prints, kill + retry once on deadline."""
    import subprocess
    import threading

    # Cold/recovering tunnels measured up to ~150 s of pure backend init
    # this round; 150 s would kill a healthy child mid-init. The als mode
    # stages + sweeps the FULL 25M dataset (~10 min end to end measured),
    # so it gets a bigger default window.
    default_deadline = 900 if os.environ.get("BENCH_MODE") == "als" else 240
    deadline = float(os.environ.get("BENCH_TIMEOUT", default_deadline))
    last_json: list = []

    for attempt in (1, 2):
        env = dict(os.environ)
        env["BENCH_NO_FORK"] = "1"
        hb(f"attempt {attempt}: spawning measurement child "
           f"(deadline {deadline:.0f}s)")
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True)

        got_final = []

        def pump(p=proc):
            for line in p.stdout:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.pop("provisional", False):
                    hb(f"provisional result: {rec['value']} {rec['unit']}")
                    last_json[:] = [rec]
                else:
                    last_json[:] = [rec]
                    got_final.append(True)

        t = threading.Thread(target=pump, daemon=True)
        t.start()
        try:
            proc.wait(timeout=deadline)
            t.join(timeout=5)
        except subprocess.TimeoutExpired:
            hb(f"attempt {attempt}: deadline exceeded — killing child "
               f"pid {proc.pid}")
            proc.kill()           # exact PID we spawned, never by pattern
            proc.wait()
            t.join(timeout=5)
        if got_final:
            print(json.dumps(last_json[0]), flush=True)
            return 0
        if last_json:
            # provisional only: the backend wedged mid-measurement — a
            # fresh attempt rarely recovers within budget (the tunnel
            # stays wedged ~10 min); record the provisional measurement.
            hb("final never arrived; recording the provisional result")
            print(json.dumps(last_json[0]), flush=True)
            return 0
        hb(f"attempt {attempt}: no result at all "
           f"(rc={proc.returncode})")
        deadline = max(90.0, deadline * 0.8)
    return 1


if __name__ == "__main__":
    if os.environ.get("BENCH_NO_FORK") == "1":
        child_main()
    else:
        sys.exit(supervise())
