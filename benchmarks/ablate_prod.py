"""In-step stage ablation of the PRODUCTION fused step: host dedup plans,
segsum accumulate, donated state. Each variant stubs one stage with a
shape-compatible substitute; the delta vs "none" is the stage's true
in-step cost (captures XLA fusion/overlap).

Usage: python benchmarks/ablate_prod.py [batch] [budget]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from sparkfm_tpu.config import FMConfig, SGDConfig, Task
    from sparkfm_tpu.data.batching import SparseBatch
    from sparkfm_tpu.ops import embedding as E
    from sparkfm_tpu.ops import pallas_segsum as SS
    from sparkfm_tpu.solvers import sgd as sgd_solver
    from sparkfm_tpu.solvers import sgd_fused

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    R, L, K = 1 << 22, 39, 32
    k = K
    cfg = FMConfig(num_features=R, num_factors=K, task=Task.CLASSIFICATION,
                   reg_w=1e-6, reg_v=1e-6, seed=0)
    sgd_cfg = SGDConfig(batch_size=B, learning_rate=0.05,
                        optimizer="adagrad", unique_budget=budget)

    rng = np.random.default_rng(0)

    def mk():
        raw = rng.zipf(1.3, size=(B, L)).astype(np.int64)
        ids = ((raw * 2654435761) % R).astype(np.int32)
        hp = E.host_dedup(ids, budget, fill=R)
        plan = E.DedupBatch(
            uids=jnp.asarray(hp.uids), ranks=jnp.asarray(hp.ranks),
            count=jnp.asarray(hp.count), overflow=jnp.asarray(hp.overflow),
            order=jnp.asarray(hp.order), seg=jnp.asarray(hp.seg))
        return SparseBatch(
            ids=jnp.asarray(ids), vals=jnp.ones((B, L), jnp.float32),
            y=jnp.asarray(rng.integers(0, 2, (B,)).astype(np.float32)),
            mask=jnp.ones((B,), bool), plan=plan)

    batches = [mk() for _ in range(4)]
    print(f"B={B} N={B*L} budget={budget} "
          f"uniq~{int(batches[0].plan.count)}", flush=True)

    def make_step(stub):
        """stub in {none, gather, spread, fwdbwd, permute, segsum, write}."""

        def train_step(state, batch):
            plan = batch.plan
            if stub == "gather":
                rec_u = jnp.broadcast_to(state.table[:1], (budget, 128)) * 1.0
                rec_u = rec_u + plan.uids[:, None].astype(jnp.float32) * 1e-9
            else:
                rec_u = state.table.at[plan.uids].get(
                    indices_are_sorted=True, mode="promise_in_bounds")
            v_u = rec_u[:, :k]
            w_u = rec_u[:, 2 * k]
            vw_u = jnp.concatenate([v_u, w_u[:, None]], axis=1)
            if stub == "spread":
                vw_rows = jnp.broadcast_to(
                    vw_u[0], (B, L, k + 1)) + plan.ranks[..., None] * 1e-12
            else:
                vw_rows = vw_u[plan.ranks]
            v_rows = vw_rows[..., :k]
            w_rows = vw_rows[..., k]

            if stub == "fwdbwd":
                scores = jnp.sum(v_rows[:, 0, :], axis=-1) + w_rows[:, 0]
                data_loss = jnp.mean(scores)
                g_w0 = data_loss * 1e-9
                g_wrows = w_rows * 1e-9
                g_vrows = v_rows * 1e-9
            else:
                def loss_of(w0, w_rows, v_rows):
                    return sgd_solver._batch_loss_from_rows(
                        w0, w_rows, v_rows, batch, cfg)
                grads, (scores, data_loss) = jax.grad(
                    loss_of, argnums=(0, 1, 2), has_aux=True)(
                    state.w0, w_rows, v_rows)
                g_w0, g_wrows, g_vrows = grads

            gv_s = g_vrows.reshape(-1, k)
            gw_s = g_wrows.reshape(-1, 1)
            gvw = jnp.concatenate([gv_s, gw_s], axis=-1)
            if stub == "permute":
                gvw_s = gvw * (1.0 - 1e-9)
            else:
                gvw_s = gvw.at[plan.order].get(unique_indices=True,
                                               mode="promise_in_bounds")
            gv_s, gw_s = gvw_s[:, :k], gvw_s[:, k:]
            packed = jnp.concatenate(
                [gv_s, jnp.square(gv_s), gw_s, jnp.square(gw_s)], axis=-1)
            if stub == "segsum":
                acc = packed[:budget] + jnp.float32(1e-30)
            else:
                acc = SS.segment_rowsum(packed, plan.seg, budget)
            g_v_u, sq_v_u = acc[:, :k], acc[:, k:2 * k]
            g_w_u, sq_w_u = acc[:, 2 * k], acc[:, 2 * k + 1]

            lr = sgd_cfg.learning_rate
            slot_v_new = rec_u[:, k:2 * k] + sq_v_u
            v_new = v_u - lr * g_v_u * jax.lax.rsqrt(slot_v_new + 1e-8)
            slot_w_new = rec_u[:, 2 * k + 1] + sq_w_u
            w_new = w_u - lr * g_w_u * jax.lax.rsqrt(slot_w_new + 1e-8)
            rec_new = jnp.concatenate(
                [v_new, slot_v_new, w_new[:, None], slot_w_new[:, None],
                 jnp.zeros((budget, 128 - 2 * k - 2), jnp.float32)], axis=1)
            if stub == "write":
                table = state.table
            else:
                table = state.table.at[plan.uids].set(
                    rec_new, indices_are_sorted=True,
                    mode="promise_in_bounds")
            w0 = state.w0 - lr * g_w0
            new_state = sgd_fused.FusedState(
                table=table, w0=w0, slot_w0=state.slot_w0,
                step=state.step + 1)
            keep = (jnp.sum(rec_new[0]) * 1e-20 + jnp.sum(acc[0]) * 1e-20
                    + data_loss)
            return new_state, keep

        return jax.jit(train_step, donate_argnums=(0,))

    results = {}
    stubs = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "none", "gather", "spread", "fwdbwd", "permute", "segsum", "write"]
    for stub in stubs:
        step = make_step(stub)
        state = sgd_fused.init_fused_state(cfg, jax.random.PRNGKey(0))
        state, keep = step(state, batches[0])
        _ = float(keep) + float(state.w0)
        for i in range(2):
            state, keep = step(state, batches[(i + 1) % 4])
        _ = float(keep) + float(state.w0)
        n = 15
        t0 = time.perf_counter()
        for i in range(n):
            state, keep = step(state, batches[i % 4])
        _ = float(keep) + float(state.w0)
        dt = (time.perf_counter() - t0) / n
        results[stub] = dt
        base = results.get("none", dt)
        extra = "" if stub == "none" else f"  stage ~{(base-dt)*1e3:6.2f} ms"
        print(f"{stub:12s} {dt*1e3:7.2f} ms/step{extra}  "
              f"({B/dt/1e3:.0f}K ex/s)", flush=True)


if __name__ == "__main__":
    main()
