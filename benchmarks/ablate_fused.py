"""In-step stage ablation for the fused-record SGD train step.

Each variant stubs ONE stage with a shape-compatible cheap substitute and
measures the full-step time delta — this captures what the stage costs
*inside* the real step (with XLA fusion/overlap), which standalone
microbenches miss. Aux reductions keep every remaining stage live against
DCE.

Usage: python benchmarks/ablate_fused.py [budget] [batch]
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
    from sparkfm_tpu.solvers import sgd as sgd_solver
    from sparkfm_tpu.solvers import sgd_fused

    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    R, L, K = 1 << 22, 39, 32
    cfg = FMConfig(num_features=R, num_factors=K, task=Task.CLASSIFICATION,
                   reg_w=1e-6, reg_v=1e-6, seed=0)
    sgd_cfg = SGDConfig(batch_size=B, learning_rate=0.05,
                        optimizer="adagrad", unique_budget=budget)

    rng = np.random.default_rng(0)

    def mk():
        raw = rng.zipf(1.3, size=(B, L)).astype(np.int64)
        ids = ((raw * 2654435761) % R).astype(np.int32)
        return SparseBatch(
            ids=jnp.asarray(ids), vals=jnp.ones((B, L), jnp.float32),
            y=jnp.asarray(rng.integers(0, 2, (B,)).astype(np.float32)),
            mask=jnp.ones((B,), bool))

    batches = [mk() for _ in range(4)]

    def make_step(stub):
        """stub in {none, dedup, gather, spread, accumulate, write}."""
        k = K

        def train_step(state, batch):
            F = state.table.shape[0] - 1
            if stub == "dedup":
                n = B * L
                uids = jax.lax.iota(jnp.int32, budget) % F
                ranks = (batch.ids % budget)
                plan = E.DedupBatch(uids=uids, ranks=ranks,
                                    count=jnp.int32(budget),
                                    overflow=jnp.bool_(False))
            else:
                plan = E.dedup_ids(batch.ids, budget, fill=F)
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

            def loss_of(w0, w_rows, v_rows):
                return sgd_solver._batch_loss_from_rows(
                    w0, w_rows, v_rows, batch, cfg)

            grads, (scores, data_loss) = jax.grad(
                loss_of, argnums=(0, 1, 2), has_aux=True)(
                state.w0, w_rows, v_rows)
            g_w0, g_wrows, g_vrows = grads

            packed = jnp.concatenate(
                [g_vrows, jnp.square(g_vrows), g_wrows[..., None],
                 jnp.square(g_wrows)[..., None]], axis=-1)
            if stub == "accumulate":
                acc = (packed.reshape(-1, 2 * k + 2)[:budget]
                       + jnp.float32(1e-30))
            else:
                acc = E.accumulate_to_unique(packed, plan, budget)
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
            # keep everything live
            keep = (jnp.sum(rec_new[0]) * 1e-20 + jnp.sum(acc[0]) * 1e-20
                    + data_loss)
            return new_state, keep

        return jax.jit(train_step, donate_argnums=(0,))

    results = {}
    for stub in ["none", "dedup", "gather", "spread", "accumulate",
                 "write"]:
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
        base = results["none"]
        extra = "" if stub == "none" else f"  stage ~{(base-dt)*1e3:6.2f} ms"
        print(f"{stub:12s} {dt*1e3:7.2f} ms/step{extra}", flush=True)


if __name__ == "__main__":
    main()
