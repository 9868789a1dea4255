"""In-step stage ablation of the FACTORED hybrid step (round 4):
solvers/sgd_hybrid.py with fm_grad_segsum_factored — no sorted row
stream; the backward reduces example-derived payloads only.

Stages (each stub replaces one stage with a shape-compatible substitute;
delta vs "none" = that stage's true in-step cost under XLA fusion):

  gather   big-table gather rec_u = table[uids]            (U, 128)
  spread   forward spread vw_rows = vw_u[ranks]            (B, L, k+1)
  fwd      forward elementwise (vx, s, ssq, score, loss)
  exg      example gather ex_srt = ex_pack[sex]            (N, k+2)
  kern     factored backward kernel + combine              (U, 2k+2)
  write    big-table write-back scatter-set

Usage: python benchmarks/ablate_factored.py [batch] [budget] [stubs,csv]
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
    from sparkfm_tpu.ops import pallas_rowio as PR
    from sparkfm_tpu.ops import pallas_segsum as SS
    from sparkfm_tpu.solvers import sgd_fused

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 40960
    R, L, K = 1 << 22, 39, 32
    k = K
    N = B * L
    cfg = FMConfig(num_features=R, num_factors=K, task=Task.CLASSIFICATION,
                   reg_w=1e-6, reg_v=1e-6, seed=0)
    sgd_cfg = SGDConfig(batch_size=B, learning_rate=0.05,
                        optimizer="adagrad", unique_budget=budget)

    rng = np.random.default_rng(0)

    def mk():
        raw = rng.zipf(1.3, size=(B, L)).astype(np.int64)
        ids = ((raw * 2654435761) % R).astype(np.int32)
        vals = np.ones((B, L), np.float32)
        hp = E.host_dedup(ids, budget, fill=R, vals=vals)
        plan = E.DedupBatch(
            uids=jnp.asarray(hp.uids), ranks=jnp.asarray(hp.ranks),
            count=jnp.asarray(hp.count), overflow=jnp.asarray(hp.overflow),
            order=jnp.asarray(hp.order), seg=jnp.asarray(hp.seg),
            svals=jnp.asarray(hp.svals), sex=jnp.asarray(hp.sex))
        return SparseBatch(
            ids=jnp.asarray(ids), vals=jnp.asarray(vals),
            y=jnp.asarray(rng.integers(0, 2, (B,)).astype(np.float32)),
            mask=jnp.ones((B,), bool), plan=plan)

    batches = [mk() for _ in range(4)]
    print(f"B={B} N={N} budget={budget} "
          f"uniq~{int(batches[0].plan.count)}", flush=True)

    def make_step(stub):
        stubset = set(stub.split("+")) if stub != "none" else set()
        has = stubset.__contains__

        def train_step(state, batch):
            plan = batch.plan
            valid_u = jax.lax.iota(jnp.int32, budget) < jnp.minimum(
                plan.count, budget)
            if has("gather"):
                rec_u = jnp.broadcast_to(state.table[:1], (budget, 128)) * 1.0
                rec_u = rec_u + plan.uids[:, None].astype(jnp.float32) * 1e-9
            else:
                rec_u = state.table.at[plan.uids].get(
                    indices_are_sorted=True, mode="promise_in_bounds")
            rec_u = jnp.where(valid_u[:, None], rec_u, 0.0)
            v_u = rec_u[:, :k]
            slot_v_u = rec_u[:, k:2 * k]
            w_u = rec_u[:, 2 * k]
            slot_w_u = rec_u[:, 2 * k + 1]
            vw_u = jnp.concatenate([v_u, w_u[:, None]], axis=1)

            vals = batch.vals
            if has("spread"):
                vw_rows = jnp.broadcast_to(
                    vw_u[0], (B, L, k + 1)) + plan.ranks[..., None] * 1e-12
            else:
                vw_rows = vw_u[plan.ranks]
            if has("fwd"):
                s = vw_rows[:, 0, :k] * 1.0
                score = jnp.sum(s, axis=-1) + state.w0
            else:
                vx = vw_rows[..., :k] * vals[..., None]
                s = jnp.sum(vx, axis=1)
                ssq = jnp.sum(jnp.square(vx), axis=(1, 2))
                score = 0.5 * (jnp.sum(jnp.square(s), axis=-1) - ssq)
                score = score + jnp.sum(vw_rows[..., k] * vals, axis=-1)
                score = score + state.w0

            wt = batch.mask.astype(jnp.float32)
            denom_data = jnp.maximum(jnp.sum(wt), 1e-12)
            denom_reg = jnp.maximum(jnp.sum(wt), 1.0)
            y_pm = jnp.where(batch.y > 0, 1.0, -1.0)
            z = -y_pm * score
            data_loss = jnp.sum(jax.nn.softplus(z) * wt) / denom_data
            ds = -y_pm * jax.nn.sigmoid(z) * wt / denom_data

            ex_pack = jnp.concatenate(
                [s, ds[:, None], wt[:, None]], axis=1)
            if has("exg"):
                ex_srt = jnp.broadcast_to(ex_pack[0], (N, k + 2)) * 1.0
                ex_srt = ex_srt + plan.sex[:, None].astype(jnp.float32) * 1e-12
            else:
                ex_srt = ex_pack[plan.sex]
            x = plan.svals
            if has("kern"):
                acc = jnp.concatenate(
                    [vw_u, jnp.square(vw_u)], axis=1)
                acc = acc + ex_srt[:budget, :1] * 1e-30
            else:
                acc = SS.fm_grad_segsum_factored(
                    vw_u, ex_srt, x, plan.seg, budget,
                    2.0 * cfg.reg_v / denom_reg,
                    2.0 * cfg.reg_w / denom_reg)
            g_v_u, g_w_u = acc[:, :k], acc[:, k]
            sq_v_u, sq_w_u = acc[:, k + 1:2 * k + 1], acc[:, 2 * k + 1]

            lr = sgd_cfg.learning_rate
            slot_v_new = slot_v_u + sq_v_u
            v_new = v_u - lr * g_v_u * jax.lax.rsqrt(slot_v_new + 1e-8)
            slot_w_new = slot_w_u + sq_w_u
            w_new = w_u - lr * g_w_u * jax.lax.rsqrt(slot_w_new + 1e-8)
            rec_new = jnp.concatenate(
                [v_new, slot_v_new, w_new[:, None], slot_w_new[:, None],
                 jnp.zeros((budget, 128 - 2 * k - 2), jnp.float32)], axis=1)
            if has("write"):
                table = state.table
            else:
                table = PR.scatter_set(state.table, plan.uids, rec_new,
                                       unique_indices=True)
            g_w0 = jnp.sum(ds)
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
        "none", "gather", "spread", "fwd", "exg", "kern", "write"]
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
