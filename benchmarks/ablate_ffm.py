"""In-step stage ablation of the FFM FUSED train step (VERDICT r4 #1).

Config-4 shape: B=8192, 22 fields (one feature per field, the Avazu
layout), hashed buckets (default 2^20; pass 22 for the full 2^22 table),
rank 8, adagrad, host dedup plans at a ladder rung — exactly what
bench_configs.bench_ffm stages on the production path
(solvers/sgd_fused.py with the FFM-wide record, round 5).

Stages (stub methodology of ablate_factored.py: each stub replaces one
stage with a shape-compatible cheap substitute; delta vs "none" = that
stage's true in-step cost under XLA fusion):

  gather  big-table unique gather  rec_u = table[uids]     (U, 384)
  spread  forward spread           vw_rows = vw_u[ranks]   (B, L, vk+1)
  inter   slot-major FFM interaction, forward + backward
  acc     scatter-add of the packed [g|g^2] payload        (N,2vk+2)->(U,·)
  write   big-table write-back scatter-set                 (U, 384)

Variants (full steps, alternate implementations):

  agginter   the one-hot field-aggregated interaction instead of the
             slot-major transpose form (what ragged field layouts pay)
  bf16       interaction compute in bfloat16
  row        adagrad_row (one second-moment per row: narrower packed
             payload (vk+3) and record write)

History (measured v5e, B=8192, 2^20 buckets, U rung 32768):
  round-4 dedup path (4 separate tables, aggregated interaction):
    49.7 ms/step (165K ex/s) — write-back 26.7 ms, interaction 13.7,
    accumulate ~12, spread 6.7 (see git history of this file for the
    separate-table ablation)
  round-5 fused path (this file): ~18.7 ms (439K), bench 490K ex/s.

Usage: python benchmarks/ablate_ffm.py [batch] [log2_buckets] [stubs,csv]
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
    from sparkfm_tpu.solvers import sgd_fused

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    logb = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    R = 1 << logb
    Fn = 22              # fields
    L = Fn               # one feature per field
    K = 8
    N = B * L
    vk = Fn * K          # flat v block width (176)
    W = sgd_fused.record_width(K, Fn)          # 384

    rng = np.random.default_rng(0)
    cap = E.auto_budget(N)
    per = R // Fn
    fid = np.broadcast_to(np.arange(Fn, dtype=np.int32), (B, L))

    rung = 1
    raws = []
    for _ in range(4):
        raw = rng.zipf(1.3, size=(B, L)).astype(np.int64)
        ids = ((raw * 2654435761) % R).astype(np.int32)
        ids = (ids % per) + per * np.arange(L, dtype=np.int32)[None, :]
        hp = E.host_dedup(ids, cap, fill=R,
                          vals=np.ones((B, L), np.float32))
        rung = max(rung, E.ladder_budget(int(hp.count), cap=cap))
        raws.append((ids, hp))
    budget = rung
    batches = []
    for ids, hp in raws:
        hp = hp._replace(uids=hp.uids[:budget])
        plan = E.DedupBatch(*[None if x is None else jnp.asarray(x)
                              for x in hp])
        batches.append(SparseBatch(
            ids=jnp.asarray(ids), vals=jnp.ones((B, L), jnp.float32),
            y=jnp.asarray(rng.integers(0, 2, (B,)).astype(np.float32)),
            mask=jnp.ones((B,), bool), field_ids=jnp.asarray(fid),
            plan=plan))
    print(f"B={B} R=2^{logb} F={Fn} K={K} vk={vk} W={W} budget={budget} "
          f"uniq~{int(batches[0].plan.count)}", flush=True)

    def make_step(stub):
        stubset = set(stub.split("+")) if stub != "none" else set()
        has = stubset.__contains__
        cdt = jnp.bfloat16 if has("bf16") else jnp.float32
        row_opt = has("row")
        cfg = FMConfig(num_features=R, num_factors=K, num_fields=Fn,
                       task=Task.CLASSIFICATION, reg_v=1e-6, seed=0,
                       slot_major_fields=not has("agginter"),
                       compute_dtype=("bfloat16" if has("bf16")
                                      else "float32"))
        sgd_cfg = SGDConfig(
            batch_size=B, learning_rate=0.05,
            optimizer="adagrad_row" if row_opt else "adagrad")
        if not stubset or stubset <= {"agginter", "bf16", "row"}:
            # pure variants run the real production step
            return sgd_fused.make_fused_train_step(cfg, sgd_cfg), cfg

        def train_step(state, batch):
            plan = batch.plan
            valid_u = jax.lax.iota(jnp.int32, budget) < jnp.minimum(
                plan.count, budget)
            if has("gather"):
                rec_u = jnp.broadcast_to(state.table[:1], (budget, W)) * 1.0
                rec_u = rec_u + plan.uids[:, None].astype(jnp.float32) * 1e-9
            else:
                rec_u = state.table.at[plan.uids].get(
                    indices_are_sorted=True, mode="promise_in_bounds")
            rec_u = jnp.where(valid_u[:, None], rec_u, 0.0)
            v_u = rec_u[:, :vk]
            slot_v_u = rec_u[:, vk:2 * vk]
            w_u = rec_u[:, 2 * vk]
            slot_w_u = rec_u[:, 2 * vk + 1]
            vw_u = jnp.concatenate([v_u, w_u[:, None]], axis=1)

            if has("spread"):
                def get_rows(vw_u):
                    r = jnp.broadcast_to(vw_u[0], (B, L, vk + 1))
                    return r + plan.ranks[..., None] * 1e-12
            else:
                def get_rows(vw_u):
                    return vw_u[plan.ranks]

            def loss_of(w0, w_rows, v_rows):
                vals_c = batch.vals.astype(cdt)
                vr = v_rows.reshape(B, L, Fn, K).astype(cdt)
                if has("inter"):
                    out = jnp.sum(vr[:, :, 0, :], axis=(1, 2))
                else:
                    xv = vr * vals_c[..., None, None]
                    xvt = jnp.swapaxes(xv, 1, 2)
                    total = jnp.sum(xv * xvt, axis=(1, 2, 3))
                    ar = jnp.arange(L)
                    diag = jnp.sum(jnp.square(xv[:, ar, ar, :]),
                                   axis=(1, 2))
                    out = 0.5 * (total - diag)
                out = out + jnp.sum(w_rows.astype(cdt) * vals_c, axis=-1)
                out = (out + w0.astype(cdt)).astype(jnp.float32)
                wt = batch.mask.astype(jnp.float32)
                denom = jnp.maximum(jnp.sum(wt), 1e-12)
                y_pm = jnp.where(batch.y > 0, 1.0, -1.0)
                data_loss = jnp.sum(
                    jax.nn.softplus(-y_pm * out) * wt) / denom
                active = (batch.vals != 0).astype(jnp.float32) * wt[:, None]
                reg = (jnp.sum(1e-6 * jnp.square(w_rows) * active)
                       + jnp.sum((1e-6 * active)[..., None]
                                 * jnp.square(v_rows))) / jnp.maximum(
                    jnp.sum(wt), 1.0)
                return data_loss + reg, data_loss

            vw_rows = get_rows(vw_u)
            grads, data_loss = jax.grad(
                loss_of, argnums=(0, 1, 2), has_aux=True)(
                state.w0, vw_rows[..., vk], vw_rows[..., :vk])
            g_w0, g_wrows, g_vrows = grads

            gv_s = g_vrows.reshape(-1, vk)
            gw_s = g_wrows.reshape(-1, 1)
            packed = jnp.concatenate(
                [gv_s, jnp.square(gv_s), gw_s, jnp.square(gw_s)], axis=-1)
            if has("acc"):
                acc = (jnp.broadcast_to(packed[:1], (budget, 2 * vk + 2))
                       + vw_u[:, :1] * 1e-30)
            else:
                flat_ranks = plan.ranks.reshape(-1)
                acc = jnp.zeros((budget, 2 * vk + 2),
                                jnp.float32).at[flat_ranks].add(packed)
            g_v_u, sq_v_u = acc[:, :vk], acc[:, vk:2 * vk]
            g_w_u, sq_w_u = acc[:, 2 * vk], acc[:, 2 * vk + 1]

            lr = sgd_cfg.learning_rate
            slot_v_new = slot_v_u + sq_v_u
            v_new = v_u - lr * g_v_u * jax.lax.rsqrt(slot_v_new + 1e-8)
            slot_w_new = slot_w_u + sq_w_u
            w_new = w_u - lr * g_w_u * jax.lax.rsqrt(slot_w_new + 1e-8)
            rec_new = jnp.concatenate(
                [v_new, slot_v_new, w_new[:, None], slot_w_new[:, None],
                 jnp.zeros((budget, W - 2 * vk - 2), jnp.float32)], axis=1)
            if has("write"):
                table = state.table
            else:
                table = PR.scatter_set(state.table, plan.uids, rec_new,
                                       unique_indices=True)
            w0 = state.w0 - lr * g_w0
            new_state = sgd_fused.FusedState(
                table=table, w0=w0, slot_w0=state.slot_w0,
                step=state.step + 1)
            keep = jnp.sum(rec_new[0]) * 1e-20 + data_loss
            return new_state, keep

        return jax.jit(train_step, donate_argnums=(0,)), cfg

    results = {}
    stubs = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "none", "gather", "spread", "inter", "acc", "write",
        "agginter", "bf16", "row", "row+bf16"]
    for stub in stubs:
        step, cfg = make_step(stub)
        state = sgd_fused.init_fused_state(cfg, jax.random.PRNGKey(0))

        def unwrap(aux):
            return aux["loss"] if isinstance(aux, dict) else aux

        state, aux = step(state, batches[0])
        _ = float(unwrap(aux)) + float(state.w0)
        for i in range(2):
            state, aux = step(state, batches[(i + 1) % 4])
        _ = float(unwrap(aux)) + float(state.w0)
        n = 15
        t0 = time.perf_counter()
        for i in range(n):
            state, aux = step(state, batches[i % 4])
        _ = float(unwrap(aux)) + float(state.w0)
        dt = (time.perf_counter() - t0) / n
        results[stub] = dt
        base = results.get("none", dt)
        extra = ("" if stub == "none" or "+" in stub
                 or stub in ("agginter", "bf16", "row")
                 else f"  stage ~{(base - dt) * 1e3:6.2f} ms")
        print(f"{stub:12s} {dt * 1e3:7.2f} ms/step{extra}  "
              f"({B / dt / 1e3:.0f}K ex/s)", flush=True)


if __name__ == "__main__":
    main()
