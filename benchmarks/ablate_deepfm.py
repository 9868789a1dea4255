"""In-step stage ablation of the DeepFM FUSED train step (VERDICT r4 #2).

Config-5 shape: B=8192, 39 fields (one feature per field), 2^20 hashed
buckets, rank 16, tower (256, 128), adagrad, host dedup plans at a ladder
rung — what bench_configs.bench_deepfm stages on the production path
(models/deepfm.py::_make_fused_train_step, round 5).

Stages (stub methodology of ablate_factored.py):

  gather  big-table unique gather  rec_u = table[uids]     (U, 128)
  spread  forward spread           vw_rows = vw_u[ranks]   (B, L, 17)
  fm      FM-head interaction forward + backward
  tower   MLP tower forward + backward (624->256->128->1 matmuls)
  acc     scatter-add of packed [g|g^2] payload            (N,34)->(U,34)
  write   big-table write-back scatter-set                 (U, 128)

Variants (full steps, alternate implementations):

  bf16tower   tower matmuls in bfloat16 (f32 master weights + f32 accum
              via preferred_element_type)

History (measured v5e, B=8192):
  round-4 dedup path (4 separate tables): 20.6 ms/step (397K ex/s)
  round-5 fused path: ~13 ms (627K ex/s bench)

Usage: python benchmarks/ablate_deepfm.py [batch] [stubs,csv]
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
    from sparkfm_tpu.models import deepfm as DF
    from sparkfm_tpu.ops import embedding as E
    from sparkfm_tpu.ops import pallas_rowio as PR

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = 39
    K = 16
    R = 1 << 20
    N = B * L
    cfg = DF.DeepFMConfig(
        fm=FMConfig(num_features=R, num_factors=K, num_fields=L,
                    task=Task.CLASSIFICATION, reg_v=1e-6, seed=0),
        hidden=(256, 128))
    sgd_cfg = SGDConfig(batch_size=B, learning_rate=0.05,
                        optimizer="adagrad")

    rng = np.random.default_rng(0)
    cap = E.auto_budget(N)
    per = R // L
    rung = 1
    raws = []
    for _ in range(4):
        raw = rng.zipf(1.3, size=(B, L)).astype(np.int64)
        ids = ((raw * 2654435761) % R).astype(np.int32)
        ids = (ids % per) + per * np.arange(L, dtype=np.int32)[None, :]
        hp = E.host_dedup(ids, cap, fill=R)
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
            mask=jnp.ones((B,), bool), plan=plan))
    print(f"B={B} R=2^20 L={L} K={K} tower={cfg.hidden} budget={budget} "
          f"uniq~{int(batches[0].plan.count)}", flush=True)

    def make_step(stub):
        stubset = set(stub.split("+")) if stub != "none" else set()
        has = stubset.__contains__
        if not stubset:
            return DF.make_train_step(cfg, sgd_cfg)
        tdt = jnp.bfloat16 if has("bf16tower") else jnp.float32

        def train_step(state, batch):
            table = state["table"]
            W = table.shape[1]
            plan = batch.plan
            valid_u = jax.lax.iota(jnp.int32, budget) < jnp.minimum(
                plan.count, budget)
            if has("gather"):
                rec_u = jnp.broadcast_to(table[:1], (budget, W)) * 1.0
                rec_u = rec_u + plan.uids[:, None].astype(jnp.float32) * 1e-9
            else:
                rec_u = table.at[plan.uids].get(
                    indices_are_sorted=True, mode="promise_in_bounds")
            rec_u = jnp.where(valid_u[:, None], rec_u, 0.0)
            v_u = rec_u[:, :K]
            slot_v_u = rec_u[:, K:2 * K]
            w_u = rec_u[:, 2 * K]
            slot_w_u = rec_u[:, 2 * K + 1]
            vw_u = jnp.concatenate([v_u, w_u[:, None]], axis=1)
            if has("spread"):
                vw_rows = (jnp.broadcast_to(vw_u[0], (B, L, K + 1))
                           + plan.ranks[..., None] * 1e-12)
            else:
                vw_rows = vw_u[plan.ranks]

            def loss_of(w0, w_rows, v_rows, mlp_w, mlp_b):
                vals = batch.vals
                if has("fm"):
                    fm_s = jnp.sum(v_rows[:, :, 0], axis=-1) + w0
                else:
                    vx = v_rows * vals[..., None]
                    s = jnp.sum(vx, axis=1)
                    ssq = jnp.sum(jnp.square(vx), axis=(1, 2))
                    fm_s = 0.5 * (jnp.sum(jnp.square(s), axis=-1) - ssq)
                    fm_s = fm_s + jnp.sum(w_rows * vals, axis=-1) + w0
                if has("tower"):
                    deep = jnp.sum(mlp_b[-1]) + 0.0 * jnp.sum(
                        v_rows[:, 0, :1])
                    out = fm_s + deep
                else:
                    h = (v_rows * vals[..., None]).reshape(B, -1)
                    h = h.astype(tdt)
                    n = len(mlp_w)
                    for i, (mw, mb) in enumerate(zip(mlp_w, mlp_b)):
                        h = jnp.dot(h, mw.astype(tdt),
                                    preferred_element_type=jnp.float32)
                        h = h + mb
                        if i < n - 1:
                            h = jax.nn.relu(h).astype(tdt)
                    out = fm_s + h[:, 0]
                wt = batch.mask.astype(jnp.float32)
                denom = jnp.maximum(jnp.sum(wt), 1e-12)
                y_pm = jnp.where(batch.y > 0, 1.0, -1.0)
                data_loss = jnp.sum(
                    jax.nn.softplus(-y_pm * out) * wt) / denom
                active = (vals != 0).astype(jnp.float32) * wt[:, None]
                reg = (1e-6 * jnp.sum(jnp.square(v_rows)
                                      * active[..., None])) / jnp.maximum(
                    jnp.sum(wt), 1.0)
                return data_loss + reg, data_loss

            grads, data_loss = jax.grad(
                loss_of, argnums=(0, 1, 2, 3, 4), has_aux=True)(
                state["w0"], vw_rows[..., K], vw_rows[..., :K],
                state["mlp_w"], state["mlp_b"])
            g_w0, g_wrows, g_vrows, g_mw, g_mb = grads

            packed = jnp.concatenate(
                [g_vrows.reshape(-1, K), g_wrows.reshape(-1, 1),
                 jnp.square(g_vrows).reshape(-1, K),
                 jnp.square(g_wrows).reshape(-1, 1)], axis=-1)
            if has("acc"):
                acc = (jnp.broadcast_to(packed[:1], (budget, 2 * K + 2))
                       + vw_u[:, :1] * 1e-30)
            else:
                flat_ranks = plan.ranks.reshape(-1)
                acc = jnp.zeros((budget, 2 * K + 2),
                                jnp.float32).at[flat_ranks].add(packed)
            g_v_u, g_w_u = acc[:, :K], acc[:, K]
            sq_v_u, sq_w_u = acc[:, K + 1:2 * K + 1], acc[:, 2 * K + 1]

            lr = sgd_cfg.learning_rate
            slot_v_new = slot_v_u + sq_v_u
            v_new = v_u - lr * g_v_u * jax.lax.rsqrt(slot_v_new + 1e-8)
            slot_w_new = slot_w_u + sq_w_u
            w_new = w_u - lr * g_w_u * jax.lax.rsqrt(slot_w_new + 1e-8)
            rec_new = jnp.concatenate(
                [v_new, slot_v_new, w_new[:, None], slot_w_new[:, None],
                 jnp.zeros((budget, W - 2 * K - 2), jnp.float32)], axis=1)
            if has("write"):
                new_table = table
            else:
                new_table = PR.scatter_set(table, plan.uids, rec_new,
                                           unique_indices=True)
            w0 = state["w0"] - lr * g_w0
            new_mw = tuple(x - lr * g for x, g in zip(state["mlp_w"], g_mw))
            new_mb = tuple(x - lr * g for x, g in zip(state["mlp_b"], g_mb))
            new_state = {"table": new_table, "w0": w0,
                         "slot_w0": state["slot_w0"],
                         "mlp_w": new_mw, "mlp_b": new_mb,
                         "smw": state["smw"], "smb": state["smb"]}
            return new_state, {"loss": data_loss}

        return jax.jit(train_step, donate_argnums=(0,))

    results = {}
    stubs = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "none", "gather", "spread", "fm", "tower", "acc", "write",
        "bf16tower"]
    for stub in stubs:
        step = make_step(stub)
        state = DF.init_fused_deepfm_state(cfg, jax.random.PRNGKey(0))
        state, aux = step(state, batches[0])
        _ = float(aux["loss"]) + float(state["w0"])
        for i in range(2):
            state, aux = step(state, batches[(i + 1) % 4])
        _ = float(aux["loss"]) + float(state["w0"])
        n = 15
        t0 = time.perf_counter()
        for i in range(n):
            state, aux = step(state, batches[i % 4])
        _ = float(aux["loss"]) + float(state["w0"])
        dt = (time.perf_counter() - t0) / n
        results[stub] = dt
        base = results.get("none", dt)
        extra = ("" if stub in ("none", "bf16tower")
                 else f"  stage ~{(base - dt) * 1e3:6.2f} ms")
        print(f"{stub:12s} {dt * 1e3:7.2f} ms/step{extra}  "
              f"({B / dt / 1e3:.0f}K ex/s)", flush=True)


if __name__ == "__main__":
    main()
