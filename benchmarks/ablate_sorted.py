"""In-step stage ablation for the sorted-slot SGD train step.

Mirror of ablate_fused.py: stub one stage, measure the full-step delta.

Usage: python benchmarks/ablate_sorted.py [budget] [batch]
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
    from sparkfm_tpu.ops import losses as LL
    from sparkfm_tpu.ops import pallas_segsum as SS
    from sparkfm_tpu.solvers import sgd_fused

    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    R, L, K = 1 << 22, 39, 32
    cfg = FMConfig(num_features=R, num_factors=K, task=Task.CLASSIFICATION,
                   reg_w=1e-6, reg_v=1e-6, seed=0)
    loss_fn = LL.loss_for_task(cfg.task)
    lr = 0.05

    rng = np.random.default_rng(0)

    def mk():
        raw = rng.zipf(1.3, size=(B, L)).astype(np.int64)
        ids = ((raw * 2654435761) % R).astype(np.int32)
        return SparseBatch(
            ids=jnp.asarray(ids), vals=jnp.ones((B, L), jnp.float32),
            y=jnp.asarray(rng.integers(0, 2, (B,)).astype(np.float32)),
            mask=jnp.ones((B,), bool))

    batches = [mk() for _ in range(4)]
    k = K
    N = B * L

    def make_step(stub):
        def train_step(state, batch):
            F = state.table.shape[0] - 1
            flat = batch.ids.reshape(-1)
            pos = jax.lax.iota(jnp.int32, N)
            if stub == "sort1":
                sid, svals, spos = flat, batch.vals.reshape(-1), pos
            else:
                sid, svals, spos = jax.lax.sort(
                    (flat, batch.vals.reshape(-1), pos), num_keys=1)
            sex = spos // L
            boundary = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), sid[1:] != sid[:-1]])
            seg = jnp.minimum(
                jnp.cumsum(boundary.astype(jnp.int32)) - 1, budget - 1)
            if stub == "compact":
                uids = jax.lax.iota(jnp.int32, budget) % F
            else:
                nb = jnp.logical_not(boundary).astype(jnp.int32)
                _, uid_sorted = jax.lax.sort((nb, sid), num_keys=1,
                                             is_stable=True)
                uids = uid_sorted[:budget]
            rec_u = state.table.at[uids].get(
                indices_are_sorted=True, mode="promise_in_bounds")
            v_u = rec_u[:, :k]
            w_u = rec_u[:, 2 * k]
            vw_u = jnp.concatenate([v_u, w_u[:, None]], axis=1)
            if stub == "expand":
                vw_s = (jnp.broadcast_to(vw_u[0], (N, k + 1))
                        + seg[:, None] * 1e-12)
            else:
                vw_s = vw_u.at[seg].get(indices_are_sorted=True,
                                        mode="promise_in_bounds")
            v_s = vw_s[:, :k]
            w_s = vw_s[:, k]
            x = svals
            c = v_s * x[:, None]
            q = jnp.sum(jnp.square(c), axis=1)
            lin = w_s * x
            slot_feats = jnp.concatenate(
                [c, q[:, None], lin[:, None]], axis=1)
            if stub == "scat_ex":
                agg = slot_feats[:B] * 1.0
            else:
                agg = jnp.zeros((B, k + 2), jnp.float32).at[sex].add(
                    slot_feats)

            def example_loss(agg_, w0_):
                s = (0.5 * (jnp.sum(jnp.square(agg_[:, :k]), axis=1)
                            - agg_[:, k]) + agg_[:, k + 1] + w0_)
                return loss_fn(s, batch.y, None), s

            (g_agg, g_w0), scores = jax.grad(
                example_loss, argnums=(0, 1), has_aux=True)(agg, state.w0)
            if stub == "gath_ex":
                g_slot = jnp.broadcast_to(g_agg[0], (N, k + 2)) * 1.0
            else:
                g_slot = g_agg[sex]
            g_v = (g_slot[:, :k] * x[:, None]
                   + g_slot[:, k:k + 1] * 2.0 * v_s * jnp.square(x)[:, None])
            g_w = g_slot[:, k + 1] * x
            packed = jnp.concatenate(
                [g_v, jnp.square(g_v), g_w[:, None],
                 jnp.square(g_w)[:, None]], axis=1)
            if stub == "segsum":
                acc = packed[:budget] * 1.0
            else:
                acc = SS.segment_rowsum(packed, seg, budget, force="pallas")
            g_v_u, sq_v_u = acc[:, :k], acc[:, k:2 * k]
            g_w_u, sq_w_u = acc[:, 2 * k], acc[:, 2 * k + 1]
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
                table = state.table.at[uids].set(
                    rec_new, indices_are_sorted=True,
                    mode="promise_in_bounds")
            w0 = state.w0 - lr * g_w0
            keep = (jnp.sum(rec_new[0]) * 1e-20 + jnp.sum(acc[0]) * 1e-20
                    + jnp.mean(scores) * 1e-20
                    + loss_fn(scores, batch.y, None))
            return sgd_fused.FusedState(table=table, w0=w0,
                                        slot_w0=state.slot_w0,
                                        step=state.step + 1), keep

        return jax.jit(train_step, donate_argnums=(0,))

    results = {}
    for stub in ["none", "sort1", "compact", "expand", "scat_ex",
                 "gath_ex", "segsum", "write"]:
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
