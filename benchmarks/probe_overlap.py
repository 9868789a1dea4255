"""Write-back/forward overlap probe (VERDICT r4 #5).

PERF.md's round-4 ceiling argument named ONE remaining idea for the
headline: overlap step i's table write-back with step i+1's forward
inside the multi-step scan. The donated-table dependency forbids it
directly (gather(i+1) reads the table write(i) produced), so this probe
breaks the dependency by SOFTWARE PIPELINING with distance 1:

  * the scan carry holds a PENDING write (uids_{i-1}, rec_{i-1}) that
    has NOT been applied to the table yet;
  * step i gathers from the table (which lacks only step i-1's update)
    and PATCHES the gathered rows from the pending record via a sorted
    searchsorted join — exact, because dedup uids are sorted unique;
  * step i's compute proceeds; the pending write flushes to the table
    AFTER the gather, giving the scheduler a full step of slack between
    the scatter and the next dependent gather;
  * step i's own update becomes the new pending record; the last one
    flushes after the scan.

Final table and loss sequence are bit-comparable to the production
multi-step (same update values, same rows; only the dummy fill row —
garbage by contract — can differ). The probe measures both variants at
the headline config and prints ms/step and ex/s.

Expected physics, stated up front: a TPU TensorCore executes one
fusion/kernel at a time; XLA overlaps DMA (async copies, collectives)
with compute but a scatter is a kernel. If the measurement shows no
win, the slack bought by pipelining cannot be banked and the overlap
idea is refuted for this backend — that is the point of measuring.

Usage: python benchmarks/probe_overlap.py [batch] [G] [steps]
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
    from sparkfm_tpu.solvers import sgd_fused, sgd_hybrid

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    R, L, K = 1 << 22, 39, 32
    k = K
    cfg = FMConfig(num_features=R, num_factors=K,
                   task=Task.CLASSIFICATION, reg_w=1e-6, reg_v=1e-6,
                   seed=0)
    sgd_cfg = SGDConfig(batch_size=B, learning_rate=0.05,
                        optimizer="adagrad")

    rng = np.random.default_rng(0)
    cap = E.auto_budget(B * L)
    raws, rung = [], 1
    for _ in range(8):
        ids = ((rng.zipf(1.3, size=(B, L)).astype(np.int64)
                * 2654435761) % R).astype(np.int32)
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
            mask=jnp.ones((B,), bool), plan=plan))
    print(f"B={B} G={G} budget={budget} "
          f"uniq~{int(batches[0].plan.count)}", flush=True)

    stacks = [sgd_hybrid.stack_batches(batches[i:i + G])
              for i in range(0, 8, G)]

    # ---------------- production multi-step (baseline)
    base_multi = sgd_hybrid.make_hybrid_multi_step(cfg, sgd_cfg)

    # ---------------- pipelined variant
    raw_step = sgd_hybrid.make_hybrid_train_step(cfg, sgd_cfg, _jit=False)
    W = sgd_fused.record_width(K)

    def pipelined(state, pend_uids, pend_rec, stacked):
        def body(carry, b):
            table, w0, sw0, step, p_uids, p_rec = carry
            plan = b.plan
            # gather from the (one-step-stale) table, then patch rows
            # updated by the pending record: sorted-unique join
            rec_u = table.at[plan.uids].get(
                indices_are_sorted=True, mode="promise_in_bounds")
            pos = jnp.clip(jnp.searchsorted(p_uids, plan.uids), 0,
                           p_uids.shape[0] - 1)
            match = p_uids[pos] == plan.uids
            rec_u = jnp.where(match[:, None], p_rec[pos], rec_u)

            # run the production step body against a VIRTUAL state whose
            # table gather we just computed: monkey-layer by substituting
            # a tiny table stand-in is not possible, so inline the same
            # math via the raw step on a state holding the REAL table is
            # wrong (it would re-gather). Instead: write the pending
            # update FIRST into a scratch view? No — the whole point is
            # deferring. So this probe re-implements the step tail by
            # patching sgd_hybrid internals: we call the raw step on a
            # state whose table has the pending flushed — but cheat the
            # schedule by flushing AFTER computing rec_u ourselves and
            # handing the step a pre-patched gather is not supported.
            # => do the flush now, but the gather above no longer depends
            # on it; XLA sees: gather(table), scatter(table->table2),
            # compute(rec_u), and is free to run the scatter any time
            # before the next iteration's gather.
            table2 = PR.scatter_set(table, p_uids, p_rec,
                                    unique_indices=True)

            # ---- step math on rec_u (mirrors sgd_hybrid.make_hybrid_
            # train_step; kept in lockstep by the parity check below)
            valid_u = jax.lax.iota(jnp.int32, budget) < jnp.minimum(
                plan.count, budget)
            rec_u = jnp.where(valid_u[:, None], rec_u, 0.0)
            v_u = rec_u[:, :k]
            slot_v_u = rec_u[:, k:2 * k]
            w_u = rec_u[:, 2 * k]
            slot_w_u = rec_u[:, 2 * k + 1]
            vw_u = jnp.concatenate([v_u, w_u[:, None]], axis=1)
            vals = b.vals
            vw_rows = vw_u[plan.ranks]
            vx = vw_rows[..., :k] * vals[..., None]
            s = jnp.sum(vx, axis=1)
            ssq = jnp.sum(jnp.square(vx), axis=(1, 2))
            score = 0.5 * (jnp.sum(jnp.square(s), axis=-1) - ssq)
            score = score + jnp.sum(vw_rows[..., k] * vals, axis=-1)
            score = score + w0
            wt = b.mask.astype(jnp.float32)
            denom_data = jnp.maximum(jnp.sum(wt), 1e-12)
            denom_reg = jnp.maximum(jnp.sum(wt), 1.0)
            y_pm = jnp.where(b.y > 0, 1.0, -1.0)
            z = -y_pm * score
            data_loss = jnp.sum(jax.nn.softplus(z) * wt) / denom_data
            ds = -y_pm * jax.nn.sigmoid(z) * wt / denom_data
            ex_pack = jnp.concatenate([s, ds[:, None], wt[:, None]],
                                      axis=1)
            ex_srt = ex_pack[plan.sex]
            acc = SS.fm_grad_segsum_factored(
                vw_u, ex_srt, plan.svals, plan.seg, budget,
                2.0 * cfg.reg_v / denom_reg, 2.0 * cfg.reg_w / denom_reg)
            g_v_u, g_w_u = acc[:, :k], acc[:, k]
            sq_v_u, sq_w_u = acc[:, k + 1:2 * k + 1], acc[:, 2 * k + 1]
            lr = sgd_cfg.learning_rate
            slot_v_new = slot_v_u + sq_v_u
            v_new = v_u - lr * g_v_u * jax.lax.rsqrt(
                slot_v_new + sgd_cfg.adagrad_eps)
            slot_w_new = slot_w_u + sq_w_u
            w_new = w_u - lr * g_w_u * jax.lax.rsqrt(
                slot_w_new + sgd_cfg.adagrad_eps)
            rec_new = jnp.concatenate(
                [v_new, slot_v_new, w_new[:, None], slot_w_new[:, None],
                 jnp.zeros((budget, W - 2 * k - 2), jnp.float32)], axis=1)
            g_w0 = jnp.sum(ds)
            sw0n = sw0 + jnp.square(g_w0)
            w0n = w0 - lr * g_w0 * jax.lax.rsqrt(sw0n + sgd_cfg.adagrad_eps)
            return ((table2, w0n, sw0n, step + 1, plan.uids, rec_new),
                    data_loss)

        carry = (state.table, state.w0, state.slot_w0, state.step,
                 pend_uids, pend_rec)
        (table, w0, sw0, step, p_uids, p_rec), losses = jax.lax.scan(
            body, carry, stacked)
        return (sgd_fused.FusedState(table=table, w0=w0, slot_w0=sw0,
                                     step=step),
                p_uids, p_rec, losses[-1])

    pipe = jax.jit(pipelined, donate_argnums=(0, 1, 2))

    def flush(state, p_uids, p_rec):
        table = PR.scatter_set(state.table, p_uids, p_rec,
                               unique_indices=True)
        return sgd_fused.FusedState(table=table, w0=state.w0,
                                    slot_w0=state.slot_w0,
                                    step=state.step)

    flush_j = jax.jit(flush, donate_argnums=(0,))

    def fresh():
        return sgd_fused.init_fused_state(cfg, jax.random.PRNGKey(0))

    # ---- parity check first (2 dispatches, then flush)
    sA = fresh()
    for st in stacks[:2]:
        sA, auxA = base_multi(sA, st)
    lossA = float(auxA["loss"])
    sB = fresh()
    pu = jnp.full((budget,), R, jnp.int32)
    pr = jnp.zeros((budget, W), jnp.float32)
    for st in stacks[:2]:
        sB, pu, pr, lB = pipe(sB, pu, pr, st)
    sB = flush_j(sB, pu, pr)
    lossB = float(lB)
    dv = float(jnp.max(jnp.abs(sA.table[:R, :2 * k + 2]
                               - sB.table[:R, :2 * k + 2])))
    print(f"parity: |loss diff|={abs(lossA - lossB):.2e}  "
          f"max|table diff|={dv:.2e}", flush=True)
    assert abs(lossA - lossB) < 1e-5 and dv < 1e-4

    # ---- timing
    def run(kind):
        state = fresh()
        if kind == "pipe":
            pu = jnp.full((budget,), R, jnp.int32)
            pr = jnp.zeros((budget, W), jnp.float32)
        # warmup
        for st in stacks[:2]:
            if kind == "pipe":
                state, pu, pr, l = pipe(state, pu, pr, st)
            else:
                state, aux = base_multi(state, st)
        _ = float(l if kind == "pipe" else aux["loss"])
        t0 = time.perf_counter()
        nd = max(1, steps // G)
        for i in range(nd):
            st = stacks[i % len(stacks)]
            if kind == "pipe":
                state, pu, pr, l = pipe(state, pu, pr, st)
            else:
                state, aux = base_multi(state, st)
        _ = float(l if kind == "pipe" else aux["loss"])
        dt = (time.perf_counter() - t0) / (nd * G)
        print(f"{kind:8s} {dt * 1e3:7.2f} ms/step  "
              f"({B / dt / 1e3:.0f}K ex/s)", flush=True)
        return dt

    run("base")
    run("pipe")
    run("base")
    run("pipe")


if __name__ == "__main__":
    main()
