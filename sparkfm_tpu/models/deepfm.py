"""DeepFM: shared-embedding FM + MLP tower (Guo et al. 2017).

Stretch model family beyond the reference (which ships only second-order FM;
BASELINE.md lists DeepFM as a target config). TPU-native design choices:

  * the FM tables (w, V) double as the deep side's embedding tables — one
    gather feeds both heads;
  * the tower input is the (B, num_fields * K) concatenation of per-field
    embedding rows scaled by their values, so the whole deep side is dense
    MXU matmuls;
  * one jitted train step updates tables sparsely (same dedup-friendly
    row-update machinery as plain FM) and the tower densely.

Assumes field-major input: ids (B, L) with exactly one active feature per
field (the standard DeepFM/CTR layout; synth_ctr produces it).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sparkfm_tpu.config import FMConfig, SGDConfig, Task
from sparkfm_tpu.data.batching import SparseBatch
from sparkfm_tpu.models import fm as fm_model
from sparkfm_tpu.models.fm import FMParams
from sparkfm_tpu.ops import interaction as I
from sparkfm_tpu.ops import losses as L


@dataclasses.dataclass(frozen=True)
class DeepFMConfig:
    """fm: base tables/shape; hidden: tower widths (final scalar layer is
    implicit)."""

    fm: FMConfig
    hidden: Tuple[int, ...] = (128, 64)

    @property
    def tower_in(self) -> int:
        # one embedding row per slot; L is data-dependent, so the tower is
        # built for a fixed num_fields worth of slots
        return self.num_fields * self.fm.num_factors

    @property
    def num_fields(self) -> int:
        if self.fm.num_fields <= 0:
            raise ValueError("DeepFMConfig requires fm.num_fields > 0 "
                             "(slots-per-example = field count)")
        return self.fm.num_fields


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeepFMParams:
    fm: FMParams
    mlp_w: tuple     # tuple of (in, out) f32
    mlp_b: tuple     # tuple of (out,) f32


def init_params(cfg: DeepFMConfig,
                key: Optional[jax.Array] = None) -> DeepFMParams:
    if key is None:
        key = jax.random.PRNGKey(cfg.fm.seed)
    k_fm, k_mlp = jax.random.split(key)
    # Plain-FM table init; the FFM num_fields knob must NOT widen V here —
    # DeepFM uses a single shared (F, K) table.
    base = cfg.fm.replace(num_fields=0)
    fm_params = fm_model.init_params(base, k_fm)
    dims = (cfg.tower_in,) + tuple(cfg.hidden) + (1,)
    ws, bs = [], []
    for i in range(len(dims) - 1):
        k_mlp, k = jax.random.split(k_mlp)
        # He init for relu layers
        ws.append(jax.random.normal(k, (dims[i], dims[i + 1]), jnp.float32)
                  * jnp.sqrt(2.0 / dims[i]))
        bs.append(jnp.zeros((dims[i + 1],), jnp.float32))
    return DeepFMParams(fm=fm_params, mlp_w=tuple(ws), mlp_b=tuple(bs))


def _tower(params: DeepFMParams, emb_flat: jnp.ndarray) -> jnp.ndarray:
    h = emb_flat
    n = len(params.mlp_w)
    for i, (w, b) in enumerate(zip(params.mlp_w, params.mlp_b)):
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < n - 1:
            h = jax.nn.relu(h)
    return h[:, 0]


def scores_from_rows(params: DeepFMParams, cfg: DeepFMConfig,
                     w_rows, v_rows, vals) -> jnp.ndarray:
    """FM head + deep head from gathered rows (B, L[, K])."""
    fm_s = I.fm_scores_from_gathered(
        params.fm.w0, w_rows, v_rows, vals,
        use_bias=cfg.fm.use_bias, use_linear=cfg.fm.use_linear,
        compute_dtype=jnp.dtype(cfg.fm.compute_dtype))
    b = vals.shape[0]
    emb = (v_rows * vals[..., None]).reshape(b, -1)
    return fm_s + _tower(params, emb)


def scores(params: DeepFMParams, cfg: DeepFMConfig,
           ids, vals) -> jnp.ndarray:
    return scores_from_rows(params, cfg, params.fm.w[ids],
                            params.fm.v[ids], vals)


def predict(params: DeepFMParams, cfg: DeepFMConfig, ids, vals):
    return L.predict_for_task(cfg.fm.task, scores(params, cfg, ids, vals))


def resolve_deepfm_path(cfg: DeepFMConfig, sgd_cfg: SGDConfig) -> str:
    """auto policy: small tables -> direct XLA; big tables -> fused record
    (round 5: ONE unique-row gather + ONE write for [v|slot_v|w|slot_w] —
    the dedup path's four separate write-back scatters were the dominant
    DeepFM stage, same disease the FFM path had; benchmarks/ablate_deepfm
    .py). "dedup" stays available explicitly (and is the momentum-free
    fallback shape the sharded path mirrors)."""
    path = sgd_cfg.update_path
    if path == "auto":
        if cfg.fm.num_features < (1 << 16):
            return "direct"
        return "fused"
    return path


def make_train_step(cfg: DeepFMConfig, sgd_cfg: SGDConfig):
    """Jitted step: sparse adagrad on tables + dense update on the tower.

    Table access routes like plain FM (resolve_deepfm_path): big tables
    go through the fused-record machinery — unique-compact the batch ids
    (host plan when the batch carries one), ONE big-table gather/write
    per unique id, per-slot math against the small (U, K) matrix — so
    DeepFM scales to hashed Criteo-size tables exactly like the FM path
    (VERDICT r1 item 8, r4 #2).
    """
    path = resolve_deepfm_path(cfg, sgd_cfg)
    if path not in ("direct", "dedup", "fused"):
        raise ValueError(f"deepfm supports update_path direct/dedup/fused, "
                         f"got {path!r}")
    _check_deepfm_optimizer(sgd_cfg, path)
    if path == "fused":
        return _make_fused_train_step(cfg, sgd_cfg)
    if path == "dedup":
        return _make_dedup_train_step(cfg, sgd_cfg)
    return _make_direct_train_step(cfg, sgd_cfg)


def _check_deepfm_optimizer(sgd_cfg: SGDConfig, path: str) -> None:
    """Honor-or-reject, never silently downgrade (VERDICT r2 weak #5):
    DeepFM implements adagrad and plain sgd (+momentum on the direct path);
    adam would need second-moment slots the deepfm state doesn't carry."""
    ok = ("adagrad", "sgd")
    if sgd_cfg.optimizer not in ok:
        raise ValueError(
            f"deepfm supports optimizer 'adagrad' or 'sgd', got "
            f"{sgd_cfg.optimizer!r} — it would otherwise train with a "
            "different optimizer than requested")
    if path in ("dedup", "fused") and sgd_cfg.momentum > 0:
        raise ValueError(f"deepfm {path} path does not support momentum; "
                         "use update_path='direct' or momentum=0")


def _dense_tower_update(opt: str, lr: float, sgd_cfg: SGDConfig,
                        x, s, g):
    if opt == "adagrad":
        s = s + jnp.square(g)
        return x - lr * g * jax.lax.rsqrt(s + sgd_cfg.adagrad_eps), s
    if sgd_cfg.momentum > 0:
        s = sgd_cfg.momentum * s + g
        return x - lr * s, s
    return x - lr * g, s


def _deepfm_loss(cfg: DeepFMConfig, batch: SparseBatch,
                 w0, w_rows, v_rows, mlp_w, mlp_b):
    """Shared loss for all three table-access steps (direct/dedup/fused):
    both heads from gathered rows + per-appearance L2 on the touched
    rows. ONE definition so the paths cannot drift (they are parity-
    tested against each other, but tested-equal is weaker than
    provably-identical)."""
    fm_cfg = cfg.fm
    pp = DeepFMParams(fm=FMParams(w0=w0, w=None, v=None),
                      mlp_w=mlp_w, mlp_b=mlp_b)
    s = scores_from_rows(pp, cfg, w_rows, v_rows, batch.vals)
    loss_fn = L.loss_for_task(fm_cfg.task)
    wts = None if batch.mask is None else batch.mask.astype(jnp.float32)
    data_loss = loss_fn(s, batch.y, wts)
    active = (batch.vals != 0).astype(jnp.float32)
    if batch.mask is not None:
        active = active * batch.mask[:, None]
    denom = jnp.maximum(
        jnp.sum(batch.mask.astype(jnp.float32))
        if batch.mask is not None else float(batch.vals.shape[0]), 1.0)
    reg = (fm_cfg.reg_w * jnp.sum(jnp.square(w_rows) * active)
           + fm_cfg.reg_v * jnp.sum(
               jnp.square(v_rows) * active[..., None])) / denom
    return data_loss + reg, data_loss


def _tower_updates(opt: str, lr: float, sgd_cfg: SGDConfig,
                   mlp_w, mlp_b, smw, smb, g_mw, g_mb):
    """Dense optimizer step over all tower layers; returns
    (new_mw, new_smw, new_mb, new_smb) tuples."""
    new_mw, new_smw, new_mb, new_smb = [], [], [], []
    for x, sl, g in zip(mlp_w, smw, g_mw):
        x2, s2 = _dense_tower_update(opt, lr, sgd_cfg, x, sl, g)
        new_mw.append(x2); new_smw.append(s2)
    for x, sl, g in zip(mlp_b, smb, g_mb):
        x2, s2 = _dense_tower_update(opt, lr, sgd_cfg, x, sl, g)
        new_mb.append(x2); new_smb.append(s2)
    return (tuple(new_mw), tuple(new_smw), tuple(new_mb), tuple(new_smb))


def _make_direct_train_step(cfg: DeepFMConfig, sgd_cfg: SGDConfig):
    from sparkfm_tpu.solvers import sgd as sgd_solver

    fm_cfg = cfg.fm

    def train_step(state, batch: SparseBatch):
        p: DeepFMParams = state["params"]
        slots = state["slots"]
        ids = batch.ids
        bsz, lq = ids.shape
        ids_flat = ids.reshape(-1)

        w_rows = p.fm.w[ids]
        v_rows = p.fm.v[ids]

        def loss_of(w0, w_rows, v_rows, mlp_w, mlp_b):
            return _deepfm_loss(cfg, batch, w0, w_rows, v_rows,
                                mlp_w, mlp_b)

        grads, data_loss = jax.grad(
            loss_of, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            p.fm.w0, w_rows, v_rows, p.mlp_w, p.mlp_b)
        g_w0, g_wrows, g_vrows, g_mw, g_mb = grads

        lr, opt = sgd_cfg.learning_rate, sgd_cfg.optimizer
        w, sw, _ = sgd_solver._row_update(
            opt, lr, sgd_cfg, p.fm.w, slots["w"], None,
            ids_flat, g_wrows.reshape(-1), None)
        v, sv, _ = sgd_solver._row_update(
            opt, lr, sgd_cfg, p.fm.v, slots["v"], None,
            ids_flat, g_vrows.reshape(bsz * lq, -1), None)
        w0, sw0, _ = sgd_solver._dense_scalar_update(
            opt, lr, sgd_cfg, p.fm.w0, slots["w0"], None, g_w0, None)

        new_mw, new_smw, new_mb, new_smb = _tower_updates(
            opt, lr, sgd_cfg, p.mlp_w, p.mlp_b, slots["mw"], slots["mb"],
            g_mw, g_mb)

        new_state = {
            "params": DeepFMParams(fm=FMParams(w0=w0, w=w, v=v),
                                   mlp_w=tuple(new_mw), mlp_b=tuple(new_mb)),
            "slots": {"w0": sw0, "w": sw, "v": sv,
                      "mw": tuple(new_smw), "mb": tuple(new_smb)},
        }
        return new_state, {"loss": data_loss}

    return jax.jit(train_step, donate_argnums=(0,))


def _make_dedup_train_step(cfg: DeepFMConfig, sgd_cfg: SGDConfig):
    """Dedup table access for DeepFM: same plan/unique-row machinery as
    solvers/sgd.py::_make_dedup_train_step, tower grads ride along densely.
    Requires the state to be padded (pad_deepfm_state_for_dedup)."""
    from sparkfm_tpu.ops import embedding as E
    from sparkfm_tpu.ops import pallas_rowio as PR
    from sparkfm_tpu.solvers import sgd as sgd_solver

    fm_cfg = cfg.fm
    k = fm_cfg.num_factors

    def train_step(state, batch: SparseBatch):
        p: DeepFMParams = state["params"]
        slots = state["slots"]
        F = p.fm.w.shape[0] - 1            # padded: last row is the dummy
        n_slots = batch.ids.shape[0] * batch.ids.shape[1]
        budget = sgd_cfg.unique_budget or E.auto_budget(n_slots)
        if batch.plan is not None:
            plan = batch.plan
            budget = plan.uids.shape[0]
        else:
            plan = E.dedup_ids(batch.ids, budget, fill=F)
        valid_u = jax.lax.iota(jnp.int32, budget) < jnp.minimum(
            plan.count, budget)

        w_u = jnp.where(valid_u, p.fm.w[plan.uids], 0.0)
        v_u = jnp.where(valid_u[:, None], p.fm.v[plan.uids], 0.0)
        vw_u = jnp.concatenate([v_u, w_u[:, None]], axis=1)
        vw_rows = vw_u[plan.ranks]
        v_rows = vw_rows[..., :k]
        w_rows = vw_rows[..., k]

        def loss_of(w0, w_rows, v_rows, mlp_w, mlp_b):
            return _deepfm_loss(cfg, batch, w0, w_rows, v_rows,
                                mlp_w, mlp_b)

        grads, data_loss = jax.grad(
            loss_of, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            p.fm.w0, w_rows, v_rows, p.mlp_w, p.mlp_b)
        g_w0, g_wrows, g_vrows, g_mw, g_mb = grads

        # per-unique sums of grads and squared grads (small scatter).
        # Measured on chip (round 4): the sorted-permute + streaming
        # segsum alternative is ~6% SLOWER in-step here (373K vs 397K
        # ex/s — the permute gather costs more than the scatter saves at
        # B=8192/L=39), matching the r3 accumulate ablation; keep the
        # scatter.
        packed = jnp.concatenate(
            [g_vrows.reshape(-1, k), g_wrows.reshape(-1, 1),
             jnp.square(g_vrows).reshape(-1, k),
             jnp.square(g_wrows).reshape(-1, 1)], axis=-1)
        acc = E.accumulate_to_unique(
            packed.reshape(batch.ids.shape + (2 * k + 2,)), plan, budget)
        g_v_u, g_w_u = acc[:, :k], acc[:, k]
        sq_v_u, sq_w_u = acc[:, k + 1:2 * k + 1], acc[:, 2 * k + 1]

        lr, opt = sgd_cfg.learning_rate, sgd_cfg.optimizer
        if opt == "adagrad":
            sv_u = slots["v"][plan.uids] + sq_v_u
            v_new = v_u - lr * g_v_u * jax.lax.rsqrt(
                sv_u + sgd_cfg.adagrad_eps)
            sw_u = slots["w"][plan.uids] + sq_w_u
            w_new = w_u - lr * g_w_u * jax.lax.rsqrt(
                sw_u + sgd_cfg.adagrad_eps)
        else:                      # plain sgd (momentum rejected upstream)
            sv_u = slots["v"][plan.uids]
            sw_u = slots["w"][plan.uids]
            v_new = v_u - lr * g_v_u
            w_new = w_u - lr * g_w_u
        kw = dict(force=sgd_cfg.pallas_scatter, unique_indices=True)
        v = PR.scatter_set(p.fm.v, plan.uids, v_new, **kw)
        sv = PR.scatter_set(slots["v"], plan.uids, sv_u, **kw)
        w = PR.scatter_set(p.fm.w, plan.uids, w_new, **kw)
        sw = PR.scatter_set(slots["w"], plan.uids, sw_u, **kw)

        w0, sw0, _ = sgd_solver._dense_scalar_update(
            opt, lr, sgd_cfg, p.fm.w0, slots["w0"], None, g_w0, None)

        new_mw, new_smw, new_mb, new_smb = _tower_updates(
            opt, lr, sgd_cfg, p.mlp_w, p.mlp_b, slots["mw"], slots["mb"],
            g_mw, g_mb)

        new_state = {
            "params": DeepFMParams(fm=FMParams(w0=w0, w=w, v=v),
                                   mlp_w=tuple(new_mw), mlp_b=tuple(new_mb)),
            "slots": {"w0": sw0, "w": sw, "v": sv,
                      "mw": tuple(new_smw), "mb": tuple(new_smb)},
        }
        return new_state, {"loss": data_loss,
                           "unique_count": plan.count,
                           "unique_overflow": plan.overflow}

    return jax.jit(train_step, donate_argnums=(0,))


def init_fused_deepfm_state(cfg: DeepFMConfig,
                            key: Optional[jax.Array] = None) -> dict:
    """Fused-record DeepFM state: the FM tables + their adagrad slots live
    in ONE (F+1, W) row table [v (K) | slot_v (K) | w | slot_w | pad]
    (W = the 128-lane tile above 2K+2; solvers/sgd_fused.py layout) so a
    step pays one unique-row gather and one write-back instead of four
    each way. Tower params/slots stay dense. Same keyed init as
    init_params."""
    from sparkfm_tpu.solvers import sgd_fused

    params = init_params(cfg, key)
    base = cfg.fm.replace(num_fields=0)   # single shared (F, K) table
    fused = sgd_fused.fused_from_params(params.fm, base)
    z = lambda x: jnp.zeros_like(x)
    return {"table": fused.table, "w0": fused.w0,
            "slot_w0": jnp.zeros((), jnp.float32),
            "mlp_w": params.mlp_w, "mlp_b": params.mlp_b,
            "smw": tuple(z(x) for x in params.mlp_w),
            "smb": tuple(z(x) for x in params.mlp_b)}


def params_from_fused_deepfm(state: dict, cfg: DeepFMConfig) -> DeepFMParams:
    k = cfg.fm.num_factors
    f = cfg.fm.num_features
    return DeepFMParams(
        fm=FMParams(w0=state["w0"], w=state["table"][:f, 2 * k],
                    v=state["table"][:f, :k]),
        mlp_w=state["mlp_w"], mlp_b=state["mlp_b"])


def _make_fused_train_step(cfg: DeepFMConfig, sgd_cfg: SGDConfig):
    """Fused-record DeepFM step (round 5): mirrors
    solvers/sgd_fused.make_fused_train_step with the tower's dense grads
    riding along. One (U, W) gather feeds both heads (the embedding rows
    ARE the FM v rows); one (U, W) scatter-set writes tables + slots."""
    from sparkfm_tpu.ops import embedding as E
    from sparkfm_tpu.ops import pallas_rowio as PR
    from sparkfm_tpu.solvers import sgd as sgd_solver

    fm_cfg = cfg.fm
    k = fm_cfg.num_factors

    def train_step(state: dict, batch: SparseBatch):
        table = state["table"]
        F = table.shape[0] - 1             # last row = dedup dummy
        W = table.shape[1]
        n_slots = batch.ids.shape[0] * batch.ids.shape[1]
        budget = sgd_cfg.unique_budget or E.auto_budget(n_slots)
        if batch.plan is not None:
            plan = batch.plan
            budget = plan.uids.shape[0]
        else:
            plan = E.dedup_ids(batch.ids, budget, fill=F)
        valid_u = jax.lax.iota(jnp.int32, budget) < jnp.minimum(
            plan.count, budget)

        rec_u = table.at[plan.uids].get(
            indices_are_sorted=True, mode="promise_in_bounds")  # (U, W)
        rec_u = jnp.where(valid_u[:, None], rec_u, 0.0)
        v_u = rec_u[:, :k]
        slot_v_u = rec_u[:, k:2 * k]
        w_u = rec_u[:, 2 * k]
        slot_w_u = rec_u[:, 2 * k + 1]
        vw_u = jnp.concatenate([v_u, w_u[:, None]], axis=1)
        vw_rows = vw_u[plan.ranks]                            # (B, L, k+1)
        v_rows = vw_rows[..., :k]
        w_rows = vw_rows[..., k]

        def loss_of(w0, w_rows, v_rows, mlp_w, mlp_b):
            return _deepfm_loss(cfg, batch, w0, w_rows, v_rows,
                                mlp_w, mlp_b)

        grads, data_loss = jax.grad(
            loss_of, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            state["w0"], w_rows, v_rows, state["mlp_w"], state["mlp_b"])
        g_w0, g_wrows, g_vrows, g_mw, g_mb = grads

        # scatter-add accumulate (measured round 4: sorted segsum ~6%
        # slower in-step at this shape; keep the scatter)
        packed = jnp.concatenate(
            [g_vrows.reshape(-1, k), g_wrows.reshape(-1, 1),
             jnp.square(g_vrows).reshape(-1, k),
             jnp.square(g_wrows).reshape(-1, 1)], axis=-1)
        acc = E.accumulate_to_unique(
            packed.reshape(batch.ids.shape + (2 * k + 2,)), plan, budget)
        g_v_u, g_w_u = acc[:, :k], acc[:, k]
        sq_v_u, sq_w_u = acc[:, k + 1:2 * k + 1], acc[:, 2 * k + 1]

        lr, opt = sgd_cfg.learning_rate, sgd_cfg.optimizer
        if opt == "adagrad":
            slot_v_new = slot_v_u + sq_v_u
            v_new = v_u - lr * g_v_u * jax.lax.rsqrt(
                slot_v_new + sgd_cfg.adagrad_eps)
            slot_w_new = slot_w_u + sq_w_u
            w_new = w_u - lr * g_w_u * jax.lax.rsqrt(
                slot_w_new + sgd_cfg.adagrad_eps)
        else:                              # plain sgd
            slot_v_new, slot_w_new = slot_v_u, slot_w_u
            v_new = v_u - lr * g_v_u
            w_new = w_u - lr * g_w_u
        rec_new = jnp.concatenate(
            [v_new, slot_v_new, w_new[:, None], slot_w_new[:, None],
             jnp.zeros((budget, W - 2 * k - 2), jnp.float32)], axis=1)
        new_table = PR.scatter_set(table, plan.uids, rec_new,
                                   force=sgd_cfg.pallas_scatter,
                                   unique_indices=True)

        w0, sw0, _ = sgd_solver._dense_scalar_update(
            opt, lr, sgd_cfg, state["w0"], state["slot_w0"], None,
            g_w0, None)

        new_mw, new_smw, new_mb, new_smb = _tower_updates(
            opt, lr, sgd_cfg, state["mlp_w"], state["mlp_b"],
            state["smw"], state["smb"], g_mw, g_mb)

        new_state = {"table": new_table, "w0": w0, "slot_w0": sw0,
                     "mlp_w": tuple(new_mw), "mlp_b": tuple(new_mb),
                     "smw": tuple(new_smw), "smb": tuple(new_smb)}
        return new_state, {"loss": data_loss,
                           "unique_count": plan.count,
                           "unique_overflow": plan.overflow}

    return jax.jit(train_step, donate_argnums=(0,))


def pad_deepfm_state_for_dedup(state: dict) -> dict:
    """Append the dedup dummy row to the FM tables + their slots."""
    pad = lambda x: jnp.concatenate(
        [x, jnp.zeros((1,) + x.shape[1:], x.dtype)], axis=0)
    p = state["params"]
    s = state["slots"]
    return {
        "params": DeepFMParams(
            fm=FMParams(w0=p.fm.w0, w=pad(p.fm.w), v=pad(p.fm.v)),
            mlp_w=p.mlp_w, mlp_b=p.mlp_b),
        "slots": {"w0": s["w0"], "w": pad(s["w"]), "v": pad(s["v"]),
                  "mw": s["mw"], "mb": s["mb"]},
    }


def init_state(params: DeepFMParams) -> dict:
    z = lambda x: jnp.zeros_like(x)
    return {"params": params,
            "slots": {"w0": z(params.fm.w0), "w": z(params.fm.w),
                      "v": z(params.fm.v),
                      "mw": tuple(z(x) for x in params.mlp_w),
                      "mb": tuple(z(x) for x in params.mlp_b)}}


def train_deepfm(cfg: DeepFMConfig, sgd_cfg: SGDConfig, train,
                 eval_ds=None, eval_every: int = 1,
                 key: Optional[jax.Array] = None, mesh=None,
                 checkpoint_dir: Optional[str] = None,
                 checkpoint_every: int = 1, resume: bool = True):
    """Mini training loop mirroring trainer.train_sgd for DeepFM.

    With ``mesh``, trains the sharded step (BASELINE config 5 "on pod
    slice"): FM tables row-sharded with the unique exchange, tower
    data-parallel — parallel/sharded_deepfm.py.

    With ``checkpoint_dir``, the full state (FM tables + slots + tower)
    is Orbax-saved every ``checkpoint_every`` epochs and, if ``resume``
    and a checkpoint exists, training continues from the saved epoch
    with the identical (seed, epoch)-keyed batch order — bit-exact
    resume, same contract as trainer.train_sgd (VERDICT r3 #6).
    """
    import time

    import numpy as np
    from scipy.special import expit as _expit

    from sparkfm_tpu.data.batching import batch_iterator
    from sparkfm_tpu.ops import metrics as MM
    from sparkfm_tpu.training.trainer import TrainResult

    if mesh is not None:
        from sparkfm_tpu.config import MeshConfig
        exchange = "auto"
        if isinstance(mesh, MeshConfig):
            # honor the exchange pin (converting to a raw Mesh here used
            # to silently drop it — ADVICE r3 low)
            exchange = mesh.exchange
            from sparkfm_tpu.parallel import mesh as _M
            mesh = _M.mesh_from_config(mesh)
        return _train_deepfm_sharded(cfg, sgd_cfg, train, eval_ds,
                                     eval_every, key, mesh,
                                     exchange=exchange,
                                     checkpoint_dir=checkpoint_dir,
                                     checkpoint_every=checkpoint_every,
                                     resume=resume)
    path = resolve_deepfm_path(cfg, sgd_cfg)
    if path == "fused":
        state = init_fused_deepfm_state(cfg, key)
        get_params = lambda s: params_from_fused_deepfm(s, cfg)
    else:
        state = init_state(init_params(cfg, key))
        get_params = lambda s: s["params"]
    dedup_budget = dedup_fill = None
    if path == "dedup":
        state = pad_deepfm_state_for_dedup(state)
    if path in ("dedup", "fused") and sgd_cfg.host_plan:
        from sparkfm_tpu.ops import embedding as _E
        dedup_budget = sgd_cfg.unique_budget or _E.auto_budget(
            sgd_cfg.batch_size * train.max_nnz)
        dedup_fill = cfg.fm.num_features
    step_fn = make_train_step(cfg, sgd_cfg)
    score_jit = jax.jit(lambda p, i, v: scores(p, cfg, i, v))

    def eval_metrics(p, ds):
        outs = []
        for b in batch_iterator(ds, sgd_cfg.batch_size, shuffle=False):
            s = score_jit(p, b.ids, b.vals)
            nv = int(np.sum(np.asarray(b.mask)))
            outs.append(np.asarray(s)[:nv])
        s = np.concatenate(outs)
        y = ds.y[:len(s)]
        if cfg.fm.task == Task.REGRESSION:
            return {"rmse": float(np.sqrt(np.mean((s - y) ** 2)))}
        prob = _expit(s)  # overflow-safe sigmoid
        y01 = (y > 0).astype(np.float64)
        return {"auc": float(MM.auc(jnp.asarray(s), jnp.asarray(y))),
                "accuracy": float(np.mean((prob >= .5) == (y01 > .5)))}

    history = []
    start_epoch = 0
    ckpt = None
    if checkpoint_dir is not None:
        from sparkfm_tpu.utils.checkpoint import Checkpointer
        ckpt = Checkpointer(checkpoint_dir)
        if resume and ckpt.latest_step() is not None:
            try:
                state, extra = ckpt.restore(template=state)
            except Exception as e:
                raise ValueError(
                    f"checkpoint at {checkpoint_dir} does not match the "
                    f"resolved update path {path!r} state layout — it was "
                    "probably written under a different update_path (the "
                    "'auto' policy can change across versions: round 5 "
                    "routes big-table DeepFM to 'fused'). Pin SGDConfig."
                    "update_path to the original path to resume, or start "
                    "fresh with resume=False.") from e
            start_epoch = int(extra.get("epoch", -1)) + 1
            history = list(extra.get("history", []))
    n = 0
    t0 = time.perf_counter()
    from sparkfm_tpu.data.batching import prefetch
    for epoch in range(start_epoch, sgd_cfg.epochs):
        losses = []
        for batch in prefetch(batch_iterator(
                train, sgd_cfg.batch_size,
                shuffle=sgd_cfg.shuffle_each_epoch,
                seed=cfg.fm.seed, epoch=epoch,
                dedup_budget=dedup_budget, dedup_fill=dedup_fill)):
            state, aux = step_fn(state, batch)
            losses.append(aux["loss"])
            n += batch.batch_size
        rec = {"epoch": epoch,
               "train_loss": float(jnp.mean(jnp.stack(losses)))}
        if eval_ds is not None and (epoch % eval_every == 0
                                    or epoch == sgd_cfg.epochs - 1):
            rec.update({f"eval_{k}": v
                        for k, v in eval_metrics(get_params(state),
                                                 eval_ds).items()})
        history.append(rec)
        stop = bool(sgd_cfg.max_seconds
                    and time.perf_counter() - t0 >= sgd_cfg.max_seconds)
        if ckpt is not None and ((epoch + 1) % checkpoint_every == 0
                                 or epoch == sgd_cfg.epochs - 1 or stop):
            ckpt.save(epoch, state,
                      extra={"epoch": epoch, "history": history})
        if stop:        # wall-clock budget (reference `timeout`, FM.scala:30)
            break
    if ckpt is not None:
        ckpt.close()
    eps = n / max(time.perf_counter() - t0, 1e-9)
    params = get_params(state)     # fused extraction already drops pad/dummy
    if path == "dedup":   # drop the dummy row
        f = cfg.fm.num_features
        params = DeepFMParams(
            fm=FMParams(w0=params.fm.w0, w=params.fm.w[:f],
                        v=params.fm.v[:f]),
            mlp_w=params.mlp_w, mlp_b=params.mlp_b)
    return TrainResult(params=params, history=history,
                       examples_per_sec=eps)


def _train_deepfm_sharded(cfg: DeepFMConfig, sgd_cfg: SGDConfig, train,
                          eval_ds, eval_every: int, key, mesh,
                          exchange: str = "auto",
                          checkpoint_dir: Optional[str] = None,
                          checkpoint_every: int = 1, resume: bool = True):
    """Sharded DeepFM loop: parallel/sharded_deepfm.py step over the
    (data, model) mesh, per-host batch slices via parallel/multihost.py.

    exchange (MeshConfig.exchange, honored-or-rejected):
      * "auto"   — global host plans when host_plan, else per-shard
                   device dedup (the unique exchange without plans)
      * "global" — one host plan over the global batch (requires
                   host_plan=True)
      * "unique" — per-shard plans: stacked host plans when host_plan,
                   else device dedup
      * "dense"  — rejected: DeepFM's table updates always go through the
                   unique-row machinery (adam/momentum are rejected by
                   _check_deepfm_optimizer long before this).
    """
    import logging
    import time

    import numpy as np
    from scipy.special import expit as _expit

    from sparkfm_tpu.data.batching import batch_iterator, prefetch
    from sparkfm_tpu.ops import metrics as MM
    from sparkfm_tpu.parallel import multihost as MH
    from sparkfm_tpu.parallel import sharded_deepfm as SD
    from sparkfm_tpu.training.trainer import TrainResult

    log = logging.getLogger("sparkfm_tpu")
    if exchange not in ("auto", "global", "unique"):
        raise ValueError(
            f"sharded DeepFM supports exchange auto/global/unique, got "
            f"{exchange!r} (dense slot exchange does not apply: DeepFM "
            "table updates are per-unique-row)")
    if exchange == "global" and not sgd_cfg.host_plan:
        raise ValueError("exchange='global' requires host_plan=True "
                         "(it consumes a host dedup plan)")
    mode = exchange
    if mode == "auto":
        mode = "global" if sgd_cfg.host_plan else "unique"
    log.info("mesh path (deepfm): exchange=%s%s", mode,
             "" if sgd_cfg.host_plan else " (device dedup, no host plans)")

    state, pcfg = SD.init_sharded_state(cfg, mesh, key)
    step_fn = SD.make_sharded_train_step(pcfg, sgd_cfg, mesh)
    score_fn = SD.make_sharded_score(pcfg, mesh)

    # Host GLOBAL dedup plans (ladder-sized): the sharded step's backward
    # becomes one psum of aligned per-unique sums instead of an
    # all_gather (parallel/sharded_sgd.py "global" exchange).
    from sparkfm_tpu.ops import embedding as _E
    use_plan = sgd_cfg.host_plan
    plan_cap = _E.auto_budget(sgd_cfg.batch_size * train.max_nnz)
    plan_rung = [1]
    plan_fill = pcfg.fm.num_features - 1
    d_shards = mesh.shape["data"]
    stacked_budget = _E.auto_budget(
        (sgd_cfg.batch_size // d_shards) * train.max_nnz)

    def lift(batch, with_plan=True):
        # Same multi-process discipline as trainer._train_sgd_sharded's
        # lift: plans derive from the FULL global batch (identical on
        # every process by the same-seed iterator), then each process
        # keeps only its contiguous slice of the per-row arrays before
        # make_array_from_process_local_data assembles the global batch.
        import dataclasses as _dc

        import jax as _jax
        plan = None
        plan_mode = "global"
        if with_plan and use_plan and mode == "global":
            hp = _E.host_dedup(np.asarray(batch.ids), plan_cap, plan_fill)
            plan_rung[0] = max(plan_rung[0], _E.ladder_budget(
                int(hp.count), cap=plan_cap))
            plan = hp._replace(uids=hp.uids[:plan_rung[0]], order=None,
                               seg=None, svals=None, sex=None)
        if _jax.process_count() > 1:
            sl = MH.process_batch_slice(batch.batch_size)
            batch = _dc.replace(
                batch, ids=batch.ids[sl], vals=batch.vals[sl],
                y=batch.y[sl],
                mask=None if batch.mask is None else batch.mask[sl],
                field_ids=(None if batch.field_ids is None
                           else batch.field_ids[sl]))
            if plan is not None:
                plan = plan._replace(ranks=plan.ranks[sl])
        if with_plan and use_plan and mode == "unique":
            # stacked per-shard plans build from this process's LOCAL
            # shard rows (each shard's plan is self-contained)
            local_shards = d_shards // _jax.process_count()
            plan = _E.stack_plans(np.asarray(batch.ids), local_shards,
                                  budget=stacked_budget, fill=plan_fill)
            plan_mode = "stacked"
        return MH.global_batch(mesh, batch, has_fields=False, plan=plan,
                               plan_mode=plan_mode)

    def eval_metrics(params, ds):
        outs = []
        for b in batch_iterator(ds, sgd_cfg.batch_size, shuffle=False):
            nv = int(np.sum(np.asarray(b.mask)))
            gb = lift(b, with_plan=False)   # scoring takes no plan
            s = score_fn(params, gb.ids, gb.vals)
            outs.append(np.asarray(MH.collect(s))[:nv])
        s = np.concatenate(outs)
        y = ds.y[:len(s)]
        if cfg.fm.task == Task.REGRESSION:
            return {"rmse": float(np.sqrt(np.mean((s - y) ** 2)))}
        prob = _expit(s)
        y01 = (y > 0).astype(np.float64)
        return {"auc": float(MM.auc(jnp.asarray(s), jnp.asarray(y))),
                "accuracy": float(np.mean((prob >= .5) == (y01 > .5)))}

    history = []
    start_epoch = 0
    ckpt = None
    if checkpoint_dir is not None:
        # sharded state restores per-shard through the template's
        # NamedShardings (utils/checkpoint.py) — no host funnel
        from sparkfm_tpu.utils.checkpoint import Checkpointer
        ckpt = Checkpointer(checkpoint_dir)
        if resume and ckpt.latest_step() is not None:
            state, extra = ckpt.restore(template=state)
            start_epoch = int(extra.get("epoch", -1)) + 1
            history = list(extra.get("history", []))
    n = 0
    t0 = time.perf_counter()
    for epoch in range(start_epoch, sgd_cfg.epochs):
        losses = []
        for batch in prefetch(map(lift, batch_iterator(
                train, sgd_cfg.batch_size,
                shuffle=sgd_cfg.shuffle_each_epoch,
                seed=cfg.fm.seed, epoch=epoch))):
            state, aux = step_fn(state, batch)
            losses.append(aux["loss"])
            n += batch.batch_size
        rec = {"epoch": epoch,
               "train_loss": float(jnp.mean(jnp.stack(losses)))}
        if eval_ds is not None and (epoch % eval_every == 0
                                    or epoch == sgd_cfg.epochs - 1):
            rec.update({f"eval_{k}": v
                        for k, v in eval_metrics(state["params"],
                                                 eval_ds).items()})
        history.append(rec)
        stop = bool(sgd_cfg.max_seconds
                    and time.perf_counter() - t0 >= sgd_cfg.max_seconds)
        if ckpt is not None and ((epoch + 1) % checkpoint_every == 0
                                 or epoch == sgd_cfg.epochs - 1 or stop):
            ckpt.save(epoch, state,
                      extra={"epoch": epoch, "history": history})
        if stop:        # wall-clock budget (reference `timeout`, FM.scala:30)
            break
    if ckpt is not None:
        ckpt.close()
    eps = n / max(time.perf_counter() - t0, 1e-9)
    # replicate + trim to the true feature count
    p = state["params"]
    f = cfg.fm.num_features
    host = jax.tree_util.tree_map(lambda x: np.asarray(MH.collect(x)), p)
    params = DeepFMParams(
        fm=FMParams(w0=jnp.asarray(host.fm.w0),
                    w=jnp.asarray(host.fm.w[:f]),
                    v=jnp.asarray(host.fm.v[:f])),
        mlp_w=tuple(jnp.asarray(x) for x in host.mlp_w),
        mlp_b=tuple(jnp.asarray(x) for x in host.mlp_b))
    return TrainResult(params=params, history=history,
                       examples_per_sec=eps)
