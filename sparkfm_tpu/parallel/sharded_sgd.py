"""Sharded SGD: data-parallel examples x row-sharded parameter tables.

The TPU-native replacement for the reference's "replicate the model in a
closure, collect everything to the driver" distribution model (SURVEY §2.7;
reference ALS.scala:34 pulls the entire transposed dataset to the driver and
FMModel lives whole on its heap). Here:

  * The w/V tables are row-sharded over the `model` mesh axis
    (feature f lives on shard f // rows_per_shard) — no chip holds the full
    table; a 2^24-bucket Criteo table (BASELINE config 3) spreads evenly.
  * The batch is sharded over the `data` mesh axis.
  * Forward gather of active rows = masked local lookup + `psum` over
    `model`: each shard contributes its owned rows (zeros elsewhere); the sum
    IS the gather. Comm per step: (B/D)·L·(K+1) floats over ICI.
  * Backward scatter = `all_gather` of (ids, row-grads) over `data`, then each
    model shard masks to the rows it owns and scatter-adds into its local
    table — the sparse-update analog of gradient psum. Non-owned entries
    scatter exact zeros to row 0, so no padding row is needed.
  * The loss is globally exact: per-shard weighted sums are `psum`-combined
    and normalized by the global valid-example count, so gradients match the
    single-device step bit-for-bit in exact arithmetic (tested on the 8-device
    CPU mesh in tests/test_sharding.py).

Everything is one `shard_map`-wrapped jitted step; XLA lowers psum/all_gather
to ICI collectives on a real slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparkfm_tpu.config import FMConfig, SGDConfig, Task
from sparkfm_tpu.data.batching import SparseBatch
from sparkfm_tpu.models.fm import FMParams
from sparkfm_tpu.ops import interaction as I
from sparkfm_tpu.ops import losses as L
from sparkfm_tpu.parallel import mesh as M
from sparkfm_tpu.solvers import sgd as sgd_solver
from sparkfm_tpu.solvers.sgd import SGDState


def init_sharded_state(cfg: FMConfig, mesh: Mesh,
                       key: jax.Array | None = None) -> tuple:
    """Initialize an SGDState with tables row-sharded over `model`.

    Pads num_features up to a multiple of the model-axis size (padding rows
    are never referenced by any example, so they stay at init — the same
    "empty column" semantics the ALS guard gives, reference ALS.scala:39).

    Returns (state, padded_cfg).
    """
    from sparkfm_tpu.models import fm as fm_model
    msize = mesh.shape[M.MODEL_AXIS]
    f_pad = M.pad_to_multiple(cfg.num_features, msize)
    pcfg = cfg.replace(num_features=f_pad)
    params = fm_model.init_params(pcfg, key)
    state = sgd_solver.init_state(params)
    pspecs = M.state_pspecs(ffm=cfg.num_fields > 0)
    state = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, pspecs)
    return state, pcfg


def _gather_rows(table, ids, axis_name):
    """Gather table rows for global `ids` from a row-sharded table.

    table: (F/M, ...) local shard; ids: (..., ) global int32.
    Masked local lookup + psum over the model axis = exact gather.
    """
    rows_per_shard = table.shape[0]
    m_idx = jax.lax.axis_index(axis_name)
    owner = ids // rows_per_shard
    lid = ids - owner * rows_per_shard
    mine = owner == m_idx
    lid_safe = jnp.where(mine, lid, 0)
    rows = table[lid_safe]
    mask = mine.reshape(mine.shape + (1,) * (rows.ndim - mine.ndim))
    rows = jnp.where(mask, rows, 0)
    return jax.lax.psum(rows, axis_name)


def _own_mask_and_lid(ids, rows_per_shard, axis_name):
    m_idx = jax.lax.axis_index(axis_name)
    owner = ids // rows_per_shard
    lid = ids - owner * rows_per_shard
    mine = owner == m_idx
    return mine, jnp.where(mine, lid, 0)


def _loss_sums_from_rows(w0, w_rows, v_rows, batch: SparseBatch,
                         cfg: FMConfig):
    """(sum data loss, sum reg, valid count) over the local batch shard.

    Sum (not mean) form so that psum over `data` + one global normalizer
    yields the exact global objective regardless of per-shard valid counts.
    """
    if cfg.num_fields > 0:
        s = I.ffm_scores_from_gathered(
            w0, w_rows, v_rows, batch.vals, batch.field_ids, cfg.num_fields,
            use_bias=cfg.use_bias, use_linear=cfg.use_linear,
            compute_dtype=jnp.dtype(cfg.compute_dtype))
    else:
        s = I.fm_scores_from_gathered(
            w0, w_rows, v_rows, batch.vals,
            use_bias=cfg.use_bias, use_linear=cfg.use_linear,
            compute_dtype=jnp.dtype(cfg.compute_dtype))
    if batch.mask is not None:
        wts = batch.mask.astype(jnp.float32)
    else:
        wts = jnp.ones_like(batch.y)
    if cfg.task == Task.REGRESSION:
        per_ex = jnp.square(s - batch.y)
    else:
        y_pm = jnp.where(batch.y > 0, 1.0, -1.0)
        per_ex = jax.nn.softplus(-y_pm * s)
    data_sum = jnp.sum(per_ex * wts)
    count = jnp.sum(wts)

    active = (batch.vals != 0).astype(jnp.float32) * wts[:, None]
    reg_sum = (cfg.reg0 * jnp.square(w0) * count
               + cfg.reg_w * jnp.sum(jnp.square(w_rows) * active))
    if cfg.num_fields > 0:
        reg_sum = reg_sum + cfg.reg_v * jnp.sum(
            jnp.square(v_rows) * active[..., None, None])
    else:
        reg_sum = reg_sum + cfg.reg_v * jnp.sum(
            jnp.square(v_rows) * active[..., None])
    return data_sum, reg_sum, count, s


def make_sharded_train_step(cfg: FMConfig, sgd_cfg: SGDConfig, mesh: Mesh):
    """Build the jitted shard_map train step over the (data, model) mesh.

    cfg.num_features must already be padded to a multiple of the model-axis
    size (init_sharded_state does this).
    """
    ffm = cfg.num_fields > 0
    state_specs = M.state_pspecs(ffm=ffm)
    batch_specs = M.batch_pspecs(has_mask=True, has_fields=ffm)
    aux_specs = {"loss": P()}

    def step(state: SGDState, batch: SparseBatch):
        p = state.params
        rows_per_shard = p.w.shape[0]
        ids = batch.ids                            # (B/D, L) global ids

        # ---- forward gather over the model axis (psum collective)
        w_rows = _gather_rows(p.w, ids, M.MODEL_AXIS)
        v_rows = _gather_rows(p.v, ids, M.MODEL_AXIS)

        # ---- global normalizer (exact across uneven shards)
        def objective(w0, w_rows, v_rows):
            dsum, rsum, count, _ = _loss_sums_from_rows(
                w0, w_rows, v_rows, batch, cfg)
            total = jax.lax.psum(count, M.DATA_AXIS)
            inv = 1.0 / jnp.maximum(total, 1.0)
            # local contribution to the global mean objective; summing the
            # resulting grads over shards (the all_gather below) gives the
            # exact global gradient.
            return (dsum + rsum) * inv, (dsum, total)

        grads, (dsum, total) = jax.grad(
            objective, argnums=(0, 1, 2), has_aux=True)(p.w0, w_rows, v_rows)
        g_w0, g_wrows, g_vrows = grads

        # ---- backward exchange: grads for every shard's batch rows
        ids_all = jax.lax.all_gather(ids, M.DATA_AXIS, tiled=True)
        g_wrows_all = jax.lax.all_gather(g_wrows, M.DATA_AXIS, tiled=True)
        g_vrows_all = jax.lax.all_gather(g_vrows, M.DATA_AXIS, tiled=True)

        mine, lid = _own_mask_and_lid(ids_all, rows_per_shard, M.MODEL_AXIS)
        lid_flat = lid.reshape(-1)
        gw_flat = jnp.where(mine, g_wrows_all, 0).reshape(-1)
        if ffm:
            gv_flat = jnp.where(mine[..., None, None], g_vrows_all, 0
                                ).reshape(-1, cfg.num_fields, cfg.num_factors)
        else:
            gv_flat = jnp.where(mine[..., None], g_vrows_all, 0
                                ).reshape(-1, cfg.num_factors)

        lr, opt = sgd_cfg.learning_rate, sgd_cfg.optimizer
        w, sw, s2w = sgd_solver._row_update(
            opt, lr, sgd_cfg, p.w, state.slot_w, state.slot2_w,
            lid_flat, gw_flat, state.step)
        v, sv, s2v = sgd_solver._row_update(
            opt, lr, sgd_cfg, p.v, state.slot_v, state.slot2_v,
            lid_flat, gv_flat, state.step)

        if cfg.use_bias:
            g_w0_glob = jax.lax.psum(g_w0, M.DATA_AXIS)
            w0, sw0, s2w0 = sgd_solver._dense_scalar_update(
                opt, lr, sgd_cfg, p.w0, state.slot_w0, state.slot2_w0,
                g_w0_glob, state.step)
        else:
            w0, sw0, s2w0 = p.w0, state.slot_w0, state.slot2_w0

        loss = jax.lax.psum(dsum, M.DATA_AXIS) / jnp.maximum(total, 1.0)
        new_state = SGDState(
            params=FMParams(w0=w0, w=w, v=v),
            slot_w0=sw0, slot_w=sw, slot_v=sv,
            slot2_w0=s2w0, slot2_w=s2w, slot2_v=s2v,
            step=state.step + 1)
        return new_state, {"loss": loss}

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(state_specs, batch_specs),
        out_specs=(state_specs, aux_specs),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def make_sharded_score_fn(cfg: FMConfig, mesh: Mesh):
    """Sharded batched scoring: gather rows over `model`, score over `data`."""
    ffm = cfg.num_fields > 0
    param_specs = M.param_pspecs(ffm=ffm)

    def score(params: FMParams, ids, vals, field_ids):
        w_rows = _gather_rows(params.w, ids, M.MODEL_AXIS)
        v_rows = _gather_rows(params.v, ids, M.MODEL_AXIS)
        if ffm:
            return I.ffm_scores_from_gathered(
                params.w0, w_rows, v_rows, vals, field_ids, cfg.num_fields,
                use_bias=cfg.use_bias, use_linear=cfg.use_linear,
                compute_dtype=jnp.dtype(cfg.compute_dtype))
        return I.fm_scores_from_gathered(
            params.w0, w_rows, v_rows, vals,
            use_bias=cfg.use_bias, use_linear=cfg.use_linear,
            compute_dtype=jnp.dtype(cfg.compute_dtype))

    in_specs = (param_specs, P(M.DATA_AXIS, None), P(M.DATA_AXIS, None),
                P(M.DATA_AXIS, None) if ffm else P(M.DATA_AXIS, None))
    sharded = shard_map(score, mesh=mesh, in_specs=in_specs,
                        out_specs=P(M.DATA_AXIS), check_vma=False)

    def score_fn(params, ids, vals, field_ids=None):
        if field_ids is None:
            field_ids = jnp.zeros_like(ids)
        return sharded(params, ids, vals, field_ids)

    return jax.jit(score_fn)
