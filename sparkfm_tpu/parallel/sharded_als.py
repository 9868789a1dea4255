"""Sharded ALS: examples sharded over `data`, parameters replicated.

The reference's ALS distributes residual/q precomputes over executors but
runs every coordinate update single-threaded on the driver after collecting
the whole transposed dataset (ALS.scala:34; SURVEY §3.2). Here the sweep is
one shard_map'd program:

  * each shard holds a contiguous slice of examples (CSR rows + its own
    feature-sorted CSC flat view);
  * per-feature numerators/denominators are local segment_sums combined with
    one (F,) `psum` per block step — the only collective traffic;
  * every shard then computes identical coordinate updates (params stay
    replicated), and patches its local residual/q slices exactly.

Semantics are bit-identical to the single-device blocked sweep (tested on
the 8-device CPU mesh): psum-of-partial-sums equals the global sum.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparkfm_tpu.config import ALSConfig, FMConfig, Task
from sparkfm_tpu.data.batching import SparseDataset
from sparkfm_tpu.models.fm import FMParams
from sparkfm_tpu.parallel import mesh as M
from sparkfm_tpu.solvers import als as als_solver
from sparkfm_tpu.solvers.als import ALSWorkspace


def build_sharded_workspace(ds: SparseDataset, cfg: FMConfig,
                            als_cfg: ALSConfig, mesh: Mesh
                            ) -> Tuple[ALSWorkspace, int]:
    """Pad N to the data-axis size, build per-shard CSC views, device_put
    with `data` sharding (params/feature-indexed arrays replicated)."""
    d = mesh.shape[M.DATA_AXIS]
    n, l = ds.ids.shape
    n_pad = M.pad_to_multiple(n, d)
    f = cfg.num_features

    ids = np.zeros((n_pad, l), np.int32)
    vals = np.zeros((n_pad, l), np.float32)
    y = np.zeros((n_pad,), np.float32)
    mask = np.zeros((n_pad,), np.float32)
    ids[:n] = ds.ids
    vals[:n] = ds.vals
    y[:n] = ds.y
    mask[:n] = 1.0

    if als_cfg.feature_blocks is not None:
        block_of_feat = np.asarray(als_cfg.feature_blocks, np.int32)
        num_blocks = int(block_of_feat.max()) + 1
    else:
        bs = max(1, als_cfg.block_size)
        block_of_feat = (np.arange(f) // bs).astype(np.int32)
        num_blocks = int(block_of_feat.max()) + 1

    # Per-shard flat CSC views with LOCAL row indices, feature-sorted within
    # the shard. Equal length per shard (n_pad/d * l) by construction.
    per = n_pad // d
    cf_parts, cr_parts, cv_parts = [], [], []
    den_w = np.zeros((f,), np.float32)
    for s in range(d):
        sl = slice(s * per, (s + 1) * per)
        cf = ids[sl].reshape(-1)
        cr = np.repeat(np.arange(per, dtype=np.int32), l)
        cv = vals[sl].reshape(-1)
        order = np.argsort(cf, kind="stable")
        cf_parts.append(cf[order])
        cr_parts.append(cr[order])
        cv_parts.append(cv[order])
    np.add.at(den_w, ids.reshape(-1), vals.reshape(-1) ** 2)
    # den_w holds the GLOBAL sums; shard it trivially by dividing by d so
    # the in-sweep psum reconstitutes the global value exactly.
    den_w = den_w / d

    shard = lambda x, spec: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, spec))
    ws = ALSWorkspace(
        ids=None, vals=None,               # sweep is CSC-only; no CSR copy
        y=shard(y, P(M.DATA_AXIS)),
        col_feat=shard(np.concatenate(cf_parts), P(M.DATA_AXIS)),
        col_row=shard(np.concatenate(cr_parts), P(M.DATA_AXIS)),
        col_val=shard(np.concatenate(cv_parts), P(M.DATA_AXIS)),
        block_of_feat=shard(block_of_feat, P()),
        den_w=shard(den_w, P()),
        mask=shard(mask, P(M.DATA_AXIS)))
    return ws, num_blocks


def make_sharded_sweep(cfg: FMConfig, num_blocks: int, mesh: Mesh):
    """Jitted shard_map'd sweep: (params, ws) -> params (replicated)."""
    ws_specs = ALSWorkspace(
        ids=P(M.DATA_AXIS, None), vals=P(M.DATA_AXIS, None),
        y=P(M.DATA_AXIS), col_feat=P(M.DATA_AXIS), col_row=P(M.DATA_AXIS),
        col_val=P(M.DATA_AXIS), block_of_feat=P(), den_w=P(),
        mask=P(M.DATA_AXIS))
    p_specs = FMParams(w0=P(), w=P(), v=P())

    # per-feature L2 (per-group lambdas spread to features when configured)
    reg_w_vec, reg_v_vec = cfg.reg_vectors()

    def sweep(params, ws):
        return als_solver._sweep_impl(
            params, ws, num_blocks, cfg.num_features,
            cfg.reg0, jnp.asarray(reg_w_vec), jnp.asarray(reg_v_vec),
            cfg.use_bias, cfg.use_linear,
            axis_name=M.DATA_AXIS)

    sharded = shard_map(sweep, mesh=mesh, in_specs=(p_specs, ws_specs),
                        out_specs=p_specs, check_vma=False)
    return jax.jit(sharded)


def train_als_sharded(cfg: FMConfig, als_cfg: ALSConfig,
                      train: SparseDataset, mesh: Mesh,
                      eval_ds: Optional[SparseDataset] = None,
                      eval_every: int = 1,
                      key: Optional[jax.Array] = None):
    """Sharded ALS training loop over a (data,) or (data, model) mesh."""
    from sparkfm_tpu.models import fm as fm_model
    from sparkfm_tpu.training import trainer as _trainer

    if cfg.task != Task.REGRESSION:
        raise ValueError("ALS optimizes squared loss; use SGD for "
                         "classification")
    params = fm_model.init_params(cfg, key)
    params = jax.device_put(
        params, jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params))
    ws, num_blocks = build_sharded_workspace(train, cfg, als_cfg, mesh)
    sweep = make_sharded_sweep(cfg, num_blocks, mesh)

    import time
    history = []
    n_examples = 0
    t0 = time.perf_counter()
    for epoch in range(als_cfg.epochs):
        params = sweep(params, ws)
        n_examples += train.num_examples
        rec = {"epoch": epoch}
        if eval_ds is not None and (epoch % eval_every == 0
                                    or epoch == als_cfg.epochs - 1):
            rec.update({f"eval_{k}": v for k, v in _trainer.evaluate(
                params, cfg, eval_ds).items()})
        history.append(rec)
        if als_cfg.max_seconds and (time.perf_counter() - t0
                                    >= als_cfg.max_seconds):
            # wall-clock budget (the reference's `timeout`, FM.scala:30)
            break
    jax.block_until_ready(params.v)
    eps = n_examples / max(time.perf_counter() - t0, 1e-9)
    return _trainer.TrainResult(params=params, history=history,
                                examples_per_sec=eps)


def make_sharded_mcmc_sweep(cfg: FMConfig, mcmc_cfg, num_blocks: int,
                            mesh: Mesh, groups, num_groups: int):
    """shard_map'd Gibbs sweep (solvers/mcmc.py::mcmc_sweep with
    axis_name): examples sharded over `data`, MCMCState + PRNG key
    replicated — every shard draws identical samples from the psum'd
    conditionals, so the chain equals the single-device chain (up to
    float summation order)."""
    from sparkfm_tpu.models.fm import FMParams as _FP
    from sparkfm_tpu.solvers import mcmc as mcmc_solver
    from sparkfm_tpu.solvers.mcmc import MCMCState

    ws_specs = ALSWorkspace(
        ids=P(M.DATA_AXIS, None), vals=P(M.DATA_AXIS, None),
        y=P(M.DATA_AXIS), col_feat=P(M.DATA_AXIS), col_row=P(M.DATA_AXIS),
        col_val=P(M.DATA_AXIS), block_of_feat=P(), den_w=P(),
        mask=P(M.DATA_AXIS))
    st_specs = MCMCState(params=_FP(w0=P(), w=P(), v=P()),
                         alpha=P(), lam_w=P(), mu_w=P(),
                         lam_v=P(), mu_v=P())

    def sweep(state, ws, key):
        return mcmc_solver.mcmc_sweep(
            state, ws, key, num_blocks, cfg.num_features,
            groups=groups, num_groups=num_groups,
            alpha_0=mcmc_cfg.alpha_0, beta_0=mcmc_cfg.beta_0,
            alpha_l=mcmc_cfg.alpha_lambda, beta_l=mcmc_cfg.beta_lambda,
            mu_0=mcmc_cfg.mu_0, gamma_0=mcmc_cfg.gamma_0,
            use_bias=cfg.use_bias, use_linear=cfg.use_linear,
            axis_name=M.DATA_AXIS)

    sharded = shard_map(sweep, mesh=mesh,
                        in_specs=(st_specs, ws_specs, P()),
                        out_specs=st_specs, check_vma=False)
    return jax.jit(sharded)


def train_mcmc_sharded(cfg: FMConfig, mcmc_cfg, train: SparseDataset,
                       mesh: Mesh,
                       eval_ds: Optional[SparseDataset] = None,
                       key: Optional[jax.Array] = None):
    """Sharded Gibbs training loop: same posterior-mean evaluation
    contract as solvers/mcmc.py::train_mcmc."""
    import time

    from sparkfm_tpu.models import fm as fm_model
    from sparkfm_tpu.solvers import mcmc as mcmc_solver
    from sparkfm_tpu.training import trainer as _trainer

    if cfg.task != Task.REGRESSION:
        raise ValueError("MCMC-FM optimizes squared loss; use SGD for "
                         "classification")
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    k_init, key = jax.random.split(key)
    params = fm_model.init_params(cfg, k_init)
    ws, num_blocks = build_sharded_workspace(
        train, cfg, ALSConfig(block_size=mcmc_cfg.block_size,
                              feature_blocks=mcmc_cfg.feature_blocks),
        mesh)
    num_groups = cfg.num_groups
    groups = (jnp.asarray(np.asarray(cfg.feature_groups, np.int32))
              if cfg.feature_groups is not None
              else jnp.zeros((cfg.num_features,), jnp.int32))
    state = mcmc_solver.init_mcmc_state(params, num_groups)
    rep = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
    state = jax.tree_util.tree_map(rep, state)
    sweep = make_sharded_mcmc_sweep(cfg, mcmc_cfg, num_blocks, mesh,
                                    groups, num_groups)

    score_fn = _trainer._eval_scores_fn(cfg)
    avg_scores = None
    n_avg = 0
    history = []
    n_examples = 0
    t0 = time.perf_counter()
    for epoch in range(mcmc_cfg.epochs):
        key, k_sweep = jax.random.split(key)
        state = sweep(state, ws, rep(k_sweep))
        n_examples += train.num_examples
        rec = {"epoch": epoch, "alpha": float(state.alpha),
               "lam_w": float(jnp.mean(state.lam_w))}
        if eval_ds is not None and epoch >= mcmc_cfg.burn_in:
            from sparkfm_tpu.data.batching import batch_iterator
            scores = []
            for b in batch_iterator(eval_ds, 8192, shuffle=False):
                s = score_fn(state.params, b.ids, b.vals, b.field_ids)
                scores.append(
                    np.asarray(s)[:int(np.sum(np.asarray(b.mask)))])
            s = np.concatenate(scores)
            n_avg += 1
            avg_scores = (s if avg_scores is None
                          else avg_scores + (s - avg_scores) / n_avg)
            y = eval_ds.y[:len(avg_scores)]
            rec["eval_rmse_avg"] = float(
                np.sqrt(np.mean(np.square(avg_scores - y))))
            rec["eval_rmse_sample"] = float(
                np.sqrt(np.mean(np.square(s - y))))
        history.append(rec)
        if mcmc_cfg.max_seconds and (time.perf_counter() - t0
                                     >= mcmc_cfg.max_seconds):
            # wall-clock budget (the reference's `timeout`, FM.scala:30)
            break
    jax.block_until_ready(state.params.v)
    eps = n_examples / max(time.perf_counter() - t0, 1e-9)
    result = _trainer.TrainResult(params=state.params, history=history,
                                  examples_per_sec=eps)
    result.extras = {"avg_scores": avg_scores, "mcmc_state": state}
    return result
