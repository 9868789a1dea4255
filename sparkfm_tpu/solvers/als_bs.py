"""Block-structure (BS) relational ALS: coordinate descent WITHOUT
materializing the joined design matrix.

The reference sketches exactly this in its commented-out relational ALS
(fm/lib/ALS.scala:77-136) with per-relation-row caches (wnum, q, wc,
wc_sqr — Relation.scala:23-31), following Rendle's *Scaling FMs to
Relational Data*: when many examples share the same relation row, the
per-feature sums an ALS update needs can be aggregated PER KEY first
(O(N) work over examples) and then reduced over the relation's own
nonzeros (O(nnz_r) work), instead of touching every (example, feature)
pair of the expanded matrix (O(N * L_r)).

The algebra (x_kj is relation row k's value for local feature j; every
example i with keys[i]=k shares it):

  linear  h_ij = x_kj:
      num_j = sum_k x_kj * E_k,           E_k  = sum_{i in k} e_i
      den_j = sum_k x_kj^2 * n_k          (constant per relation)
  factor  h_ij = x_kj (q_i - x_kj v_j):
      num_j = sum_k x_kj (EQ_k - x_kj v_j E_k),   EQ_k = sum e_i q_i
      den_j = sum_k x_kj^2 (Q2_k - 2 x_kj v_j Q1_k + n_k x_kj^2 v_j^2)
  patches after a block update (exact, not linearized):
      dq_i  = dmain_i + sum_r dqk_r[key_i],  dqk_k = sum_j dv_j x_kj
      de    = 1/2 (q_new^2 - q^2) - 1/2 (dsq_main + sum_r dsqk_r[key]),
              dsqk_k = sum_j (v_new_j^2 - v_j^2) x_kj^2

Blocks are assigned over the GLOBAL feature space with the same
arange(F)//block_size partition as solvers/als.py::build_workspace, and a
block may span main and relation features — both are updated Jacobi
within the block from the same (e, q) state. The sweep is therefore
MATHEMATICALLY IDENTICAL to running solvers/als.py on the materialized
matrix (same schedule, same guarded theta rule, same exact quadratic
patches); tests/test_als_bs.py asserts allclose parity. Only the
memory/compute shape changes: nothing of size N x (Lm + sum L_r) is ever
built, on host or device.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sparkfm_tpu.config import ALSConfig, FMConfig, Task
from sparkfm_tpu.data.relational import RelationalDataset
from sparkfm_tpu.models.fm import FMParams
from sparkfm_tpu.solvers.als import _guarded_theta


def _prep(rds: RelationalDataset, cfg: FMConfig, als_cfg: ALSConfig):
    """Host-side prep. Returns (arrays dict, static dict)."""
    n, lm = rds.main_ids.shape
    f = cfg.num_features
    if als_cfg.feature_blocks is not None:
        block_of_feat = np.asarray(als_cfg.feature_blocks, np.int32)
        assert block_of_feat.shape == (f,)
    else:
        # Slot-aligned blocks, derived from the BS structure itself: two
        # features occupying the same CSR slot position never co-occur in
        # an example (each example has exactly one feature per slot), so
        # within-block Jacobi IS Gauss-Seidel — the field-aligned case of
        # solvers/als.py's docstring, with zero staleness and only
        # Lm + sum_r L_r blocks per sweep. Contiguous arange//block_size
        # partitions (the materialized default) put co-occurring
        # demographic columns in one block and can diverge on dense
        # relational data; slots can't. (Multi-hot LIST columns, whose
        # features may move across slots row-to-row, degrade to the same
        # mild within-block Jacobi the materialized default has.)
        block_of_feat = np.zeros((f,), np.int32)
        nb = 0
        for l in range(lm):
            feats = np.unique(rds.main_ids[:, l][rds.main_vals[:, l] != 0])
            block_of_feat[feats] = nb
            nb += 1
        for t in rds.tables:
            tid, tval = np.asarray(t.ids), np.asarray(t.vals)
            for l in range(tid.shape[1]):
                feats = np.unique(tid[:, l][tval[:, l] != 0]) + t.offset
                block_of_feat[feats] = nb
                nb += 1
        # features never seen keep block 0 (their den is 0 -> no update)
    num_blocks = int(block_of_feat.max()) + 1

    arrs = {
        "m_feat": jnp.asarray(rds.main_ids.reshape(-1).astype(np.int32)),
        "m_row": jnp.asarray(np.repeat(np.arange(n, dtype=np.int32), lm)),
        "m_val": jnp.asarray(rds.main_vals.reshape(-1).astype(np.float32)),
        "y": jnp.asarray(rds.y.astype(np.float32)),
        "keys": jnp.asarray(rds.keys.astype(np.int32)),      # (N, R)
        "block_of_feat": jnp.asarray(block_of_feat),
        "rel": [],
    }
    den_w = np.zeros((f,), np.float32)
    np.add.at(den_w, rds.main_ids.reshape(-1),
              rds.main_vals.reshape(-1) ** 2)

    statics = {"num_blocks": num_blocks, "rels": []}
    for r, t in enumerate(rds.tables):
        tid = np.asarray(t.ids)          # (K+1, Lr) local ids
        tval = np.asarray(t.vals)
        krows, lr = tid.shape
        n_k = np.bincount(rds.keys[:, r], minlength=krows
                          ).astype(np.float32)               # (K+1,)
        rcol_feat = tid.reshape(-1).astype(np.int32)         # local j
        rcol_key = np.repeat(np.arange(krows, dtype=np.int32), lr)
        rcol_val = tval.reshape(-1).astype(np.float32)
        # den for linear: sum_k x_kj^2 n_k, scattered to global ids
        np.add.at(den_w, rcol_feat + t.offset,
                  rcol_val ** 2 * n_k[rcol_key])
        arrs["rel"].append({
            "feat": jnp.asarray(rcol_feat),
            "key": jnp.asarray(rcol_key),
            "val": jnp.asarray(rcol_val),
            "n_k": jnp.asarray(n_k),
        })
        statics["rels"].append({"offset": int(t.offset),
                                "num_rows": krows,
                                "num_local": int(tid.max()) + 1
                                if tid.size else 1})
    arrs["den_w"] = jnp.asarray(den_w)
    return arrs, statics


def make_bs_sweep(cfg: FMConfig, statics: dict):
    """Build the jitted one-sweep function over BS arrays."""
    F = cfg.num_features
    num_blocks = statics["num_blocks"]
    rels = statics["rels"]

    def seg(x, ids, n):
        return jax.ops.segment_sum(x, ids, num_segments=n)

    def sweep(params: FMParams, arrs: dict, reg_w, reg_v):
        y = arrs["y"]
        n = y.shape[0]
        keys = arrs["keys"]
        m_feat, m_row, m_val = (arrs["m_feat"], arrs["m_row"],
                                arrs["m_val"])
        block_of_feat = arrs["block_of_feat"]
        den_w = arrs["den_w"]
        K = params.v.shape[-1]

        # ---- per-example linear term + per-factor q/sq WITHOUT the
        # joined matrix: main part via the main CSC, relation part via
        # per-key partials gathered through keys[:, r].
        def lin_of(w):
            wx = seg(w[m_feat] * m_val, m_row, n)
            for r, meta in enumerate(rels):
                rl = arrs["rel"][r]
                wrow = seg(w[rl["feat"] + meta["offset"]] * rl["val"],
                           rl["key"], meta["num_rows"])
                wx = wx + wrow[keys[:, r]]
            return wx

        def q_sq_of(vf):
            q = seg(vf[m_feat] * m_val, m_row, n)
            sq = seg(jnp.square(vf[m_feat] * m_val), m_row, n)
            for r, meta in enumerate(rels):
                rl = arrs["rel"][r]
                vx = vf[rl["feat"] + meta["offset"]] * rl["val"]
                qrow = seg(vx, rl["key"], meta["num_rows"])
                sqrow = seg(jnp.square(vx), rl["key"], meta["num_rows"])
                q = q + qrow[keys[:, r]]
                sq = sq + sqrow[keys[:, r]]
            return q, sq

        # ---- residuals e = yhat - y
        score = jnp.zeros((n,), jnp.float32)
        if cfg.use_bias:
            score = score + params.w0
        if cfg.use_linear:
            score = score + lin_of(params.w)
        for f_ in range(K):
            qf, sqf = q_sq_of(params.v[:, f_])
            score = score + 0.5 * (jnp.square(qf) - sqf)
        e = score - y

        # ---- bias
        if cfg.use_bias:
            w0_new = _guarded_theta(params.w0, jnp.sum(e),
                                    jnp.float32(n), cfg.reg0)
            e = e + (w0_new - params.w0)
        else:
            w0_new = params.w0

        # ---- linear weights, blocked over the GLOBAL partition
        def w_block(b, carry):
            w, e = carry
            # num over main features (example space)
            num = seg(e[m_row] * m_val, m_feat, F)
            # num over relation features (key space): E_k = sum e_i
            for r, meta in enumerate(rels):
                rl = arrs["rel"][r]
                E_k = seg(e, keys[:, r], meta["num_rows"])
                num_r = seg(rl["val"] * E_k[rl["key"]], rl["feat"],
                            meta["num_local"])
                num = num.at[meta["offset"]:meta["offset"]
                             + meta["num_local"]].add(num_r)
            theta_new = _guarded_theta(w, num, den_w, reg_w)
            delta = jnp.where(block_of_feat == b, theta_new - w, 0.0)
            w = w + delta
            # exact residual patch
            de = seg(delta[m_feat] * m_val, m_row, n)
            for r, meta in enumerate(rels):
                rl = arrs["rel"][r]
                dloc = delta[meta["offset"]:meta["offset"]
                             + meta["num_local"]]
                dwk = seg(dloc[rl["feat"]] * rl["val"], rl["key"],
                          meta["num_rows"])
                de = de + dwk[keys[:, r]]
            return (w, e + de)

        if cfg.use_linear:
            w_new, e = jax.lax.fori_loop(0, num_blocks, w_block,
                                         (params.w, e))
        else:
            w_new = params.w

        # ---- factors
        def factor_body(f_, carry):
            v, e = carry
            vf = v[:, f_]
            q, _ = q_sq_of(vf)

            def v_block(b, carry2):
                vf, q, e = carry2
                # main features: h = x (q - x v)
                h = m_val * (q[m_row] - m_val * vf[m_feat])
                num = seg(e[m_row] * h, m_feat, F)
                den = seg(h * h, m_feat, F)
                for r, meta in enumerate(rels):
                    rl = arrs["rel"][r]
                    kr, nl, off = (meta["num_rows"], meta["num_local"],
                                   meta["offset"])
                    E_k = seg(e, keys[:, r], kr)
                    EQ_k = seg(e * q, keys[:, r], kr)
                    Q1_k = seg(q, keys[:, r], kr)
                    Q2_k = seg(jnp.square(q), keys[:, r], kr)
                    x = rl["val"]
                    vj = vf[rl["feat"] + off]
                    num_r = seg(x * (EQ_k[rl["key"]]
                                     - x * vj * E_k[rl["key"]]),
                                rl["feat"], nl)
                    den_r = seg(jnp.square(x)
                                * (Q2_k[rl["key"]]
                                   - 2.0 * x * vj * Q1_k[rl["key"]]
                                   + rl["n_k"][rl["key"]]
                                   * jnp.square(x * vj)),
                                rl["feat"], nl)
                    num = num.at[off:off + nl].add(num_r)
                    den = den.at[off:off + nl].add(den_r)
                theta_new = _guarded_theta(vf, num, den, reg_v)
                in_block = block_of_feat == b
                delta = jnp.where(in_block, theta_new - vf, 0.0)
                vf_new = vf + delta
                # exact q patch
                dq = seg(delta[m_feat] * m_val, m_row, n)
                dsq_feat = jnp.where(in_block,
                                     jnp.square(vf_new) - jnp.square(vf),
                                     0.0)
                de_sq = seg(dsq_feat[m_feat] * jnp.square(m_val), m_row, n)
                for r, meta in enumerate(rels):
                    rl = arrs["rel"][r]
                    kr, nl, off = (meta["num_rows"], meta["num_local"],
                                   meta["offset"])
                    dloc = delta[off:off + nl]
                    dqk = seg(dloc[rl["feat"]] * rl["val"], rl["key"], kr)
                    dq = dq + dqk[keys[:, r]]
                    dsql = dsq_feat[off:off + nl]
                    dsqk = seg(dsql[rl["feat"]] * jnp.square(rl["val"]),
                               rl["key"], kr)
                    de_sq = de_sq + dsqk[keys[:, r]]
                q_new = q + dq
                e_new = (e + 0.5 * (jnp.square(q_new) - jnp.square(q))
                         - 0.5 * de_sq)
                return (vf_new, q_new, e_new)

            vf, q, e = jax.lax.fori_loop(0, num_blocks, v_block,
                                         (vf, q, e))
            return (v.at[:, f_].set(vf), e)

        v_new, e = jax.lax.fori_loop(0, K, factor_body, (params.v, e))
        return FMParams(w0=w0_new, w=w_new, v=v_new)

    return jax.jit(sweep)


def train_als_relational(cfg: FMConfig, als_cfg: ALSConfig,
                         train: RelationalDataset,
                         eval_ds=None, eval_every: int = 1,
                         key: Optional[jax.Array] = None,
                         params: Optional[FMParams] = None):
    """ALS on block-structure data — the reference's unreachable
    ALS.scala:77-136 path, realized. Accepts the same RelationalDataset
    the SGD path trains on; never calls materialize()."""
    import time

    from sparkfm_tpu.models import fm as fm_model
    from sparkfm_tpu.training import trainer as _trainer

    if Task(cfg.task) != Task.REGRESSION:
        raise ValueError("ALS optimizes squared loss; use SGD for "
                         "classification")
    if cfg.num_fields > 0:
        raise ValueError("ALS supports plain FM (not FFM)")
    if params is None:
        params = fm_model.init_params(cfg, key)
    arrs, statics = _prep(train, cfg, als_cfg)
    sweep = make_bs_sweep(cfg, statics)
    reg_w_vec, reg_v_vec = (jnp.asarray(x) for x in cfg.reg_vectors())

    history = []
    n_examples = 0
    t0 = time.perf_counter()
    for epoch in range(als_cfg.epochs):
        params = sweep(params, arrs, reg_w_vec, reg_v_vec)
        n_examples += train.num_examples
        rec = {"epoch": epoch}
        if eval_ds is not None and (epoch % eval_every == 0
                                    or epoch == als_cfg.epochs - 1):
            ev = eval_ds.materialize() if hasattr(eval_ds, "materialize") \
                else eval_ds
            rec.update({f"eval_{k}": v for k, v in _trainer.evaluate(
                params, cfg, ev).items()})
        history.append(rec)
        if als_cfg.max_seconds and (time.perf_counter() - t0
                                    >= als_cfg.max_seconds):
            # wall-clock budget (the reference's `timeout`, FM.scala:30)
            break
    jax.block_until_ready(params.v)
    eps = n_examples / max(time.perf_counter() - t0, 1e-9)
    return _trainer.TrainResult(params=params, history=history,
                                examples_per_sec=eps)
