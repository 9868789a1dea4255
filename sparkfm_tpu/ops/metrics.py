"""Evaluation metrics, computed on device.

Replaces the reference's Model.scala metrics, fixing its two documented bugs
(SURVEY §2.1 quirks ledger):
  * computeMAE has no abs() — it is mean *signed* error (Model.scala:21-26).
    Here MAE is a true mean absolute error.
  * computeAccuracy divides two integers (Long/Int), truncating the result to
    0 or 1 (Model.scala:28-30). Here accuracy is float division.
Adds AUC (exact, rank-based), which the reference lacks but CTR parity
requires (BASELINE.md config 3/4).

All metrics accept an optional validity mask so padded tail batches are exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked(x: jnp.ndarray, mask: jnp.ndarray | None):
    if mask is None:
        return x, x.size
    return jnp.where(mask, x, 0.0), jnp.maximum(jnp.sum(mask), 1)


def rmse(pred: jnp.ndarray, target: jnp.ndarray,
         mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Root mean squared error (reference: Model.scala:13-19)."""
    se, n = _masked(jnp.square(pred - target), mask)
    return jnp.sqrt(jnp.sum(se) / n)


def mae(pred: jnp.ndarray, target: jnp.ndarray,
        mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """True mean absolute error (fixes Model.scala:22's missing abs)."""
    ae, n = _masked(jnp.abs(pred - target), mask)
    return jnp.sum(ae) / n


def sign_accuracy(pred: jnp.ndarray, target: jnp.ndarray,
                  mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fraction of sign agreements (fixes Model.scala:29's integer division).

    Matches the reference's semantics (sign of raw score vs sign of target),
    so targets are expected in {-1, +1}; 0/1 targets are shifted.
    """
    t_pm = jnp.where(target > 0, 1.0, -1.0)
    agree = (jnp.sign(pred) * t_pm) > 0
    a, n = _masked(agree.astype(jnp.float32), mask)
    return jnp.sum(a) / n


def accuracy(prob: jnp.ndarray, target: jnp.ndarray,
             threshold: float = 0.5,
             mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Classification accuracy on probabilities vs {0,1} (or {-1,1}) labels."""
    y01 = jnp.where(target > 0, 1.0, 0.0)
    hit = (prob >= threshold).astype(jnp.float32) == y01
    a, n = _masked(hit.astype(jnp.float32), mask)
    return jnp.sum(a) / n


def auc(scores: jnp.ndarray, target: jnp.ndarray,
        mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact ROC AUC via the rank statistic (Mann-Whitney U).

    AUC = (sum of ranks of positives - npos*(npos+1)/2) / (npos * nneg),
    with average ranks over tie groups.

    Masked entries are EXACT, not approximated (VERDICT r1 item 9): the
    sort is lexicographic on (is_invalid, score) — invalid entries trail
    regardless of score value (even a valid score of +inf cannot merge with
    the invalid tail; ADVICE r2), so every valid entry's position in the
    sorted order equals its rank *within the valid subset*, and tie groups
    are formed on (score, validity) so cross-validity ties can't merge.
    O(N log N) on device.
    """
    y = jnp.where(target > 0, 1.0, 0.0)
    if mask is not None:
        valid_b = mask
        valid = mask.astype(jnp.float32)
    else:
        valid_b = jnp.ones(scores.shape, bool)
        valid = jnp.ones_like(y)

    n = scores.shape[0]
    inval = (~valid_b).astype(jnp.int32)
    sval = jnp.where(valid_b, scores, 0.0)       # sanitize invalid scores
    order = jnp.lexsort((sval, inval))           # primary: validity
    skey = sval[order]
    sinv = inval[order]
    base_ranks = jnp.arange(1, n + 1, dtype=jnp.float32)

    # Average ranks over tie groups (grouped on (score, validity), so all
    # invalid entries form trailing groups that valid entries never join).
    new_group = jnp.concatenate(
        [jnp.ones((1,), bool),
         (skey[1:] != skey[:-1]) | (sinv[1:] != sinv[:-1])])
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    gsum = jax.ops.segment_sum(base_ranks, gid, num_segments=n)
    gcnt = jax.ops.segment_sum(jnp.ones_like(base_ranks), gid, num_segments=n)
    avg_rank_sorted = gsum[gid] / jnp.maximum(gcnt[gid], 1.0)
    ranks = jnp.zeros((n,), jnp.float32).at[order].set(avg_rank_sorted)

    npos = jnp.sum(y * valid)
    nneg = jnp.sum((1.0 - y) * valid)
    rank_sum_pos = jnp.sum(ranks * y * valid)
    u = rank_sum_pos - npos * (npos + 1.0) / 2.0
    return jnp.where(npos * nneg > 0, u / jnp.maximum(npos * nneg, 1.0), 0.5)


def logloss(prob: jnp.ndarray, target: jnp.ndarray,
            mask: jnp.ndarray | None = None,
            eps: float = 1e-7) -> jnp.ndarray:
    """Mean binary cross-entropy on probabilities vs {0,1}/{-1,1} labels."""
    y01 = jnp.where(target > 0, 1.0, 0.0)
    p = jnp.clip(prob, eps, 1.0 - eps)
    ll = -(y01 * jnp.log(p) + (1.0 - y01) * jnp.log1p(-p))
    v, n = _masked(ll, mask)
    return jnp.sum(v) / n
