"""Loss heads.

The reference only ever trains squared loss (its `Task.Classification` is
dead: stored at impl/FactorizationMachines.scala:12 and never read). Here the
task selects the head: squared loss for regression, logistic loss for
classification (labels in {-1, +1}, libFM convention; {0, 1} also accepted).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparkfm_tpu.config import Task


def squared_loss(scores: jnp.ndarray, targets: jnp.ndarray,
                 weights: jnp.ndarray | None = None) -> jnp.ndarray:
    err = scores - targets
    se = jnp.square(err)
    if weights is None:
        return jnp.mean(se)
    return jnp.sum(se * weights) / jnp.maximum(jnp.sum(weights), 1e-12)


def logistic_loss(scores: jnp.ndarray, targets: jnp.ndarray,
                  weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Binary logistic loss. Targets may be {-1,+1} or {0,1}."""
    y_pm = jnp.where(targets > 0, 1.0, -1.0)
    # log(1 + exp(-y * s)) computed stably
    z = -y_pm * scores
    ll = jax.nn.softplus(z)
    if weights is None:
        return jnp.mean(ll)
    return jnp.sum(ll * weights) / jnp.maximum(jnp.sum(weights), 1e-12)


def loss_for_task(task: Task):
    if task == Task.REGRESSION:
        return squared_loss
    return logistic_loss


def predict_for_task(task: Task, scores: jnp.ndarray) -> jnp.ndarray:
    """Map raw scores to predictions: identity (regression) or P(y=1)."""
    if task == Task.REGRESSION:
        return scores
    return jax.nn.sigmoid(scores)
