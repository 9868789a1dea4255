"""Metric oracle tests (ops/metrics.py).

The reference's metrics carry two bugs this build deliberately fixes
(Model.scala:22 missing abs; :29 integer division) — those are asserted
here — and AUC (absent in the reference) is tested against a brute-force
pairwise oracle including ties and validity masks (VERDICT r1 item 9:
masked AUC must be exact, not approximate).
"""

import jax.numpy as jnp
import numpy as np

from sparkfm_tpu.ops import metrics as M


def _brute_auc(scores, y, mask=None):
    """Pairwise oracle: P(score_pos > score_neg) + 0.5 P(tie)."""
    if mask is not None:
        scores, y = scores[mask], y[mask]
    pos = scores[y > 0]
    neg = scores[y <= 0]
    if len(pos) == 0 or len(neg) == 0:
        return 0.5
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_auc_matches_pairwise_oracle():
    rng = np.random.default_rng(0)
    s = rng.normal(size=200).astype(np.float32)
    y = rng.integers(0, 2, 200).astype(np.float32)
    got = float(M.auc(jnp.asarray(s), jnp.asarray(y)))
    np.testing.assert_allclose(got, _brute_auc(s, y), rtol=1e-6)


def test_auc_with_ties_and_mask_exact():
    """Quantized scores (many ties, including ties straddling the mask) +
    a validity mask: must equal the oracle computed on the compacted valid
    subset exactly."""
    rng = np.random.default_rng(1)
    for trial in range(5):
        s = np.round(rng.normal(size=120) * 2) / 2        # heavy ties
        s = s.astype(np.float32)
        y = rng.integers(0, 2, 120).astype(np.float32)
        mask = rng.random(120) < 0.7
        # force cross-validity ties: some masked entries share scores with
        # valid ones by construction (quantization) — the old approximate
        # correction was wrong exactly here.
        got = float(M.auc(jnp.asarray(s), jnp.asarray(y), jnp.asarray(mask)))
        want = _brute_auc(s, y, mask)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                                   err_msg=f"trial {trial}")


def test_auc_degenerate_single_class():
    s = jnp.asarray(np.float32([0.1, 0.4, 0.3]))
    assert float(M.auc(s, jnp.asarray(np.float32([1, 1, 1])))) == 0.5
    assert float(M.auc(s, jnp.asarray(np.float32([0, 0, 0])))) == 0.5


def test_mae_is_absolute():
    p = jnp.asarray(np.float32([1.0, -1.0]))
    t = jnp.asarray(np.float32([0.0, 0.0]))
    # the reference's MAE (no abs) would be 0 here (Model.scala:22)
    assert float(M.mae(p, t)) == 1.0


def test_accuracy_float_division():
    p = jnp.asarray(np.float32([0.9, 0.1, 0.8, 0.2]))
    t = jnp.asarray(np.float32([1, 1, 1, 0]))
    # 3/4 — the reference's Long/Int division would truncate to 0
    assert abs(float(M.accuracy(p, t)) - 0.75) < 1e-6


def test_masked_metrics_ignore_padding():
    p = jnp.asarray(np.float32([1.0, 2.0, 100.0]))
    t = jnp.asarray(np.float32([1.0, 1.0, 0.0]))
    m = jnp.asarray([True, True, False])
    assert abs(float(M.rmse(p, t, m)) - np.sqrt(0.5)) < 1e-6
    assert abs(float(M.mae(p, t, m)) - 0.5) < 1e-6
