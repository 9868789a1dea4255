"""FFM interaction op tests.

The field-aggregated O(B·F²·K) path (ops/interaction.py::
ffm_interaction_from_rows, VERDICT r1 item 7) against the direct per-pair
O(B·L²·K) oracle and a slot-loop brute force.
"""

import jax.numpy as jnp
import numpy as np

from sparkfm_tpu.ops import interaction as I


def _brute_ffm(w0, wr, vr, vals, fids):
    """Per-pair python loop: sum_{a<b} <v_a[f_b], v_b[f_a]> x_a x_b."""
    B, L = vals.shape
    out = np.zeros((B,), np.float64)
    for b in range(B):
        for a in range(L):
            for c in range(a + 1, L):
                out[b] += (vr[b, a, fids[b, c]] @ vr[b, c, fids[b, a]]
                           ) * vals[b, a] * vals[b, c]
        out[b] += w0 + np.sum(wr[b] * vals[b])
    return out


def _rand_case(seed, B=5, L=9, F=4, K=3):
    rng = np.random.default_rng(seed)
    vals = rng.normal(size=(B, L)).astype(np.float32)
    vals[:, -2:] = 0.0                       # padding slots
    fids = rng.integers(0, F, (B, L)).astype(np.int32)
    vr = rng.normal(size=(B, L, F, K)).astype(np.float32)
    wr = rng.normal(size=(B, L)).astype(np.float32)
    return vals, fids, vr, wr


def test_field_aggregated_matches_pairwise():
    """Aggregated == pairwise, with multi-hot fields (several slots share a
    field) and padded slots."""
    vals, fids, vr, wr = _rand_case(0)
    w0 = jnp.float32(0.37)
    agg = I.ffm_scores_from_gathered(
        w0, jnp.asarray(wr), jnp.asarray(vr), jnp.asarray(vals),
        jnp.asarray(fids), 4)
    pair = I.ffm_scores_pairwise(
        w0, jnp.asarray(wr), jnp.asarray(vr), jnp.asarray(vals),
        jnp.asarray(fids), 4)
    np.testing.assert_allclose(np.asarray(agg), np.asarray(pair),
                               rtol=2e-5, atol=2e-5)


def test_field_aggregated_matches_brute_force():
    vals, fids, vr, wr = _rand_case(1)
    w0 = 0.11
    agg = I.ffm_scores_from_gathered(
        jnp.float32(w0), jnp.asarray(wr), jnp.asarray(vr), jnp.asarray(vals),
        jnp.asarray(fids), 4)
    brute = _brute_ffm(w0, wr, vr, vals, fids)
    np.testing.assert_allclose(np.asarray(agg), brute, rtol=1e-4, atol=1e-4)
