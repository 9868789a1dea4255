"""Hardware parity for the Pallas kernels (runs only when a real TPU is
attached; the main suite pins JAX_PLATFORMS=cpu, so this launches a
subprocess on the default backend).

Why this exists: interpret-mode tests are exact-by-construction and CANNOT
catch hardware lowering hazards. Round 3 found one the entire CPU suite
missed: `lax.dot_general` on f32 operands at default precision lowers to a
SINGLE bf16 MXU pass on TPU, silently rounding every operand to 8 mantissa
bits (~2^-8 relative error on the segment sums — 0.05 max observed at
Criteo shapes). The fix is precision=HIGHEST in the kernels' f32 branches;
this test is the regression gate for that class of bug.
"""

import os
import subprocess
import sys

import pytest

_CHECK = r"""
import numpy as np, jax, jax.numpy as jnp
if jax.default_backend() == "cpu":
    print("NO_ACCELERATOR"); raise SystemExit(0)
sys_path = %r
import sys; sys.path.insert(0, sys_path)
from sparkfm_tpu.ops import pallas_segsum as S
rng = np.random.default_rng(5)
n, u = 1024 * 120, 1 << 13
incr = (rng.random(n) < 0.07).astype(np.int64); incr[0] = 0
seg = np.minimum(np.cumsum(incr), u - 1).astype(np.int32)

def relerr(a, b):
    return float(np.max(np.abs(a - b) / (1 + np.abs(b))))

g = rng.normal(size=(n, 128)).astype(np.float32)
a = np.asarray(S.segment_rowsum(jnp.asarray(g), jnp.asarray(seg), u,
                                force="pallas"))
b = np.asarray(S.segment_rowsum(jnp.asarray(g), jnp.asarray(seg), u,
                                force="xla"))
assert relerr(a, b) < 1e-4, ("segment_rowsum f32", relerr(a, b))

g = rng.normal(size=(n, 33)).astype(np.float32)
b = np.asarray(S.segment_rowsum_sq(jnp.asarray(g), jnp.asarray(seg), u,
                                   force="xla"))
a = np.asarray(S.segment_rowsum_sq(jnp.asarray(g), jnp.asarray(seg), u,
                                   force="pallas", bf16x2=False))
assert relerr(a, b) < 1e-4, ("segment_rowsum_sq f32", relerr(a, b))
a = np.asarray(S.segment_rowsum_sq(jnp.asarray(g), jnp.asarray(seg), u,
                                   force="pallas", bf16x2=True))
assert relerr(a, b) < 1e-3, ("segment_rowsum_sq bf16x2", relerr(a, b))

vw = rng.normal(size=(n, 33)).astype(np.float32)
ex = rng.normal(size=(n, 34)).astype(np.float32)
x = rng.normal(size=n).astype(np.float32)
args = (jnp.asarray(vw), jnp.asarray(ex), jnp.asarray(x), jnp.asarray(seg),
        u, 2e-3, 4e-3)
b = np.asarray(S.fm_grad_segsum(*args, force="xla"))
a = np.asarray(S.fm_grad_segsum(*args, force="pallas", bf16x2=False))
assert relerr(a, b) < 1e-4, ("fm_grad_segsum f32", relerr(a, b))
a = np.asarray(S.fm_grad_segsum(*args, force="pallas", bf16x2=True))
assert relerr(a, b) < 1e-3, ("fm_grad_segsum bf16x2", relerr(a, b))

# factored variant: V_u factored out of the run sums (round 4) — per-slot
# rows must be run-consistent, so gather them from a (U, 33) unique matrix
vw_u = rng.normal(size=(u, 33)).astype(np.float32)
fargs = (jnp.asarray(vw_u), jnp.asarray(ex), jnp.asarray(x),
         jnp.asarray(seg), u, 2e-3, 4e-3)
b = np.asarray(S.fm_grad_segsum(jnp.asarray(vw_u[seg]), jnp.asarray(ex),
                                jnp.asarray(x), jnp.asarray(seg), u,
                                2e-3, 4e-3, force="xla"))
a = np.asarray(S.fm_grad_segsum_factored(*fargs, force="pallas",
                                         bf16x2=False))
assert relerr(a, b) < 1e-4, ("fm_grad_factored f32", relerr(a, b))
a = np.asarray(S.fm_grad_segsum_factored(*fargs, force="pallas",
                                         bf16x2=True))
# the factored combine (St1^2 - 2V St1t2 + V^2 St2^2) can amplify the
# bf16x2 per-sum error ~2-5x under cancellation on the SQUARED sums
# (observed 1.07e-3 worst-case); those feed the adagrad rsqrt, where
# 0.1%% is immaterial. The f32 case above stays at 1e-4.
assert relerr(a, b) < 3e-3, ("fm_grad_factored bf16x2", relerr(a, b))

# multi-stream colsums (the compact ALS sweep's reduction, round 4)
streams = [jnp.asarray(rng.normal(size=n).astype(np.float32))
           for _ in range(5)]
b = np.asarray(S.segment_colsums(streams, jnp.asarray(seg), u,
                                 force="xla"))
a = np.asarray(S.segment_colsums(streams, jnp.asarray(seg), u,
                                 force="pallas"))
assert relerr(a, b) < 1e-4, ("segment_colsums f32", relerr(a, b))
print("HW_PARITY_OK")
"""


@pytest.mark.slow
def test_segsum_kernels_match_xla_on_hardware():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CHECK % repo], env=env,
            capture_output=True, text=True, timeout=560)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU unreachable/contended (subprocess timed out); "
                    "rerun with the chip idle")
    out = proc.stdout + proc.stderr
    if "NO_ACCELERATOR" in out:
        pytest.skip("no TPU attached; parity covered by interpret tests")
    if proc.returncode != 0 and "AssertionError" not in out:
        # Device grab/tunnel failures (single-client backends reject
        # concurrent access) are environment problems, not parity bugs.
        pytest.skip(f"TPU init failed (busy tunnel?): {out[-400:]}")
    assert proc.returncode == 0, out
    assert "HW_PARITY_OK" in out, out
