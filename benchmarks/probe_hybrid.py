"""One-off probes for the hybrid (example-forward / sorted-backward) path.

Chained-timing methodology as benchmarks/microbench.py. Cases measure the
pieces the hybrid SGD step would add or remove, at Criteo shapes.
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

    case = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    B, L, R, U, K = 16384, 39, 1 << 22, 1 << 16, 32
    N = B * L
    rng = np.random.default_rng(0)

    tiny = jax.jit(lambda x: x + 1)
    y = tiny(jnp.float32(0)); _ = float(y)
    t0 = time.perf_counter(); y = tiny(y); _ = float(y)
    rpc = time.perf_counter() - t0

    def timeit(name, fn, x0):
        x = fn(x0); _ = float(jnp.asarray(x).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        _ = float(jnp.asarray(x).ravel()[0])
        dt = (time.perf_counter() - t0 - rpc) / n
        print(f"{name:52s} {dt*1e3:8.2f} ms")

    # sorted dense ranks (zipf-ish run lengths): ~40K uniques over 639K slots
    incr = (rng.random(N) < float(40000) / N).astype(np.int64)
    incr[0] = 0
    seg = jnp.asarray(np.cumsum(incr).astype(np.int32))
    sex = jnp.asarray(rng.integers(0, B, N).astype(np.int32))

    if case == "spread_sorted":
        # v_u[seg] with monotone indices — the sorted-side spread
        w = int(sys.argv[3]) if len(sys.argv) > 3 else 33
        tbl = jnp.asarray(rng.normal(size=(U, w)).astype(np.float32))

        def f(t):
            r = t.at[seg].get(indices_are_sorted=True,
                              mode="promise_in_bounds")
            return t + r[:U] * 1e-9
        timeit(f"sorted gather 639Kx{w} from (U,{w})", jax.jit(f), tbl)
    elif case == "gath_ex_w":
        # g_agg[sex]: random gather from example space, width k+2
        w = int(sys.argv[3]) if len(sys.argv) > 3 else 34
        tbl = jnp.asarray(rng.normal(size=(B, w)).astype(np.float32))

        def f(t):
            r = t[sex]
            return t + r[:B] * 1e-9
        timeit(f"random gather 639Kx{w} from (B,{w})", jax.jit(f), tbl)
    elif case == "segsum_w":
        from sparkfm_tpu.ops import pallas_segsum as SS
        w = int(sys.argv[3]) if len(sys.argv) > 3 else 66
        g = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(0), (N, w), jnp.float32))()

        def f(gg):
            return SS.segment_rowsum(gg, seg, U,
                                     force="pallas")[0, 0] * 1e-9 + gg
        timeit(f"pallas segsum 639Kx{w} -> {U}", jax.jit(f), g)
    elif case in ("xwrite_hints", "xwrite_plain", "xwrite_unique"):
        tbl = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(0), (R + U, 128), jnp.float32))()
        uu = np.sort(rng.choice(R, U - 1000, replace=False)).astype(np.int32)
        # distinct garbage fill ids in the dummy region -> honestly unique
        fills = (R + np.arange(1000)).astype(np.int32)
        uu = jnp.asarray(np.concatenate([uu, fills]))
        rows = jnp.asarray(rng.normal(size=(U, 128)).astype(np.float32))
        sortedh = case != "xwrite_plain"
        uniq = case == "xwrite_unique"

        def f(t):
            return t.at[uu].set(rows + t[0, 0] * 1e-9,
                                indices_are_sorted=sortedh,
                                unique_indices=uniq,
                                mode="promise_in_bounds")
        timeit(f"xla set 65536x128 sorted={sortedh} uniq={uniq}",
               jax.jit(f), tbl)
    elif case == "spread_ranks":
        # the example-order spread rows_u[ranks] at width 33 (baseline)
        ranks = jnp.asarray(rng.integers(0, U, N).astype(np.int32))
        tbl = jnp.asarray(rng.normal(size=(U, 33)).astype(np.float32))

        def f(t):
            r = t[ranks]
            return t + r[:U] * 1e-9
        timeit("random gather 639Kx33 from (U,33)", jax.jit(f), tbl)
    elif case == "fwd_elem":
        # example-order forward elementwise: c=v*x, S=sum_L c, Q, lin
        v_rows = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(0), (B, L, K + 1), jnp.float32))()
        vals = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))

        def f(vr):
            c = vr[..., :K] * vals[..., None]
            S = jnp.sum(c, axis=1)
            Q = jnp.sum(jnp.square(c), axis=(1, 2))
            lin = jnp.sum(vr[..., K] * vals, axis=1)
            out = jnp.sum(jnp.square(S), axis=1) - Q + lin
            return vr + out[0] * 1e-9
        timeit("fwd elementwise (B,L,33)", jax.jit(f), v_rows)
    elif case == "bwd_elem_sorted":
        # sorted-order backward elementwise at (N, k)
        v_s = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(0), (N, K), jnp.float32))()
        x = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
        g = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(1), (N, K + 2), jnp.float32))()

        def f(vs):
            gv = (g[:, :K] * x[:, None]
                  + g[:, K:K + 1] * 2.0 * vs * jnp.square(x)[:, None])
            gw = g[:, K + 1] * x
            packed = jnp.concatenate(
                [gv, jnp.square(gv), gw[:, None],
                 jnp.square(gw)[:, None]], axis=1)
            return vs + packed[0, 0] * 1e-9
        timeit("bwd elementwise+pack (N,66)", jax.jit(f), v_s)
    else:
        raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main()
