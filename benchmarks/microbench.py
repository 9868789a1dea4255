"""Microbenchmarks for sparse-table access primitives on the live backend.

Timing methodology for tunneled TPU backends (axon): block_until_ready can
return before execution completes, so every measurement chains n dependent
iterations (output feeds next input) and ends with a scalar host fetch; the
one-off RPC latency of a trivial fetch is subtracted.

Usage: python benchmarks/microbench.py <case> [n]
Cases: sort, sortpay, scat_ex, gath_ex, scat_u, gath_u, gather_big, cumsum,
       pgather, pwrite, xwrite
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _device_table(jax, jnp, r, k):
    """Big tables are created ON DEVICE — a 2GB host->device transfer over
    a tunneled backend takes minutes and dwarfs everything measured."""
    key = jax.random.PRNGKey(0)
    return jax.jit(
        lambda: jax.random.normal(key, (r, k), jnp.float32))()


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    case = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    B, L, R, U, K = 16384, 39, 1 << 22, 1 << 16, 32
    N = B * L
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, R, N).astype(np.int32))
    ex = jnp.asarray(rng.integers(0, B, N).astype(np.int32))
    u = jnp.asarray(rng.integers(0, U, N).astype(np.int32))

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
        print(f"{name:44s} {dt*1e3:8.2f} ms")

    if case == "sort":
        timeit("sort 639K keys",
               jax.jit(lambda k: lax.sort((k,), num_keys=1)[0] ^ 1), keys)
    elif case == "sortpay":
        w = int(sys.argv[3]) if len(sys.argv) > 3 else 33
        pay = jnp.asarray(rng.normal(size=(N, w)).astype(np.float32))

        def f(p):
            cols = tuple(p[:, i] for i in range(w))
            out = lax.sort((keys,) + cols, num_keys=1)
            return jnp.stack(out[1:], axis=1) + 1e-7
        timeit(f"sort 639K + {w} f32 cols", jax.jit(f), pay)
    elif case == "scat_ex":
        pay = jnp.asarray(rng.normal(size=(N, 33)).astype(np.float32))

        def f(p):
            t = jnp.zeros((B, 33), jnp.float32).at[ex].add(p)
            return p + t[0, 0] * 1e-9
        timeit("scatter-add 639Kx33 -> (16384,33)", jax.jit(f), pay)
    elif case == "gath_ex":
        tbl = jnp.asarray(rng.normal(size=(B, 33)).astype(np.float32))

        def f(t):
            r = t[ex]
            return t + r[:B] * 1e-9
        timeit("gather 639Kx33 from (16384,33)", jax.jit(f), tbl)
    elif case == "scat_u":
        pay = jnp.asarray(rng.normal(size=(N, 33)).astype(np.float32))

        def f(p):
            t = jnp.zeros((U, 33), jnp.float32).at[u].add(p)
            return p + t[0, 0] * 1e-9
        timeit("scatter-add 639Kx33 -> (65536,33)", jax.jit(f), pay)
    elif case == "gath_u":
        tbl = jnp.asarray(rng.normal(size=(U, 33)).astype(np.float32))

        def f(t):
            r = t[u]
            return t + r[:U] * 1e-9
        timeit("gather 639Kx33 from (65536,33)", jax.jit(f), tbl)
    elif case == "gather_big":
        tbl = _device_table(jax, jnp, R, 128)
        uu = jnp.asarray(rng.integers(0, R, U).astype(np.int32))

        def f(t):
            r = t[uu]
            return t + r[0, 0] * 1e-9
        timeit("gather 65536x128 from (4M,128)", jax.jit(f), tbl)
    elif case in ("pgather", "pwrite", "xwrite"):
        from sparkfm_tpu.ops import pallas_rowio as PR
        tbl = _device_table(jax, jnp, R, 128)
        uu = jnp.asarray(rng.integers(0, R, U).astype(np.int32))
        if case == "pgather":
            def f(t):
                r = PR.gather_rows(t, uu, force="pallas")
                return t + r[0, 0] * 1e-9
            timeit("pallas gather 65536x128 from (4M,128)", jax.jit(f), tbl)
        else:
            rows = jnp.asarray(
                rng.normal(size=(U, 128)).astype(np.float32))
            force = "pallas" if case == "pwrite" else "xla"

            def f(t):
                return PR.scatter_set(t, uu, rows + t[0, 0] * 1e-9,
                                      force=force)
            timeit(f"{force} write 65536x128 -> (4M,128)", jax.jit(f), tbl)
    elif case == "segsum":
        from sparkfm_tpu.ops import pallas_segsum as SS
        incr = (rng.random(N) < 0.063).astype(np.int64)
        incr[0] = 0
        seg = jnp.asarray(np.cumsum(incr).astype(np.int32))
        g = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(0), (N, 128), jnp.float32))()

        def f(gg):
            return SS.segment_rowsum(gg, seg, U,
                                     force="pallas")[0, 0] * 1e-9 + gg
        timeit("pallas segsum 639Kx128 -> 65536", jax.jit(f), g)
    elif case == "cumsum":
        pay = jnp.asarray(rng.normal(size=(N, 33)).astype(np.float32))
        timeit("cumsum 639Kx33", jax.jit(
            lambda p: jnp.cumsum(p, axis=0) * (1.0 - 1e-9)), pay)
    else:
        raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main()
