"""Per-op probe of the production fused+segsum step's stages at a given
batch size. Dependency-chained honest timing (see microbench.py).

Usage: python benchmarks/probe_stages.py [batch] [budget]
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

    from sparkfm_tpu.ops import embedding as E
    from sparkfm_tpu.ops import pallas_segsum as SS

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    U = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    R, L, K = 1 << 22, 39, 32
    N = B * L
    rng = np.random.default_rng(0)
    raw = rng.zipf(1.3, size=(B, L)).astype(np.int64)
    ids = ((raw * 2654435761) % R).astype(np.int32)
    hp = E.host_dedup(ids, U, fill=R)
    print(f"B={B} N={N} uniq={int(hp.count)} budget={U}", flush=True)
    order = jnp.asarray(hp.order)
    seg = jnp.asarray(hp.seg)
    ranks = jnp.asarray(hp.ranks.reshape(-1))
    uids = jnp.asarray(hp.uids)

    tiny = jax.jit(lambda x: x + 1)
    y = tiny(jnp.float32(0)); _ = float(y)
    t0 = time.perf_counter(); y = tiny(y); _ = float(y)
    rpc = time.perf_counter() - t0

    def timeit(name, fn, x0, n=10):
        x = fn(x0); _ = float(jnp.asarray(x).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        _ = float(jnp.asarray(x).ravel()[0])
        dt = (time.perf_counter() - t0 - rpc) / n
        print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)

    table = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (R, 128), jnp.float32))()

    # 1. unique gather (U,128) from big table, sorted
    def f_gather(t):
        r = t.at[uids].get(indices_are_sorted=True, mode="promise_in_bounds")
        return t + r[0, 0] * 1e-9
    timeit(f"table gather {U}x128 sorted", jax.jit(f_gather), table)

    # 2. write-back scatter-set (U,128), sorted
    rows = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (U, 128), jnp.float32))()

    def f_write(t):
        return t.at[uids].set(rows + t[0, 0] * 1e-9,
                              indices_are_sorted=True,
                              mode="promise_in_bounds")
    timeit(f"table scatter-set {U}x128 sorted", jax.jit(f_write), table)

    # 3. spread: gather (N,33) from (U,33)
    small = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(2), (U, 33), jnp.float32))()

    def f_spread(t):
        r = t[ranks]
        return t + r[:U] * 1e-9
    timeit(f"spread gather {N}x33 from ({U},33)", jax.jit(f_spread), small)

    # 4. permute gather (N,33) by order
    pay = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(3), (N, 33), jnp.float32))()

    def f_perm(p):
        r = p.at[order].get(unique_indices=True, mode="promise_in_bounds")
        return r * (1.0 - 1e-9)
    timeit(f"permute gather {N}x33", jax.jit(f_perm), pay)

    # 5. segsum (N,66) -> U (pallas)
    pay66 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(4), (N, 66), jnp.float32))()

    def f_seg(p):
        return p + SS.segment_rowsum(p, seg, U, force="pallas")[0, 0] * 1e-9
    timeit(f"pallas segsum {N}x66 -> {U}", jax.jit(f_seg), pay66)

    # 5b. scatter-add alternative
    def f_scat(p):
        t = jnp.zeros((U, 66), jnp.float32).at[ranks].add(p)
        return p + t[0, 0] * 1e-9
    timeit(f"scatter-add {N}x66 -> ({U},66)", jax.jit(f_scat), pay66)

    # 6. fwd/bwd elementwise proxy: (B,L,K) ops
    vr = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(5), (B, L, K), jnp.float32))()

    def f_fwd(v):
        s = jnp.sum(v, axis=1)
        s2 = jnp.sum(jnp.square(v), axis=1)
        sc = 0.5 * jnp.sum(jnp.square(s) - s2, axis=-1)
        g = v * sc[:, None, None] * 1e-9
        return v + g
    timeit(f"fwd/bwd elementwise ({B},{L},{K})", jax.jit(f_fwd), vr)


if __name__ == "__main__":
    main()
