"""Primitive costs for the hybrid2 sorted-backward design:
  a. sorted gather (N, 34) from (U, 34) by seg (non-decreasing, hint)
  b. example gather (N, 33) from (B, 33) by sex (random small table)
  c. 1-lane permute (N,) by order
  d. segsum v1 f32 on (N, 68)
Usage: python benchmarks/probe_hybrid2.py [batch] [budget]
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp
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
    seg = jnp.asarray(hp.seg)
    order = jnp.asarray(hp.order)
    sex = jnp.asarray((hp.order // L).astype(np.int32))

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
        print(f"{name:52s} {(time.perf_counter()-t0-rpc)/n*1e3:8.2f} ms",
              flush=True)

    small = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(2), (U, 34), jnp.float32))()

    def f_sorted_gather(t):
        r = t.at[seg].get(indices_are_sorted=True, mode="promise_in_bounds")
        return t + r[:U] * 1e-9
    timeit(f"sorted-spread {N}x34 from ({U},34)", jax.jit(f_sorted_gather),
           small)

    extab = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(3), (B, 33), jnp.float32))()

    def f_sex(t):
        r = t[sex]
        return t + r[:B] * 1e-9
    timeit(f"example gather {N}x33 from ({B},33)", jax.jit(f_sex), extab)

    vec = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(4), (N,), jnp.float32))()

    def f_perm1(v):
        return v.at[order].get(unique_indices=True,
                               mode="promise_in_bounds") * (1 - 1e-9)
    timeit(f"1-lane permute ({N},)", jax.jit(f_perm1), vec)

    pay = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(5), (N, 68), jnp.float32))()

    def f_seg(p):
        return p + SS.segment_rowsum(p, seg, U, force="pallas")[0, 0] * 1e-9
    timeit(f"segsum v1 f32 {N}x68 -> {U} (T=1024)", jax.jit(f_seg), pay)

    def f_seg512(p):
        return p + SS.segment_rowsum(p, seg, U, force="pallas",
                                     tile=512)[0, 0] * 1e-9
    timeit(f"segsum v1 f32 {N}x68 -> {U} (T=512)", jax.jit(f_seg512), pay)

if __name__ == "__main__":
    main()
