"""Micro-profile gather/scatter orientations at bench scale (dev tool)."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt*1e3:9.3f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    n = 100_096
    budget = 294_912
    views = 4

    pg_t = jnp.asarray(rng.normal(size=(16, n)), jnp.float32)      # (16, N)
    pg = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)        # (N, 16)
    gidx = jnp.asarray(rng.integers(0, n, size=(views, budget)), jnp.int32)
    d_t = jnp.asarray(rng.normal(size=(views, 16, budget)), jnp.float32)
    d_r = jnp.asarray(rng.normal(size=(views, budget, 16)), jnp.float32)

    # column gather, batched over views (the render-path form)
    timeit("col gather (16,N)[:, gidx] x4", jax.jit(
        lambda pg_t, gidx: jax.vmap(lambda gi: pg_t[:, gi],
                                    in_axes=0)(gidx)), pg_t, gidx)
    # row gather
    timeit("row gather (N,16)[gidx] x4", jax.jit(
        lambda pg, gidx: pg[gidx]), pg, gidx)
    # column scatter-add, batched
    timeit("col scatter x4 (16,B)->(16,N)", jax.jit(
        lambda d, gi: jax.vmap(
            lambda dv, giv: jnp.zeros((16, n), jnp.float32).at[:, giv].add(dv)
        )(d, gi)), d_t, gidx)
    # row scatter-add
    timeit("row scatter x4 (B,16)->(N,16)", jax.jit(
        lambda d, gi: jax.vmap(
            lambda dv, giv: jnp.zeros((n, 16), jnp.float32).at[giv].add(dv)
        )(d, gi)), d_r, gidx)
    # col scatter after in-graph transpose of row-major updates (mimics the
    # fused transpose XLA put inside fusion.20)
    timeit("col scatter x4 w/ transposed updates", jax.jit(
        lambda d, gi: jax.vmap(
            lambda dv, giv: jnp.zeros((16, n), jnp.float32)
            .at[:, giv].add(dv.T))(d, gi)), d_r, gidx)

    # correctness cross-check of col vs row scatter
    f_col = jax.jit(lambda d, gi: jnp.zeros((16, n), jnp.float32)
                    .at[:, gi].add(d))
    f_row = jax.jit(lambda d, gi: jnp.zeros((n, 16), jnp.float32)
                    .at[gi].add(d))
    a = f_col(d_t[0], gidx[0])
    b = f_row(d_r[0], gidx[0])
    print("scatter sanity (different data, just finite):",
          bool(jnp.isfinite(a).all()), bool(jnp.isfinite(b).all()))


if __name__ == "__main__":
    main()
