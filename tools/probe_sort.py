"""Micro-probe: where does the binning sort's time go on the chip?

The round-2 roofline gap (51.8 ms measured vs 26.2 ms speed-of-light,
BENCH_r02) is dominated by the candidate sort per the XLA cost analysis;
this probe times the isolated primitives at bench scale so the optimization
(fewer candidates, fewer sorted arrays, packed keys) is chosen from
measurements, not guesses.

    python tools/probe_sort.py            # bench scale (4x256^2, 100k)
"""
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n_flat = int(sys.argv[1]) if len(sys.argv) > 1 else 4 * 100352
    s1 = 4
    n_cand = n_flat * s1 + 16384 * 12 + 2048 * 48   # bench tier layout
    budget = 4 * 2**18
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.integers(0, 1025, n_cand), jnp.int32)
    deps = jnp.asarray(rng.integers(0, 2**25, n_cand), jnp.int32)
    gidx = jnp.asarray(rng.integers(0, n_flat, n_cand), jnp.int32)

    r = {}
    f3 = jax.jit(lambda t, d, g: jax.lax.sort((t, d, g), dimension=0,
                                              num_keys=2, is_stable=True))
    r[f"sort3_{n_cand}"] = timeit(f3, tiles, deps, gidx)

    f2 = jax.jit(lambda t, g: jax.lax.sort((t, g), dimension=0,
                                           num_keys=1, is_stable=True))
    r[f"sort2_{n_cand}"] = timeit(f2, tiles, gidx)

    f1 = jax.jit(lambda t: jax.lax.sort(t, dimension=0, is_stable=True))
    r[f"sort1_{n_cand}"] = timeit(f1, tiles)

    # packed single-key + payload: (tile 11b | depth 21b) then stable by g
    packed = (tiles << 21) | (deps >> 4)
    r[f"sort_packed2_{n_cand}"] = timeit(f2, packed, gidx)

    # smaller candidate sets (tier-1 slot reduction: s1=2 drops ~800k)
    for m in (budget, n_flat * 2 + 16384 * 12 + 2048 * 48):
        r[f"sort3_{m}"] = timeit(f3, tiles[:m], deps[:m], gidx[:m])

    # by_count pre-sort (packed single array over n_flat)
    cnt = jnp.asarray(rng.integers(0, 9, n_flat), jnp.int32)
    r[f"sort1_{n_flat}"] = timeit(f1, (cnt << 19) | jnp.arange(
        n_flat, dtype=jnp.int32))

    # searchsorted per-tile ranges
    tids = jnp.sort(jnp.asarray(rng.integers(0, 1025, budget), jnp.int32))
    ss = jax.jit(lambda t: jnp.searchsorted(
        t, jnp.arange(1025 + 1, dtype=jnp.int32), side="left"))
    r["searchsorted"] = timeit(ss, tids)

    # entry gather fwd: (16, n_flat) table gathered at budget indices
    pg = jnp.asarray(rng.normal(size=(16, n_flat)), jnp.float32)
    g_idx = jnp.asarray(rng.integers(0, n_flat, budget), jnp.int32)
    gf = jax.jit(lambda p, i: p[:, i])
    r[f"gather16x{budget}"] = timeit(gf, pg, g_idx)
    gf8 = jax.jit(lambda p, i: p[:8, i])
    r[f"gather8x{budget}"] = timeit(gf8, pg, g_idx)
    pgb = pg.astype(jnp.bfloat16)
    gfb = jax.jit(lambda p, i: p[:, i])
    r[f"gather16bf16x{budget}"] = timeit(gfb, pgb, g_idx)

    for k, v in r.items():
        print(f"{k:28s} {v:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
