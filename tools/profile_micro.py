"""Micro-profile: pad_tile_ranges internals + grad scatter-add alternatives."""
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
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms")
    return out

def main():
    rng = np.random.default_rng(0)
    n_gauss = 100_000
    budget = 294_912
    I = 2**18
    n_tiles = 256

    # --- scatter-add vs sort+cumsum for per-gaussian grad reduction
    gidx = jnp.asarray(rng.integers(0, n_gauss, size=budget), jnp.int32)
    d_packed = jnp.asarray(rng.normal(size=(16, budget)), jnp.float32)

    @jax.jit
    def scatter_add(d, gi):
        out = jnp.zeros((16, n_gauss), jnp.float32)
        return out.at[:, gi].add(d)
    timeit("scatter-add (16 x 295k -> 100k)", scatter_add, d_packed, gidx)

    @jax.jit
    def sorted_cumsum(d, gi):
        order0 = jnp.arange(budget, dtype=jnp.int32)
        gs, order = jax.lax.sort_key_val(gi, order0)
        ds = d[:, order]
        c = jnp.cumsum(ds.astype(jnp.float32), axis=1)
        c = jnp.concatenate([jnp.zeros((16, 1), jnp.float32), c], axis=1)
        ends = jnp.searchsorted(gs, jnp.arange(n_gauss + 1, dtype=jnp.int32))
        return c[:, ends[1:]] - c[:, ends[:-1]]
    timeit("sort+cumsum segsum (16 x 295k -> 100k)", sorted_cumsum,
           d_packed, gidx)

    r1 = scatter_add(d_packed, gidx)
    r2 = sorted_cumsum(d_packed, gidx)
    print("allclose:", bool(jnp.allclose(r1, r2, atol=1e-2, rtol=1e-3)),
          float(jnp.abs(r1 - r2).max()))

    # --- pad_tile_ranges internals
    from splatformer_tpu.ops.binning import TileBins, pad_tile_ranges
    counts = rng.multinomial(I - 1000, np.ones(n_tiles) / n_tiles)
    tile_start = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    tile_ids = np.repeat(np.arange(n_tiles), counts)
    tile_ids = np.concatenate([tile_ids, np.full(I - len(tile_ids), n_tiles)])
    bins = TileBins(
        gauss_idx=jnp.asarray(rng.integers(0, n_gauss, I), jnp.int32),
        tile_ids=jnp.asarray(tile_ids, jnp.int32),
        tile_start=jnp.asarray(tile_start, jnp.int32),
        num_entries=jnp.int32(I - 1000), num_dropped=jnp.int32(0),
        gauss_starts=jnp.zeros((n_gauss + 1,), jnp.int32))
    f = jax.jit(lambda b: pad_tile_ranges(b, n_tiles, 128, I))
    timeit("pad_tile_ranges total", f, bins)

    # pieces
    @jax.jit
    def piece_starts(b):
        c = b.tile_start[1:] - b.tile_start[:-1]
        cp = ((c + 127) // 128) * 128
        return jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(cp)]).astype(jnp.int32)
    new_start = timeit("  piece: padded starts", piece_starts, bins)

    nb = budget
    @jax.jit
    def piece_tileof(ns):
        n_chunks = nb // 128
        chunk_pos = jnp.arange(n_chunks, dtype=jnp.int32) * 128
        t = jnp.searchsorted(ns, chunk_pos, side="right") - 1
        t = jnp.clip(t, 0, n_tiles - 1).astype(jnp.int32)
        return jnp.repeat(t, 128)
    tile_of = timeit("  piece: tile_of (searchsorted+repeat)",
                     piece_tileof, new_start)

    @jax.jit
    def piece_gather(b, ns, tof):
        pos = jnp.arange(nb, dtype=jnp.int32)
        c = b.tile_start[1:] - b.tile_start[:-1]
        local = pos - ns[tof]
        valid = (local >= 0) & (local < c[tof]) & (pos < ns[n_tiles])
        src = jnp.clip(b.tile_start[tof] + local, 0, I - 1)
        return jnp.where(valid, b.gauss_idx[src], 0), valid
    timeit("  piece: final gathers", piece_gather, bins, new_start, tile_of)

if __name__ == "__main__":
    main()
