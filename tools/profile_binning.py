"""Micro-profile of binning internals + entry occupancy on the real TPU."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
    from splatformer_tpu.ops.binning import (TIER1_SLOTS, TIER2_K,
                                             TIER2_SLOTS, TIER3_K,
                                             bin_gaussians)
    from splatformer_tpu.ops.camera import opengl_c2w_to_opencv_w2c
    from splatformer_tpu.ops.projection import (ProjectedGaussians,
                                                project_gaussians, tile_bbox)
    from splatformer_tpu.ops.render import activate_gaussians
    from splatformer_tpu.ops.types import RasterizeConfig

    n_gauss = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    views = 4
    rng = np.random.default_rng(0)
    scene = random_scene(rng, n_gauss, sh_degree=1)
    cameras = orbit_cameras(views, hw, hw)
    rcfg = RasterizeConfig()
    ts = rcfg.tile_size
    tiles_x = (hw + ts - 1) // ts
    tiles_img = tiles_x * tiles_x

    act = activate_gaussians(scene)
    mask = scene.valid_mask()

    def per_view(c2w, fx, fy, cx, cy):
        viewmat = opengl_c2w_to_opencv_w2c(c2w)
        return project_gaussians(
            act["means"], act["scales"], act["quats"], viewmat,
            fx, fy, cx, cy, hw, hw, tile_size=ts,
            clip_thresh=rcfg.clip_thresh, mask=mask)

    proj_b = jax.jit(jax.vmap(per_view))(cameras.c2w, cameras.fx, cameras.fy,
                                         cameras.cx, cameras.cy)
    n_pad = ((n_gauss + 127) // 128) * 128

    def flat(x):
        pad = [(0, 0), (0, n_pad - n_gauss)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, pad).reshape((views * n_pad,) + x.shape[2:])

    projf = ProjectedGaussians(*(flat(x) for x in proj_b))
    tile_offset = jnp.repeat(jnp.arange(views, dtype=jnp.int32) * tiles_img,
                             n_pad)
    budget = views * rcfg.max_intersects

    # occupancy + tile-count histogram
    bins = jax.jit(lambda p: bin_gaussians(
        p, hw, hw, ts, budget, rcfg.tiles_per_gauss,
        tile_offset=tile_offset, num_images=views))(projf)
    counts = np.asarray(jnp.where(projf.num_tiles_hit > 0,
                                  projf.num_tiles_hit, 0))
    hist = np.bincount(np.minimum(counts, 20))
    print(f"entries={int(bins.num_entries)} dropped={int(bins.num_dropped)} "
          f"budget={budget}")
    print("tiles/gauss hist (0..20+):", hist.tolist())
    print(f"candidates: tier1={views * n_pad * TIER1_SLOTS} "
          f"tier2={min(TIER2_K * views, views * n_pad) * (TIER2_SLOTS - TIER1_SLOTS)} "
          f"tier3={min(TIER3_K * views, views * n_pad) * (rcfg.tiles_per_gauss - TIER2_SLOTS)}")

    # sub-stage timings
    t_full = timeit(jax.jit(lambda p: bin_gaussians(
        p, hw, hw, ts, budget, rcfg.tiles_per_gauss,
        tile_offset=tile_offset, num_images=views)), projf)

    # big sort alone at candidate scale
    n_cand = (views * n_pad * TIER1_SLOTS
              + min(TIER2_K * views, views * n_pad) * (TIER2_SLOTS - TIER1_SLOTS)
              + min(TIER3_K * views, views * n_pad) * (rcfg.tiles_per_gauss - TIER2_SLOTS))
    key1 = jnp.asarray(rng.integers(0, 1025, n_cand), jnp.int32)
    key2 = jnp.asarray(rng.integers(0, 2**30, n_cand), jnp.int32)
    pay = jnp.arange(n_cand, dtype=jnp.int32)
    t_sort2 = timeit(jax.jit(lambda a, b, c: jax.lax.sort(
        (a, b, c), dimension=0, num_keys=2, is_stable=True)),
        key1, key2, pay)
    t_sort1 = timeit(jax.jit(lambda a, c: jax.lax.sort(
        (a, c), dimension=0, num_keys=1, is_stable=False)),
        key2, pay)
    t_sort1s = timeit(jax.jit(lambda a, c: jax.lax.sort(
        (a, c), dimension=0, num_keys=1, is_stable=True)),
        key1, pay)
    # depth pre-sort at gaussian scale
    nf = views * n_pad
    dk = jnp.asarray(rng.integers(0, 2**30, nf), jnp.int32)
    t_dsort = timeit(jax.jit(lambda a: jax.lax.sort(
        (a, jnp.arange(nf, dtype=jnp.int32)), dimension=0, num_keys=1)), dk)
    # table gather (6, nf)[:, order]
    tbl = jnp.asarray(rng.uniform(size=(6, nf)), jnp.float32)
    order = jnp.asarray(rng.permutation(nf), jnp.int32)
    t_tgather = timeit(jax.jit(lambda t, o: t[:, o]), tbl, order)
    # entry gather at budget scale (16, nf)[:, gidx]
    tbl16 = jnp.asarray(rng.uniform(size=(16, nf)), jnp.float32)
    gidx = jnp.asarray(rng.integers(0, nf, budget), jnp.int32)
    t_egather = timeit(jax.jit(lambda t, o: t[:, o]), tbl16, gidx)
    tbl8 = tbl16[:8]
    t_egather8 = timeit(jax.jit(lambda t, o: t[:, o]), tbl8, gidx)

    print(f"bin full        {t_full:7.2f} ms  ({n_cand} candidates)")
    print(f"sort 2key x3    {t_sort2:7.2f} ms")
    print(f"sort 1key x2    {t_sort1:7.2f} ms (unstable)")
    print(f"sort 1key x2 st {t_sort1s:7.2f} ms (stable)")
    print(f"depth presort   {t_dsort:7.2f} ms ({nf})")
    print(f"table gather6   {t_tgather:7.2f} ms ({nf})")
    print(f"entry gather16  {t_egather:7.2f} ms ({budget})")
    print(f"entry gather8   {t_egather8:7.2f} ms ({budget})")


if __name__ == "__main__":
    main()
