"""Backward-pass component timings on the real TPU: segsum backward
(sort + cumsum + boundary gather), bwd kernel, projection backward."""
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
    from splatformer_tpu.ops.binning import bin_gaussians
    from splatformer_tpu.ops.camera import opengl_c2w_to_opencv_w2c
    from splatformer_tpu.ops.pallas.raster import (PACK_W, composite_packed,
                                                   gather_entries_segsum,
                                                   pack_entries_t)
    from splatformer_tpu.ops.projection import (ProjectedGaussians,
                                                project_gaussians)
    from splatformer_tpu.ops.render import activate_gaussians, compute_colors
    from splatformer_tpu.ops.types import RasterizeConfig

    n_gauss = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    views = 4
    rng = np.random.default_rng(0)
    scene = random_scene(rng, n_gauss, sh_degree=1)
    cameras = orbit_cameras(views, hw, hw)
    background = jnp.zeros(3)
    rcfg = RasterizeConfig()
    ts = rcfg.tile_size
    tiles_img = ((hw + ts - 1) // ts) ** 2
    budget = views * rcfg.max_intersects

    act = activate_gaussians(scene)
    mask = scene.valid_mask()
    opac = jnp.where(mask, act["opacities"], 0.0)

    def per_view(c2w, fx, fy, cx, cy):
        viewmat = opengl_c2w_to_opencv_w2c(c2w)
        colors = compute_colors(scene, c2w[:3, 3])
        proj = project_gaussians(
            act["means"], act["scales"], act["quats"], viewmat,
            fx, fy, cx, cy, hw, hw, tile_size=ts,
            clip_thresh=rcfg.clip_thresh, mask=mask)
        return proj, pack_entries_t(proj.xys, proj.conics, colors, opac)

    proj_b, pg_b = jax.jit(jax.vmap(per_view))(
        cameras.c2w, cameras.fx, cameras.fy, cameras.cx, cameras.cy)
    n_pad = pg_b.shape[-1]

    def flat(x):
        pad = [(0, 0), (0, n_pad - n_gauss)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, pad).reshape((views * n_pad,) + x.shape[2:])

    projf = ProjectedGaussians(*(flat(x) for x in proj_b))
    tile_offset = jnp.repeat(jnp.arange(views, dtype=jnp.int32) * tiles_img,
                             n_pad)
    bins = jax.jit(lambda p: bin_gaussians(
        p, hw, hw, ts, budget, rcfg.tiles_per_gauss,
        tile_offset=tile_offset, num_images=views))(projf)

    pg_flat = pg_b.transpose(1, 0, 2).reshape(PACK_W, views * n_pad)
    entry_valid = bins.tile_ids < views * tiles_img
    sortkey = jnp.where(entry_valid, bins.gauss_idx, views * n_pad)

    # --- segsum gather fwd+bwd
    def gather_loss(pg_flat):
        packed = gather_entries_segsum(pg_flat, bins.gauss_idx, sortkey,
                                       bins.gauss_starts)
        return jnp.sum(packed * 0.5)

    t_segsum = timeit(jax.jit(jax.grad(gather_loss)), pg_flat)

    # segsum bwd pieces at scale
    ct = [jnp.asarray(rng.uniform(size=(budget,)), jnp.float32)
          for _ in range(9)]
    t_sort10 = timeit(jax.jit(lambda sk, *c: jax.lax.sort(
        (sk,) + c, dimension=0, num_keys=1, is_stable=False)), sortkey, *ct)
    d9 = jnp.stack(ct)
    t_cumsum = timeit(jax.jit(lambda d: jnp.cumsum(d, axis=-1)), d9)
    cs = jnp.cumsum(d9, axis=-1)
    t_bgather = timeit(jax.jit(lambda c, s: c[:, s]), cs, bins.gauss_starts)

    # --- kernel fwd vs fwd+bwd
    packed_t = jax.jit(lambda p: gather_entries_segsum(
        p, bins.gauss_idx, sortkey, bins.gauss_starts))(pg_flat)

    def kfwd(packed_t):
        rgb, alpha = composite_packed(packed_t, bins.tile_start, hw, hw, ts,
                                      background, num_images=views)
        return jnp.sum(rgb) + jnp.sum(alpha)

    t_kf = timeit(jax.jit(kfwd), packed_t)
    t_kfb = timeit(jax.jit(jax.grad(kfwd)), packed_t)

    # --- projection fwd vs fwd+bwd
    def pfwd(means, scales, quats):
        def pv(c2w, fx, fy, cx, cy):
            viewmat = opengl_c2w_to_opencv_w2c(c2w)
            p = project_gaussians(means, scales, quats, viewmat,
                                  fx, fy, cx, cy, hw, hw, tile_size=ts,
                                  clip_thresh=rcfg.clip_thresh, mask=mask)
            return jnp.sum(p.xys) + jnp.sum(p.conics) + jnp.sum(p.depths)
        return jnp.sum(jax.vmap(pv)(cameras.c2w, cameras.fx, cameras.fy,
                                    cameras.cx, cameras.cy))

    t_pf = timeit(jax.jit(pfwd), act["means"], act["scales"], act["quats"])
    t_pfb = timeit(jax.jit(jax.grad(pfwd, argnums=(0, 1, 2))),
                   act["means"], act["scales"], act["quats"])

    print(f"segsum gather grad   {t_segsum:7.2f} ms")
    print(f"  sort 10x{budget//1000}k       {t_sort10:7.2f} ms")
    print(f"  cumsum (9,{budget//1000}k)    {t_cumsum:7.2f} ms")
    print(f"  boundary gather    {t_bgather:7.2f} ms")
    print(f"kernel fwd           {t_kf:7.2f} ms")
    print(f"kernel fwd+bwd       {t_kfb:7.2f} ms")
    print(f"projection fwd       {t_pf:7.2f} ms")
    print(f"projection fwd+bwd   {t_pfb:7.2f} ms")


if __name__ == "__main__":
    main()
