"""Breakdown timing of the rasterizer stages on the real chip (dev tool)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
from splatformer_tpu.ops.render import (activate_gaussians, compute_colors,
                                        render_images)
from splatformer_tpu.ops.binning import bin_gaussians, pad_tile_ranges
from splatformer_tpu.ops.camera import opengl_c2w_to_opencv_w2c
from splatformer_tpu.ops.projection import project_gaussians
from splatformer_tpu.ops.types import Camera, RasterizeConfig


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return out


def main():
    n_gauss = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    views = 4
    rng = np.random.default_rng(0)
    scene = random_scene(rng, n_gauss, sh_degree=1)
    cameras = orbit_cameras(views, hw, hw)
    background = jnp.zeros(3)
    target = jnp.asarray(rng.uniform(size=(views, hw, hw, 3)), jnp.float32)
    rcfg = RasterizeConfig()
    print("use_pallas:", rcfg.resolved_use_pallas(), "backend:",
          jax.default_backend())

    # full fwd
    f_fwd = jax.jit(lambda s: render_images(s, cameras, background, rcfg))
    timeit("render fwd (4 views)", f_fwd, scene)

    # full fwd+bwd
    attrs = ("means", "scales", "quats", "opacities", "features_dc",
             "features_rest")
    params = {k: getattr(scene, k) for k in attrs}

    @jax.jit
    def fwd_bwd(p):
        def loss(p):
            rgb, _ = render_images(scene.replace(**p), cameras, background,
                                   rcfg)
            return jnp.mean(jnp.abs(rgb - target))
        return jax.value_and_grad(loss)(p)
    timeit("render fwd+bwd (4 views)", fwd_bwd, params)

    # stage: projection only (1 view)
    cam0 = Camera(c2w=cameras.c2w[0], fx=cameras.fx[0], fy=cameras.fy[0],
                  cx=cameras.cx[0], cy=cameras.cy[0],
                  width=cameras.width, height=cameras.height)

    @jax.jit
    def proj_only(s):
        act = activate_gaussians(s)
        viewmat = opengl_c2w_to_opencv_w2c(cam0.c2w)
        return project_gaussians(
            act["means"], act["scales"], act["quats"], viewmat,
            cam0.fx, cam0.fy, cam0.cx, cam0.cy, hw, hw,
            tile_size=rcfg.tile_size, clip_thresh=rcfg.clip_thresh,
            mask=s.valid_mask())
    proj = timeit("project (1 view)", proj_only, scene)

    @jax.jit
    def bin_only(proj):
        return bin_gaussians(proj, hw, hw, rcfg.tile_size,
                             rcfg.max_intersects, rcfg.tiles_per_gauss)
    bins = timeit("bin (1 view)", bin_only, proj)

    ts = rcfg.tile_size
    tiles = ((hw + ts - 1) // ts) ** 2

    from splatformer_tpu.ops.pallas.raster import (CHUNK, composite_packed,
                                                   gather_packed_entries,
                                                   pack_entries_t)

    @jax.jit
    def pad_only(bins):
        return pad_tile_ranges(bins, tiles, CHUNK, rcfg.max_intersects)
    pbins = timeit("pad_tile_ranges (1 view)", pad_only, bins)

    act = activate_gaussians(scene)
    colors = compute_colors(scene, cam0.c2w[:3, 3])
    opac = jnp.where(scene.valid_mask(), act["opacities"], 0.0)

    @jax.jit
    def pack_gather(proj, pbins):
        pg = pack_entries_t(proj.xys, proj.conics, colors, opac)
        return gather_packed_entries(pg, pbins.gauss_idx)
    packed_t = timeit("pack+gather (1 view)", pack_gather, proj, pbins)

    counts = bins.tile_start[1:] - bins.tile_start[:-1]

    @jax.jit
    def comp_fwd(packed_t, tile_start, counts):
        return composite_packed(packed_t, tile_start, counts, hw, hw, ts,
                                background,
                                alpha_threshold=rcfg.alpha_threshold,
                                max_alpha=rcfg.max_alpha,
                                transmittance_eps=rcfg.transmittance_eps)
    timeit("composite fwd (1 view)", comp_fwd, packed_t, pbins.tile_start,
           counts)

    @jax.jit
    def comp_bwd(packed_t, tile_start, counts):
        def loss(pt):
            rgb, alpha = composite_packed(
                pt, tile_start, counts, hw, hw, ts, background,
                alpha_threshold=rcfg.alpha_threshold,
                max_alpha=rcfg.max_alpha,
                transmittance_eps=rcfg.transmittance_eps)
            return jnp.sum(rgb) + jnp.sum(alpha)
        return jax.grad(loss)(packed_t)
    timeit("composite fwd+bwd (1 view)", comp_bwd, packed_t,
           pbins.tile_start, counts)


if __name__ == "__main__":
    main()
