"""Bisect backward cost: composite-only grads vs pipeline-only grads."""
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
from splatformer_tpu.ops.pallas.raster import (CHUNK, composite_packed,
                                               gather_packed_entries,
                                               pack_entries_t)

def timeit(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)

def main():
    rng = np.random.default_rng(0)
    hw = 256
    scene = random_scene(rng, 100_000, sh_degree=1)
    cams = orbit_cameras(4, hw, hw)
    bg = jnp.zeros(3)
    tgt = jnp.asarray(rng.uniform(size=(4, hw, hw, 3)), jnp.float32)
    rcfg = RasterizeConfig()
    ts = rcfg.tile_size
    tiles = ((hw + ts - 1) // ts) ** 2

    def pipeline(scene, i):
        cam = Camera(c2w=cams.c2w[i], fx=cams.fx[i], fy=cams.fy[i],
                     cx=cams.cx[i], cy=cams.cy[i], width=hw, height=hw)
        act = activate_gaussians(scene)
        mask = scene.valid_mask()
        opac = jnp.where(mask, act["opacities"], 0.0)
        viewmat = opengl_c2w_to_opencv_w2c(cam.c2w)
        colors = compute_colors(scene, cam.c2w[:3, 3])
        proj = project_gaussians(act["means"], act["scales"], act["quats"],
                                 viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
                                 hw, hw, tile_size=ts,
                                 clip_thresh=rcfg.clip_thresh, mask=mask)
        bins = bin_gaussians(proj, hw, hw, ts, rcfg.max_intersects,
                             rcfg.tiles_per_gauss)
        pbins = pad_tile_ranges(bins, tiles, CHUNK, rcfg.max_intersects)
        pg = pack_entries_t(proj.xys, proj.conics, colors, opac)
        packed_t = gather_packed_entries(pg, pbins.gauss_idx)
        counts = bins.tile_start[1:] - bins.tile_start[:-1]
        return packed_t, pbins.tile_start, counts

    # (a) grads only through the composite kernel (pipeline stop-gradded,
    # packed_t is the leaf)
    @jax.jit
    def case_a(scene):
        packs = [jax.lax.stop_gradient(pipeline(scene, i)) for i in range(4)]
        def loss(pts):
            tot = 0.0
            for (pt, tstart, counts), p in zip(packs, pts):
                rgb, _ = composite_packed(p, tstart, counts, hw, hw, ts, bg,
                                          alpha_threshold=rcfg.alpha_threshold,
                                          max_alpha=rcfg.max_alpha,
                                          transmittance_eps=rcfg.transmittance_eps)
                tot = tot + jnp.mean(jnp.abs(rgb - tgt[0]))
            return tot
        return jax.grad(loss)([p for p, _, _ in packs])
    timeit("a) composite-only bwd (4 views)", case_a, scene)

    # (b) grads through pipeline but composite replaced by direct reduce
    @jax.jit
    def case_b(scene):
        def loss(fdc):
            s = scene.replace(features_dc=fdc)
            tot = 0.0
            for i in range(4):
                packed_t, _, _ = pipeline(s, i)
                tot = tot + jnp.sum(packed_t)
            return tot
        return jax.grad(loss)(scene.features_dc)
    timeit("b) pipeline-only bwd, no composite (4v)", case_b, scene)

    # (c) full fwd+bwd reference point
    @jax.jit
    def case_c(scene):
        def loss(fdc):
            rgb, _ = render_images(scene.replace(features_dc=fdc), cams, bg,
                                   rcfg)
            return jnp.mean(jnp.abs(rgb - tgt))
        return jax.grad(loss)(scene.features_dc)
    timeit("c) full fwd+bwd wrt features_dc (4v)", case_c, scene)

if __name__ == "__main__":
    main()
