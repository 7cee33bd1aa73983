"""Stage-level timing of the bench fwd+bwd pipeline on the real TPU.

Times each stage of _render_images_pallas (projection+pack, binning,
entry gather, fwd kernel, full fwd, full fwd+bwd) as separate jits so the
per-stage deltas bound where the remaining wall-clock goes. Dev tool — the
driver headline stays bench.py.
"""
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
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
    from splatformer_tpu.ops.binning import bin_gaussians
    from splatformer_tpu.ops.projection import ProjectedGaussians
    from splatformer_tpu.ops.render import render_images, _render_images_pallas
    from splatformer_tpu.ops.types import RasterizeConfig
    from splatformer_tpu.ops.pallas.raster import (
        PACK_W, composite_packed, gather_entries_segsum, pack_entries_t)
    from splatformer_tpu.ops.camera import (normalize_quats,
                                            opengl_c2w_to_opencv_w2c)
    from splatformer_tpu.ops.render import activate_gaussians, compute_colors
    from splatformer_tpu.ops.projection import project_gaussians

    n_gauss = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    views = 4
    rng = np.random.default_rng(0)
    scene = random_scene(rng, n_gauss, sh_degree=1)
    cameras = orbit_cameras(views, hw, hw)
    background = jnp.zeros(3)
    target = jnp.asarray(rng.uniform(size=(views, hw, hw, 3)), jnp.float32)
    rcfg = RasterizeConfig()
    ts = rcfg.tile_size
    tiles_img = ((hw + ts - 1) // ts) ** 2

    # --- stage 1: per-view projection + pack
    def stage_proj(scene):
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

        return jax.vmap(per_view)(cameras.c2w, cameras.fx, cameras.fy,
                                  cameras.cx, cameras.cy)

    stage_proj_j = jax.jit(stage_proj)
    proj_b, pg_b = stage_proj_j(scene)
    jax.block_until_ready(pg_b)
    t_proj = timeit(stage_proj_j, scene)

    n = scene.num_points
    n_pad = pg_b.shape[-1]

    def flatten(proj_b):
        def flat(x):
            pad = [(0, 0), (0, n_pad - n)] + [(0, 0)] * (x.ndim - 2)
            return jnp.pad(x, pad).reshape((views * n_pad,) + x.shape[2:])
        return ProjectedGaussians(*(flat(x) for x in proj_b))

    tile_offset = jnp.repeat(jnp.arange(views, dtype=jnp.int32) * tiles_img,
                             n_pad)
    total_budget = views * rcfg.max_intersects

    # --- stage 2: binning
    def stage_bin(proj_b):
        projf = flatten(proj_b)
        return bin_gaussians(projf, hw, hw, ts, total_budget,
                             rcfg.tiles_per_gauss, tile_offset=tile_offset,
                             num_images=views)

    stage_bin_j = jax.jit(stage_bin)
    bins = stage_bin_j(proj_b)
    jax.block_until_ready(bins)
    t_bin = timeit(stage_bin_j, proj_b)

    # --- stage 3: entry gather
    def stage_gather(pg_b, bins):
        pg_flat = pg_b.transpose(1, 0, 2).reshape(PACK_W, views * n_pad)
        entry_valid = bins.tile_ids < views * tiles_img
        sortkey = jnp.where(entry_valid, bins.gauss_idx, views * n_pad)
        return gather_entries_segsum(pg_flat, bins.gauss_idx, sortkey,
                                     bins.gauss_starts)

    stage_gather_j = jax.jit(stage_gather)
    packed_t = stage_gather_j(pg_b, bins)
    jax.block_until_ready(packed_t)
    t_gather = timeit(stage_gather_j, pg_b, bins)

    # --- stage 4: fwd kernel only
    def stage_kernel(packed_t, tile_start):
        return composite_packed(packed_t, tile_start, hw, hw, ts, background,
                                num_images=views)

    stage_kernel_j = jax.jit(stage_kernel)
    out = stage_kernel_j(packed_t, bins.tile_start)
    jax.block_until_ready(out)
    t_kernel = timeit(stage_kernel_j, packed_t, bins.tile_start)

    # --- full forward
    fwd_j = jax.jit(lambda s: _render_images_pallas(s, cameras, background,
                                                    rcfg))
    out = fwd_j(scene)
    jax.block_until_ready(out)
    t_fwd = timeit(fwd_j, scene)

    # --- full fwd+bwd
    attrs = ("means", "scales", "quats", "opacities", "features_dc",
             "features_rest")
    params = {k: getattr(scene, k) for k in attrs}

    @jax.jit
    def fwd_bwd(params):
        def loss(p):
            rgb, _ = render_images(scene.replace(**p), cameras, background,
                                   rcfg)
            return jnp.mean(jnp.abs(rgb - target))
        return jax.value_and_grad(loss)(params)

    out = fwd_bwd(params)
    jax.block_until_ready(out)
    t_all = timeit(fwd_bwd, params)

    print(f"proj+pack       {t_proj:7.2f} ms")
    print(f"binning         {t_bin:7.2f} ms")
    print(f"entry gather    {t_gather:7.2f} ms")
    print(f"fwd kernel      {t_kernel:7.2f} ms")
    print(f"stages sum      {t_proj + t_bin + t_gather + t_kernel:7.2f} ms")
    print(f"full forward    {t_fwd:7.2f} ms")
    print(f"full fwd+bwd    {t_all:7.2f} ms  "
          f"({views * hw * hw / t_all / 1e3:.2f} Mrays/s)")


if __name__ == "__main__":
    main()
