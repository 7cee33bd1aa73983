"""Compiled-numerics validation on the real TPU chip.

The pytest suite runs the Pallas kernels in interpret mode on CPU, where
matmul-precision and Mosaic lowering effects are invisible. This tool runs
COMPILED kernels on the chip and checks them against two oracles:

  1. small scale (2k Gaussians, 32x32): the per-pixel naive scan renderer
     (ops/naive.py) — gold semantics; forward image + gradients to all six
     Gaussian attributes;
  2. bench scale (100k Gaussians, 256^2, 4 views): the chunked lax.scan
     walker (ops/compositing.py) — an independent compositing implementation
     sharing projection/binning, so the diff isolates the Pallas kernels.

Prints max abs/rel errors; exits nonzero if any check exceeds tolerance.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/validate_tpu.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

ATTRS = ("means", "scales", "quats", "opacities", "features_dc",
         "features_rest")
FAILS = []


def check(name, got, want, atol, rtol):
    got, want = np.asarray(got), np.asarray(want)
    err = np.abs(got - want)
    bound = atol + rtol * np.abs(want)
    bad = err > bound
    maxrel = (err / (np.abs(want) + 1e-12)).max()
    status = "FAIL" if bad.any() else "ok"
    if bad.any():
        FAILS.append(name)
    print(f"  {status:4s} {name:24s} max_abs={err.max():.3e} "
          f"max_rel={maxrel:.3e} (atol={atol:g} rtol={rtol:g})")


def main():
    from splatformer_tpu.data.synthetic import orbit_cameras, random_scene, single_camera
    from splatformer_tpu.ops.camera import normalize_quats, opengl_c2w_to_opencv_w2c
    from splatformer_tpu.ops.naive import composite_pixels_naive
    from splatformer_tpu.ops.projection import project_gaussians
    from splatformer_tpu.ops.render import (activate_gaussians, compute_colors,
                                            render_image, render_images)
    from splatformer_tpu.ops.types import RasterizeConfig

    print(f"device: {jax.devices()[0].device_kind}")

    # ---- 1. small scale vs the naive per-pixel oracle
    rng = np.random.default_rng(3)
    scene = random_scene(rng, 2048, sh_degree=1, n_valid=2000)
    cam = single_camera(orbit_cameras(1, 32, 32), 0)
    bg = jnp.array([0.3, 0.1, 0.2])
    target = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
    cfg = RasterizeConfig(max_intersects=2**13, tiles_per_gauss=16,
                          max_per_tile=2048, use_pallas=True)

    def naive_render(s):
        act = activate_gaussians(s)
        mask = s.valid_mask()
        opac = jnp.where(mask, act["opacities"], 0.0)
        viewmat = opengl_c2w_to_opencv_w2c(cam.c2w)
        colors = compute_colors(s, cam.c2w[:3, 3])
        proj = project_gaussians(
            act["means"], act["scales"], act["quats"], viewmat,
            cam.fx, cam.fy, cam.cx, cam.cy, cam.height, cam.width,
            tile_size=cfg.tile_size, clip_thresh=cfg.clip_thresh, mask=mask)
        rgb, alpha = composite_pixels_naive(
            proj, colors, opac, cam.height, cam.width, bg)
        return jnp.clip(rgb, max=1.0), alpha

    def pallas_render(s):
        rgb, alpha = render_image(s, cam, bg, cfg)
        return rgb, alpha[..., 0]

    rgb_n, al_n = jax.jit(naive_render)(scene)
    rgb_p, al_p = jax.jit(pallas_render)(scene)
    print("small scale (2k gauss, 32x32) vs naive oracle:")
    check("fwd rgb", rgb_p, rgb_n, 1e-5, 1e-5)
    check("fwd alpha", al_p, al_n, 1e-5, 1e-5)

    params = {k: getattr(scene, k) for k in ATTRS}

    def make_loss(render):
        def loss(p):
            rgb, alpha = render(scene.replace(**p))
            return jnp.mean(jnp.abs(rgb - target)) + 0.1 * jnp.mean(alpha)
        return loss

    g_n = jax.jit(jax.grad(make_loss(naive_render)))(params)
    g_p = jax.jit(jax.grad(make_loss(pallas_render)))(params)
    for k in ATTRS:
        scale = float(np.abs(np.asarray(g_n[k])).max()) + 1e-12
        check(f"grad {k}", g_p[k], g_n[k], 3e-5 * scale, 2e-3)

    # ---- 2. bench scale vs the chunked walker
    rng = np.random.default_rng(0)
    scene = random_scene(rng, 100_352, sh_degree=1, n_valid=100_000)
    cams = orbit_cameras(4, 256, 256)
    target = jnp.asarray(rng.uniform(size=(4, 256, 256, 3)), jnp.float32)
    bg = jnp.zeros(3)
    cfg_p = RasterizeConfig(use_pallas=True)
    cfg_j = RasterizeConfig(use_pallas=False)

    rgb_p, al_p = jax.jit(
        lambda s: render_images(s, cams, bg, cfg_p))(scene)
    rgb_j, al_j = jax.jit(
        lambda s: render_images(s, cams, bg, cfg_j))(scene)
    print("bench scale (100k gauss, 4x256^2) vs chunked walker:")
    check("fwd rgb", rgb_p, rgb_j, 2e-5, 1e-4)
    check("fwd alpha", al_p, al_j, 2e-5, 1e-4)

    params = {k: getattr(scene, k) for k in ATTRS}

    def make_loss2(cfg):
        def loss(p):
            rgb, _ = render_images(scene.replace(**p), cams, bg, cfg)
            return jnp.mean(jnp.abs(rgb - target))
        return loss

    g_p = jax.jit(jax.grad(make_loss2(cfg_p)))(params)
    g_j = jax.jit(jax.grad(make_loss2(cfg_j)))(params)
    for k in ATTRS:
        scale = float(np.abs(np.asarray(g_j[k])).max()) + 1e-12
        check(f"grad {k}", g_p[k], g_j[k], 3e-5 * scale, 2e-3)

    if FAILS:
        print("FAILED:", FAILS)
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
