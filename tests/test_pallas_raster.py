"""Pallas compositing kernels vs the pure-JAX oracle (interpret mode on CPU):
forward image parity and analytic-backward gradient parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatformer_tpu.data.synthetic import orbit_cameras, random_scene, single_camera
from splatformer_tpu.ops import render_image
from splatformer_tpu.ops.types import RasterizeConfig

CFG_JAX = RasterizeConfig(max_intersects=2**12, tiles_per_gauss=16,
                          max_per_tile=512, chunk_size=16, use_pallas=False)
CFG_PALLAS = CFG_JAX.replace(use_pallas=True)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    scene = random_scene(rng, 256, sh_degree=1, n_valid=230)
    cams = orbit_cameras(1, 32, 32)
    cam = single_camera(cams, 0)
    bg = jnp.array([0.3, 0.1, 0.2])
    target = jnp.asarray(rng.uniform(size=(32, 32, 3)), jnp.float32)
    return scene, cam, bg, target


def test_pallas_forward_matches_jax(setup):
    scene, cam, bg, _ = setup
    rgb_j, alpha_j = jax.jit(
        lambda s: render_image(s, cam, bg, CFG_JAX))(scene)
    rgb_p, alpha_p = jax.jit(
        lambda s: render_image(s, cam, bg, CFG_PALLAS))(scene)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_j),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_j),
                               atol=1e-5)


def test_pallas_backward_matches_jax(setup):
    scene, cam, bg, target = setup
    attrs = ("means", "scales", "quats", "opacities", "features_dc",
             "features_rest")
    params = {k: getattr(scene, k) for k in attrs}

    def make_loss(cfg):
        def loss(p):
            rgb, alpha = render_image(scene.replace(**p), cam, bg, cfg)
            return (jnp.mean(jnp.abs(rgb - target))
                    + 0.1 * jnp.mean(alpha))
        return loss

    g_jax = jax.jit(jax.grad(make_loss(CFG_JAX)))(params)
    g_pal = jax.jit(jax.grad(make_loss(CFG_PALLAS)))(params)
    for k in attrs:
        a, b = np.asarray(g_jax[k]), np.asarray(g_pal[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=2e-5 * scale, rtol=2e-3,
                                   err_msg=k)


def test_pallas_background_gradient(setup):
    scene, cam, _, target = setup

    def loss(bg, cfg):
        rgb, _ = render_image(scene, cam, bg, cfg)
        return jnp.mean((rgb - target) ** 2)

    g_j = jax.jit(jax.grad(lambda b: loss(b, CFG_JAX)))(jnp.array([0.2, 0.5, 0.7]))
    g_p = jax.jit(jax.grad(lambda b: loss(b, CFG_PALLAS)))(jnp.array([0.2, 0.5, 0.7]))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j), rtol=1e-4)


def test_segsum_gather_backward_matches_scatter(setup):
    """The sort+cumsum backward of gather_entries_segsum must equal the
    autodiff (scatter-add) transpose of a plain gather, including under a
    budget overflow (key-threshold truncation keeps counts exact)."""
    from splatformer_tpu.ops.binning import bin_gaussians
    from splatformer_tpu.ops.camera import opengl_c2w_to_opencv_w2c
    from splatformer_tpu.ops.pallas.raster import (CHUNK, PACK_W,
                                                   gather_entries_segsum)
    from splatformer_tpu.ops.projection import project_gaussians
    from splatformer_tpu.ops.render import activate_gaussians

    scene, cam, _, _ = setup
    act = activate_gaussians(scene)
    viewmat = opengl_c2w_to_opencv_w2c(cam.c2w)
    proj = project_gaussians(
        act["means"], act["scales"], act["quats"], viewmat,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.height, cam.width,
        tile_size=16, clip_thresh=0.01, mask=scene.valid_mask())

    rng = np.random.default_rng(0)
    n = proj.xys.shape[0]
    num_tiles = ((cam.width + 15) // 16) * ((cam.height + 15) // 16)
    for max_i in (2**12, 64):  # ample budget, and a forced overflow
        bins = bin_gaussians(proj, cam.height, cam.width, 16, max_i, 16)
        entry_valid = bins.tile_ids < num_tiles
        sortkey = jnp.where(entry_valid, bins.gauss_idx, n)
        budget = bins.gauss_idx.shape[0]
        n_pad = ((n + CHUNK - 1) // CHUNK) * CHUNK
        pg = jnp.asarray(rng.normal(size=(PACK_W, n_pad)), jnp.float32)
        ct = jnp.asarray(rng.normal(size=(PACK_W, budget)), jnp.float32)
        # the kernel contract: zero cotangents on invalid (past-budget)
        # entries AND on the pack-padding rows (only the 9 real attribute
        # rows carry gradient)
        ct = jnp.where(entry_valid[None, :], ct, 0.0)
        ct = ct.at[9:].set(0.0)

        def via_segsum(pg):
            out = gather_entries_segsum(pg, bins.gauss_idx, sortkey,
                                        bins.gauss_starts)
            return jnp.sum(out * ct)

        def via_scatter(pg):
            out = jnp.where(entry_valid[None, :], pg[:, bins.gauss_idx], 0.0)
            return jnp.sum(out * ct)

        g_a = jax.jit(jax.grad(via_segsum))(pg)
        g_b = jax.jit(jax.grad(via_scatter))(pg)
        np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"max_intersects={max_i}")


def test_render_overflow_budget_paths_agree(setup):
    """With a tiny intersect budget (K* truncation active) the pallas and
    chunked paths still see identical entries: same image, same grads."""
    scene, cam, bg, target = setup
    cfg_j = CFG_JAX.replace(max_intersects=128)
    cfg_p = cfg_j.replace(use_pallas=True)
    rgb_j, _ = jax.jit(lambda s: render_image(s, cam, bg, cfg_j))(scene)
    rgb_p, _ = jax.jit(lambda s: render_image(s, cam, bg, cfg_p))(scene)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_j),
                               atol=1e-5)

    def loss(cfg):
        return lambda m: jnp.mean(jnp.abs(
            render_image(scene.replace(means=m), cam, bg, cfg)[0] - target))

    g_j = jax.jit(jax.grad(loss(cfg_j)))(scene.means)
    g_p = jax.jit(jax.grad(loss(cfg_p)))(scene.means)
    scale = np.abs(np.asarray(g_j)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j),
                               atol=2e-5 * scale, rtol=2e-3)


def test_pallas_multiview_flat_matches_chunked(setup):
    """The flattened V-view pipeline (one binning sort / one kernel launch)
    must match per-view chunked rendering in both image and gradients."""
    from splatformer_tpu.data.synthetic import orbit_cameras
    from splatformer_tpu.ops import render_images

    scene, _, bg, _ = setup
    cams = orbit_cameras(3, 32, 32)
    rgb_j, al_j = jax.jit(
        lambda s: render_images(s, cams, bg, CFG_JAX))(scene)
    rgb_p, al_p = jax.jit(
        lambda s: render_images(s, cams, bg, CFG_PALLAS))(scene)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_j),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_p), np.asarray(al_j), atol=1e-5)

    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.uniform(size=rgb_j.shape), jnp.float32)
    attrs = ("means", "scales", "quats", "opacities", "features_dc",
             "features_rest")
    params = {k: getattr(scene, k) for k in attrs}

    def make_loss(cfg):
        def loss(p):
            rgb, alpha = render_images(scene.replace(**p), cams, bg, cfg)
            return jnp.mean(jnp.abs(rgb - target)) + 0.1 * jnp.mean(alpha)
        return loss

    g_j = jax.jit(jax.grad(make_loss(CFG_JAX)))(params)
    g_p = jax.jit(jax.grad(make_loss(CFG_PALLAS)))(params)
    for k in attrs:
        a, b = np.asarray(g_j[k]), np.asarray(g_p[k])
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b, a, atol=2e-5 * scale, rtol=2e-3,
                                   err_msg=k)
