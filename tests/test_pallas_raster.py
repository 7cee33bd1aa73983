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
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_j),
                               atol=3e-6)


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
