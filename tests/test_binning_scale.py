"""Binning at ~1 MPx (real-OOD image geometry) + dropped-entry observability
(VERDICT round-1 weak #6: tier constants were bench-tuned for 256^2 and
overflow was never surfaced)."""
import jax
import jax.numpy as jnp
import numpy as np

from splatformer_tpu.data.synthetic import orbit_cameras, random_scene, \
    single_camera
from splatformer_tpu.ops.binning import auto_tiers, bin_gaussians
from splatformer_tpu.ops.camera import opengl_c2w_to_opencv_w2c
from splatformer_tpu.ops.render import render_images_stats
from splatformer_tpu.ops.types import RasterizeConfig


def _project(scene, cam, tile_size=16):
    from splatformer_tpu.ops.render import activate_gaussians
    from splatformer_tpu.ops.projection import project_gaussians
    act = activate_gaussians(scene)
    mask = scene.valid_mask()
    viewmat = opengl_c2w_to_opencv_w2c(cam.c2w)
    return project_gaussians(
        act["means"], act["scales"], act["quats"], viewmat, cam.fx, cam.fy,
        cam.cx, cam.cy, cam.height, cam.width, tile_size=tile_size,
        clip_thresh=0.01, mask=mask)


def test_auto_tiers_scale_with_area():
    base = auto_tiers(256)          # 256^2 -> the tuned constants
    assert base == (4, 4096, 16, 512)
    big = auto_tiers(4096)          # 1024^2 -> 4x everything (sqrt(16))
    assert big == (16, 16384, 64, 2048)


def test_megapixel_binning_exact_coverage(rng):
    """At 1024^2 every (gaussian, tile) pair must survive with auto tiers:
    num_entries == sum(num_tiles_hit), num_dropped == 0."""
    hw = 1024
    scene = random_scene(rng, 8192, sh_degree=1)
    cam = single_camera(orbit_cameras(1, hw, hw), 0)
    proj = jax.jit(lambda s: _project(s, cam))(scene)
    bins = jax.jit(lambda p: bin_gaussians(p, hw, hw, 16, 2 ** 19, 256))(proj)
    total = int(jnp.sum(jnp.where(proj.num_tiles_hit > 0,
                                  proj.num_tiles_hit, 0)))
    assert int(bins.num_entries) == total
    assert int(bins.num_dropped) == 0
    # tile ranges cover exactly the valid entries
    assert int(bins.tile_start[-1]) == total


def test_undersized_tiers_report_drops(rng):
    hw = 256
    scene = random_scene(rng, 4096, sh_degree=1)
    cam = single_camera(orbit_cameras(1, hw, hw), 0)
    proj = jax.jit(lambda s: _project(s, cam))(scene)
    bins = bin_gaussians(proj, hw, hw, 16, 2 ** 16, 64,
                         tiers=(1, 8, 2, 4))  # absurdly small caps
    total = int(jnp.sum(jnp.where(proj.num_tiles_hit > 0,
                                  proj.num_tiles_hit, 0)))
    assert int(bins.num_dropped) > 0
    assert int(bins.num_entries) + int(bins.num_dropped) == total


def test_render_stats_surface_drops(rng):
    scene = random_scene(rng, 2048, sh_degree=1)
    cams = orbit_cameras(2, 64, 64)
    cfg = RasterizeConfig(max_intersects=2 ** 14)
    rgb, alpha, stats = jax.jit(
        lambda s: render_images_stats(s, cams, jnp.zeros(3), cfg))(scene)
    assert int(stats["num_dropped"]) == 0
    assert int(stats["num_entries"]) > 0
    # starved budget -> drops become visible, render still finite
    cfg2 = RasterizeConfig(max_intersects=256)
    rgb2, _, stats2 = jax.jit(
        lambda s: render_images_stats(s, cams, jnp.zeros(3), cfg2))(scene)
    assert int(stats2["num_dropped"]) > 0
    assert bool(jnp.isfinite(rgb2).all())
