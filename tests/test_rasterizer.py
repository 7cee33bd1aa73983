"""Rasterizer correctness: camera math, SH, projection, binning, compositing.

The chunked tile compositor is validated against the per-pixel oracle, and
gradients against finite differences (BASELINE.json config 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatformer_tpu.data.synthetic import (orbit_cameras, random_scene,
                                            single_camera)
from splatformer_tpu.ops import render_image
from splatformer_tpu.ops.binning import bin_gaussians
from splatformer_tpu.ops.camera import (normalize_quats,
                                        opengl_c2w_to_opencv_w2c,
                                        quat_to_rotmat)
from splatformer_tpu.ops.compositing import composite_tiles
from splatformer_tpu.ops.naive import composite_pixels_naive
from splatformer_tpu.ops.projection import project_gaussians
from splatformer_tpu.ops.render import activate_gaussians, compute_colors
from splatformer_tpu.ops.sh import eval_sh, num_sh_bases
from splatformer_tpu.ops.types import Camera, RasterizeConfig


def test_quat_to_rotmat_matches_scipy(rng):
    from scipy.spatial.transform import Rotation
    q_wxyz = rng.normal(size=(32, 4))
    q_wxyz /= np.linalg.norm(q_wxyz, axis=-1, keepdims=True)
    R_ours = np.asarray(quat_to_rotmat(jnp.asarray(q_wxyz, jnp.float32)))
    q_xyzw = np.concatenate([q_wxyz[:, 1:], q_wxyz[:, :1]], axis=-1)
    R_scipy = Rotation.from_quat(q_xyzw).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)


def test_normalize_quats_degenerate_fallback():
    q = jnp.array([[0.0, 0.0, 0.0, 0.0], [2.0, 0.0, 0.0, 0.0]])
    out = np.asarray(normalize_quats(q))
    np.testing.assert_allclose(out[0], [0, 0, 0, 1])
    np.testing.assert_allclose(out[1], [1, 0, 0, 0])


def test_view_matrix_inverse():
    from splatformer_tpu.data.synthetic import look_at_c2w
    c2w = look_at_c2w(np.array([1.0, 2.0, 3.0]), np.array([0.5, 0.5, 0.5]))
    view = np.asarray(opengl_c2w_to_opencv_w2c(jnp.asarray(c2w[:3, :4], jnp.float32)))
    # view @ flipped-c2w == identity
    flip = np.diag([1.0, -1.0, -1.0])
    c2w_cv = c2w.copy()
    c2w_cv[:3, :3] = c2w[:3, :3] @ flip
    np.testing.assert_allclose(view @ c2w_cv, np.eye(4), atol=1e-5)
    # camera center maps to origin
    np.testing.assert_allclose(view[:3, :3] @ c2w[:3, 3] + view[:3, 3], 0.0,
                               atol=1e-5)


def test_sh_degree0_and_rotation_invariant_band0(rng):
    coeffs = jnp.asarray(rng.normal(size=(5, num_sh_bases(3), 3)), jnp.float32)
    dirs = rng.normal(size=(5, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out0 = eval_sh(0, jnp.asarray(dirs, jnp.float32), coeffs)
    np.testing.assert_allclose(
        np.asarray(out0), 0.28209479177387814 * np.asarray(coeffs[:, 0, :]),
        rtol=1e-6)
    # degree-1 matches the closed form used by gsplat
    out1 = np.asarray(eval_sh(1, jnp.asarray(dirs, jnp.float32), coeffs))
    c = np.asarray(coeffs)
    expect = (0.28209479177387814 * c[:, 0]
              + 0.4886025119029199 * (-dirs[:, 1:2] * c[:, 1]
                                      + dirs[:, 2:3] * c[:, 2]
                                      - dirs[:, 0:1] * c[:, 3]))
    np.testing.assert_allclose(out1, expect, rtol=1e-5, atol=1e-6)


def test_projection_centered_gaussian():
    # One isotropic Gaussian at the camera axis: projects to principal point,
    # conic = inverse of (f*s/z)^2 + 0.3 blur on the diagonal.
    H = W = 64
    fx = fy = 100.0
    z = 2.0
    s = 0.05
    means = jnp.array([[0.0, 0.0, z]])
    scales = jnp.array([[s, s, s]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    viewmat = jnp.eye(4)
    proj = project_gaussians(means, scales, quats, viewmat,
                             fx, fy, W / 2, H / 2, H, W)
    np.testing.assert_allclose(np.asarray(proj.xys[0]), [W / 2, H / 2], atol=1e-4)
    np.testing.assert_allclose(float(proj.depths[0]), z, rtol=1e-6)
    var = (fx * s / z) ** 2 + 0.3
    np.testing.assert_allclose(np.asarray(proj.conics[0]),
                               [1.0 / var, 0.0, 1.0 / var], rtol=1e-4)
    # extent = worst-case alpha-gate crossing sqrt(2 ln(1/athr)) ~ 3.33
    # sigma (projection.py k_ext; exact wrt the compositor's alpha gate,
    # replacing gsplat's hard 3-sigma crop)
    k = np.sqrt(2.0 * np.log(255.0))
    assert int(proj.radii[0]) == int(np.ceil(k * np.sqrt(var)))
    np.testing.assert_allclose(np.asarray(proj.radii_xy[0]),
                               np.ceil(k * np.sqrt(var)))
    comp_expect = np.sqrt(((fx * s / z) ** 2) ** 2 / var**2)
    np.testing.assert_allclose(float(proj.compensation[0]), comp_expect,
                               rtol=1e-5)


def test_projection_culling_behind_camera():
    means = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 0.001], [0.0, 0.0, 2.0]])
    scales = jnp.full((3, 3), 0.01)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (3, 1))
    proj = project_gaussians(means, scales, quats, jnp.eye(4),
                             50.0, 50.0, 32.0, 32.0, 64, 64)
    assert int(proj.radii[0]) == 0
    assert int(proj.radii[1]) == 0
    assert int(proj.radii[2]) > 0
    assert int(proj.num_tiles_hit[0]) == 0


def test_binning_covers_each_overlap_once(rng):
    scene = random_scene(rng, 512, sh_degree=1)
    cams = orbit_cameras(1, 128, 128)
    cam = single_camera(cams, 0)
    act = activate_gaussians(scene)
    viewmat = opengl_c2w_to_opencv_w2c(cam.c2w)
    proj = project_gaussians(act["means"], act["scales"], act["quats"],
                             viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
                             cam.height, cam.width, mask=scene.valid_mask())
    bins = bin_gaussians(proj, cam.height, cam.width, 16, 2**14, 64)
    tiles_x = 128 // 16
    n_entries = int(bins.num_entries)
    assert int(bins.num_dropped) == 0
    assert n_entries == int(jnp.sum(proj.num_tiles_hit))
    tile_ids = np.asarray(bins.tile_ids)[:n_entries]
    gidx = np.asarray(bins.gauss_idx)[:n_entries]
    # each (gaussian, tile) pair appears exactly once
    pairs = set(zip(tile_ids.tolist(), gidx.tolist()))
    assert len(pairs) == n_entries
    # every entry's tile is inside that gaussian's bbox
    xys = np.asarray(proj.xys)
    radii = np.asarray(proj.radii)
    for t, g in list(pairs)[:200]:
        ty, tx = divmod(t, tiles_x)
        x0, y0 = tx * 16, ty * 16
        assert xys[g, 0] + radii[g] >= x0 - 16 and xys[g, 0] - radii[g] <= x0 + 32
    # depth-sorted within tile (up to the single-key quantization step:
    # the fused sort key keeps the top depth bits; ties fall back to stable
    # gaussian-index order, so inversions are bounded by the quant step)
    depths = np.asarray(proj.depths)[gidx]
    for t in np.unique(tile_ids):
        d = depths[tile_ids == t]
        if len(d) > 1:
            assert np.all(np.diff(d) >= -np.abs(d).max() * 2**-11)
    # tile_start ranges partition entries
    starts = np.asarray(bins.tile_start)
    assert starts[0] == 0 and starts[-1] == n_entries
    assert np.all(np.diff(starts) >= 0)


@pytest.mark.parametrize("hw", [(64, 64), (48, 80)])
def test_tiled_compositing_matches_naive_oracle(rng, hw):
    H, W = hw
    scene = random_scene(rng, 768, sh_degree=1, n_valid=700)
    cams = orbit_cameras(1, H, W)
    cam = single_camera(cams, 0)
    background = jnp.array([0.2, 0.1, 0.4])

    act = activate_gaussians(scene)
    mask = scene.valid_mask()
    opac = jnp.where(mask, act["opacities"], 0.0)
    viewmat = opengl_c2w_to_opencv_w2c(cam.c2w)
    colors = compute_colors(scene, cam.c2w[:3, 3])
    proj = project_gaussians(act["means"], act["scales"], act["quats"],
                             viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
                             cam.height, cam.width, mask=mask)

    rgb_naive, alpha_naive = composite_pixels_naive(
        proj, colors, opac, H, W, background)

    cfg = RasterizeConfig()
    bins = bin_gaussians(proj, H, W, cfg.tile_size, cfg.max_intersects,
                         cfg.tiles_per_gauss)
    gidx = bins.gauss_idx
    pad = cfg.chunk_size
    rgb_tiled, alpha_tiled = composite_tiles(
        jnp.pad(proj.xys[gidx], ((0, pad), (0, 0))),
        jnp.pad(proj.conics[gidx], ((0, pad), (0, 0))),
        jnp.pad(colors[gidx], ((0, pad), (0, 0))),
        jnp.pad(opac[gidx], ((0, pad),)),
        bins.tile_start, H, W, cfg.tile_size, background,
        max_per_tile=cfg.max_per_tile, chunk_size=cfg.chunk_size)

    np.testing.assert_allclose(np.asarray(rgb_tiled), np.asarray(rgb_naive),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha_tiled),
                               np.asarray(alpha_naive), atol=2e-5)


def test_render_image_end_to_end_and_mask_invariance(rng):
    # Padding with masked slots must not change the image.
    scene_small = random_scene(rng, 256, sh_degree=1)
    scene_padded = jax.tree.map(
        lambda a: jnp.concatenate([a, a[:64]], axis=0), scene_small)
    scene_padded = scene_padded.replace(
        mask=jnp.concatenate([jnp.ones(256, bool), jnp.zeros(64, bool)]))
    cams = orbit_cameras(2, 64, 64)
    bg = jnp.zeros(3)
    for i in range(2):
        cam = single_camera(cams, i)
        rgb_a, alpha_a = render_image(scene_small, cam, bg)
        rgb_b, alpha_b = render_image(scene_padded, cam, bg)
        np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_b),
                                   atol=1e-6)
        assert np.asarray(alpha_a).max() > 0.1  # something rendered


def test_gradients_match_finite_differences(rng):
    # Finite-difference check through projection + binning + compositing for
    # all six attributes (f64 for clean FD).
    with jax.enable_x64(True):
        scene = random_scene(rng, 48, sh_degree=1, dtype=jnp.float64)
        cams = orbit_cameras(1, 32, 32)
        cam = Camera(c2w=jnp.asarray(cams.c2w[0], jnp.float64),
                     fx=jnp.float64(cams.fx[0]), fy=jnp.float64(cams.fy[0]),
                     cx=jnp.float64(cams.cx[0]), cy=jnp.float64(cams.cy[0]),
                     width=32, height=32)
        bg = jnp.zeros(3, jnp.float64)
        target = jnp.asarray(rng.uniform(size=(32, 32, 3)))
        cfg = RasterizeConfig(max_per_tile=256, chunk_size=16)

        attr_names = ["means", "scales", "quats", "opacities", "features_dc",
                      "features_rest"]
        params = {k: getattr(scene, k) for k in attr_names}

        @jax.jit
        def loss_fn(params):
            rgb, _ = render_image(scene.replace(**params), cam, bg, cfg)
            return jnp.mean((rgb - target) ** 2)

        grads = jax.jit(jax.grad(loss_fn))(params)
        base = float(loss_fn(params))
        eps = 1e-6
        checks = [("means", (3, 1)), ("scales", (7, 2)), ("quats", (11, 0)),
                  ("opacities", (5, 0)), ("features_dc", (9, 1)),
                  ("features_rest", (2, 0, 1))]
        for name, idx in checks:
            perturbed = dict(params)
            perturbed[name] = params[name].at[idx].add(eps)
            loss_p = float(loss_fn(perturbed))
            fd = (loss_p - base) / eps
            an = float(grads[name][idx])
            assert np.isclose(fd, an, rtol=5e-3, atol=1e-8), (name, fd, an)
