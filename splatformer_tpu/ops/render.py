"""Public differentiable rendering API.

Reproduces /root/reference/utils/gs_utils.py `rasterize_gaussians_to_singleimg`
/ `_to_multiimgs` semantics end-to-end, but TPU-native:

  * the per-view Python loop of the reference (gs_utils.py:20-27) becomes one
    flattened XLA program for all views: per-view projection/SH are a cheap
    `jax.vmap`, then the (view, gaussian) axes flatten so tile binning, entry
    packing, and the Pallas compositing kernel each run ONCE over a virtual
    image of V * tiles-per-view tiles (batched `lax.sort`/gather measured
    several-x slower than flat on v5e);
  * activations (exp scales, quat renorm, sigmoid opacity) and SH evaluation
    are plain jnp that XLA fuses;
  * tile binning is a static-budget sort (binning.py);
  * compositing is the chunked tile walk (compositing.py) or the Pallas
    kernel (pallas/raster.py) selected by RasterizeConfig.use_pallas.

Gradients flow to all six Gaussian attributes exactly as in gsplat
(SURVEY.md §3.4).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from splatformer_tpu.ops import sh as sh_ops
from splatformer_tpu.ops.binning import bin_gaussians
from splatformer_tpu.ops.camera import normalize_quats, opengl_c2w_to_opencv_w2c
from splatformer_tpu.ops.compositing import composite_tiles
from splatformer_tpu.ops.projection import ProjectedGaussians, project_gaussians
from splatformer_tpu.ops.types import Camera, GaussianScene, RasterizeConfig


def activate_gaussians(scene: GaussianScene) -> Dict[str, jnp.ndarray]:
    """Raw -> rendering-space activations (gs_utils.py:44-58): exp(scales),
    renormalized quats with degenerate fallback, sigmoid(opacities)."""
    return {
        "means": scene.means,
        "scales": jnp.exp(scene.scales),
        "quats": normalize_quats(scene.quats),
        "opacities": jax.nn.sigmoid(scene.opacities[..., 0]),
    }


def compute_colors(scene: GaussianScene, campos: jnp.ndarray) -> jnp.ndarray:
    """Per-view SH color evaluation (gs_utils.py:59-79).

    sh_degree 0: sigmoid(features_dc). Otherwise evaluate SH along the
    mean->camera direction and clamp(rgb + 0.5, min=0). The reference patches
    NaN viewdirs (Gaussian exactly at the camera) with a random direction; we
    use a deterministic unit fallback — under jit the choice is arbitrary
    either way and affects only exactly-degenerate points.
    """
    degree = scene.sh_degree
    if degree == 0:
        return jax.nn.sigmoid(scene.features_dc)
    coeffs = jnp.concatenate(
        [scene.features_dc[:, None, :], scene.features_rest], axis=1)
    viewdirs = jax.lax.stop_gradient(scene.means) - jax.lax.stop_gradient(campos)
    norm = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
    fallback = jnp.array([0.0, 0.0, 1.0], dtype=viewdirs.dtype)
    viewdirs = jnp.where(norm > 0, viewdirs / jnp.maximum(norm, 1e-12), fallback)
    rgb = sh_ops.eval_sh(degree, viewdirs, coeffs)
    return jnp.clip(rgb + 0.5, min=0.0)


def _render_chunked(
    scene: GaussianScene,
    camera: Camera,
    background: jnp.ndarray,
    config: RasterizeConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One view through the chunked lax.scan walker (any backend)."""
    act = activate_gaussians(scene)
    mask = scene.valid_mask()
    opacities = jnp.where(mask, act["opacities"], 0.0)

    viewmat = opengl_c2w_to_opencv_w2c(camera.c2w)
    colors = compute_colors(scene, camera.c2w[:3, 3])

    proj = project_gaussians(
        act["means"], act["scales"], act["quats"], viewmat,
        camera.fx, camera.fy, camera.cx, camera.cy,
        camera.height, camera.width,
        tile_size=config.tile_size,
        clip_thresh=config.clip_thresh,
        mask=mask,
        opacities=opacities,
        alpha_threshold=config.alpha_threshold,
    )
    bins = bin_gaussians(
        proj, camera.height, camera.width, config.tile_size,
        config.max_intersects, config.tiles_per_gauss, tiers=config.tiers)

    # Gather per-entry data in sorted order; pad by chunk_size so the
    # chunked walker's dynamic slices never clamp.
    pad = config.chunk_size
    gidx = bins.gauss_idx
    entry_xy = jnp.pad(proj.xys[gidx], ((0, pad), (0, 0)))
    entry_conic = jnp.pad(proj.conics[gidx], ((0, pad), (0, 0)))
    entry_color = jnp.pad(colors[gidx], ((0, pad), (0, 0)))
    entry_opac = jnp.pad(opacities[gidx], ((0, pad),))
    rgb, alpha = composite_tiles(
        entry_xy, entry_conic, entry_color, entry_opac, bins.tile_start,
        camera.height, camera.width, config.tile_size, background,
        max_per_tile=config.max_per_tile,
        chunk_size=config.chunk_size,
        alpha_threshold=config.alpha_threshold,
        max_alpha=config.max_alpha,
        transmittance_eps=config.transmittance_eps,
    )
    rgb = jnp.clip(rgb, max=1.0)  # gs_utils.py:111
    stats = {"num_dropped": bins.num_dropped, "num_entries": bins.num_entries}
    return rgb, alpha[..., None], stats


def _render_images_pallas(
    scene: GaussianScene,
    cameras: Camera,
    background: jnp.ndarray,
    config: RasterizeConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All V views in ONE flat pipeline (see module docstring)."""
    from splatformer_tpu.ops.pallas.raster import (PACK_W, composite_packed,
                                                   gather_entries_segsum,
                                                   pack_entries_t)
    v = cameras.c2w.shape[0]
    height, width, ts = cameras.height, cameras.width, config.tile_size
    tiles_img = (((width + ts - 1) // ts) * ((height + ts - 1) // ts))

    act = activate_gaussians(scene)
    mask = scene.valid_mask()
    opacities = jnp.where(mask, act["opacities"], 0.0)

    def per_view(c2w, fx, fy, cx, cy):
        viewmat = opengl_c2w_to_opencv_w2c(c2w)
        colors = compute_colors(scene, c2w[:3, 3])
        proj = project_gaussians(
            act["means"], act["scales"], act["quats"], viewmat,
            fx, fy, cx, cy, height, width,
            tile_size=ts, clip_thresh=config.clip_thresh, mask=mask,
            opacities=opacities, alpha_threshold=config.alpha_threshold)
        pgauss_t = pack_entries_t(proj.xys, proj.conics, colors, opacities)
        return proj, pgauss_t

    proj_b, pg_b = jax.vmap(per_view)(cameras.c2w, cameras.fx, cameras.fy,
                                      cameras.cx, cameras.cy)

    # flatten (view, gaussian) -> one axis, padding each view's projection
    # to the packed stride so the flat index v * n_pad + g addresses both
    # the entry table and the projection arrays
    n = scene.num_points
    n_pad = pg_b.shape[-1]

    def flat(x):
        pad = [(0, 0), (0, n_pad - n)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, pad).reshape((v * n_pad,) + x.shape[2:])

    projf = ProjectedGaussians(*(flat(x) for x in proj_b))
    tile_offset = jnp.repeat(
        jnp.arange(v, dtype=jnp.int32) * tiles_img, n_pad)
    total_budget = v * config.max_intersects

    bins = bin_gaussians(projf, height, width, ts, total_budget,
                         config.tiles_per_gauss, tile_offset=tile_offset,
                         num_images=v, tiers=config.tiers)

    pg_flat = pg_b.transpose(1, 0, 2).reshape(PACK_W, v * n_pad)
    # entries past the budget threshold sorted to the tail (sentinel tile);
    # the kernels never touch them and the segsum backward keys them out
    entry_valid = bins.tile_ids < v * tiles_img
    sortkey = jnp.where(entry_valid, bins.gauss_idx, v * n_pad)
    packed_t = gather_entries_segsum(pg_flat, bins.gauss_idx, sortkey,
                                     bins.gauss_starts)
    rgb, alpha = composite_packed(
        packed_t, bins.tile_start, height, width, ts, background,
        alpha_threshold=config.alpha_threshold,
        max_alpha=config.max_alpha,
        transmittance_eps=config.transmittance_eps,
        num_images=v,
    )
    rgb = jnp.clip(rgb, max=1.0)  # gs_utils.py:111
    stats = {"num_dropped": bins.num_dropped, "num_entries": bins.num_entries}
    return rgb, alpha[..., None], stats


def render_image(
    scene: GaussianScene,
    camera: Camera,
    background: jnp.ndarray,
    config: RasterizeConfig = RasterizeConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one view. Returns (rgb (H, W, 3) clamped to [.,1], alpha (H, W, 1))."""
    if config.resolved_use_pallas():
        cams = Camera(c2w=camera.c2w[None], fx=jnp.asarray(camera.fx)[None],
                      fy=jnp.asarray(camera.fy)[None],
                      cx=jnp.asarray(camera.cx)[None],
                      cy=jnp.asarray(camera.cy)[None],
                      width=camera.width, height=camera.height)
        rgb, alpha, _ = _render_images_pallas(scene, cams, background, config)
        return rgb[0], alpha[0]
    rgb, alpha, _ = _render_chunked(scene, camera, background, config)
    return rgb, alpha


def render_images(
    scene: GaussianScene,
    cameras: Camera,
    background: jnp.ndarray,
    config: RasterizeConfig = RasterizeConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a batch of views (cameras with a leading axis on c2w/intrinsics).

    The flat multi-view pipeline replaces the reference's per-view Python
    loop (gs_utils.py:20-27). Returns (rgb (V, H, W, 3), alpha (V, H, W, 1))."""
    rgb, alpha, _ = render_images_stats(scene, cameras, background, config)
    return rgb, alpha


def render_images_stats(
    scene: GaussianScene,
    cameras: Camera,
    background: jnp.ndarray,
    config: RasterizeConfig = RasterizeConfig(),
):
    """render_images plus binning statistics: {'num_dropped',
    'num_entries'} — num_dropped > 0 means (gaussian, tile) pairs were lost
    to the tier caps or the max_intersects budget (silent quality loss at
    scale otherwise; the training loop logs it)."""
    if config.resolved_use_pallas():
        return _render_images_pallas(scene, cameras, background, config)

    def one(c2w, fx, fy, cx, cy):
        cam = Camera(c2w=c2w, fx=fx, fy=fy, cx=cx, cy=cy,
                     width=cameras.width, height=cameras.height)
        return _render_chunked(scene, cam, background, config)

    rgb, alpha, stats = jax.vmap(one)(cameras.c2w, cameras.fx, cameras.fy,
                                      cameras.cx, cameras.cy)
    return rgb, alpha, jax.tree.map(jnp.sum, stats)
