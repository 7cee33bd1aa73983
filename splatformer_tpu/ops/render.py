"""Public differentiable rendering API.

Reproduces /root/reference/utils/gs_utils.py `rasterize_gaussians_to_singleimg`
/ `_to_multiimgs` semantics end-to-end, but TPU-native:

  * the per-view Python loop of the reference (gs_utils.py:20-27) becomes a
    `jax.vmap` over cameras — one fused XLA program for all views;
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
from splatformer_tpu.ops.projection import project_gaussians
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


def render_image(
    scene: GaussianScene,
    camera: Camera,
    background: jnp.ndarray,
    config: RasterizeConfig = RasterizeConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one view. Returns (rgb (H, W, 3) clamped to [.,1], alpha (H, W, 1))."""
    act = activate_gaussians(scene)
    mask = scene.valid_mask()
    opacities = jnp.where(mask, act["opacities"], 0.0)

    viewmat = opengl_c2w_to_opencv_w2c(camera.c2w)
    campos = camera.c2w[:3, 3]
    colors = compute_colors(scene, campos)

    proj = project_gaussians(
        act["means"], act["scales"], act["quats"], viewmat,
        camera.fx, camera.fy, camera.cx, camera.cy,
        camera.height, camera.width,
        tile_size=config.tile_size,
        clip_thresh=config.clip_thresh,
        mask=mask,
    )

    bins = bin_gaussians(
        proj, camera.height, camera.width, config.tile_size,
        config.max_intersects, config.tiles_per_gauss)

    if config.resolved_use_pallas():
        from splatformer_tpu.ops.binning import pad_tile_ranges
        from splatformer_tpu.ops.pallas.raster import (CHUNK, composite_packed,
                                                       gather_entries_segsum,
                                                       pack_entries_t)
        tiles_x = (camera.width + config.tile_size - 1) // config.tile_size
        tiles_y = (camera.height + config.tile_size - 1) // config.tile_size
        pbins = pad_tile_ranges(bins, tiles_x * tiles_y, CHUNK,
                                config.max_intersects)
        # pack once per Gaussian, gather once per entry; padding lanes are
        # masked in-kernel via the true per-tile counts. The gather's
        # backward is a sorted segment-sum (not a scatter) keyed on the
        # exact per-Gaussian counts from binning.
        pgauss_t = pack_entries_t(proj.xys, proj.conics, colors, opacities)
        n = proj.xys.shape[0]
        sortkey = jnp.where(pbins.valid, pbins.gauss_idx, n)
        packed_t = gather_entries_segsum(pgauss_t, pbins.gauss_idx, sortkey,
                                         bins.gauss_starts)
        counts = bins.tile_start[1:] - bins.tile_start[:-1]
        rgb, alpha = composite_packed(
            packed_t, pbins.tile_start, counts,
            camera.height, camera.width, config.tile_size, background,
            alpha_threshold=config.alpha_threshold,
            max_alpha=config.max_alpha,
            transmittance_eps=config.transmittance_eps,
        )
    else:
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
    return rgb, alpha[..., None]


def render_images(
    scene: GaussianScene,
    cameras: Camera,
    background: jnp.ndarray,
    config: RasterizeConfig = RasterizeConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a batch of views (cameras with a leading axis on c2w/intrinsics).

    vmap over cameras replaces the reference's per-view Python loop
    (gs_utils.py:20-27). Returns (rgb (V, H, W, 3), alpha (V, H, W, 1))."""
    def one(c2w, fx, fy, cx, cy):
        cam = Camera(c2w=c2w, fx=fx, fy=fy, cx=cx, cy=cy,
                     width=cameras.width, height=cameras.height)
        return render_image(scene, cam, background, config)

    return jax.vmap(one)(cameras.c2w, cameras.fx, cameras.fy,
                         cameras.cx, cameras.cy)
