"""3D Gaussian -> 2D screen-space projection (gsplat v0.1.11 `project_gaussians`
semantics), as fully vectorized JAX.

All per-Gaussian math here is elementwise/small-matrix work that XLA fuses into
one pass over HBM — a Pallas kernel buys nothing, so the TPU-native design is
"plain jnp + let XLA fuse". The tile compositing (the actually hard part) lives
in compositing.py / pallas/.

Reference behavior reproduced (see /root/reference/utils/gs_utils.py:82-95 and
gsplat v0.1.11 forward.cu):
  * quat (wxyz) -> R, S = diag(scales), M = R S, cov3d = M M^T
  * view transform, near-plane cull at z <= clip_thresh
  * EWA: J W cov3d W^T J^T with the 1.3*tan_fov frustum clamp on t.x/t.y
  * +0.3 pixel blur on the 2D covariance diagonal, with the "compensation"
    factor sqrt(det(cov2d)/det(cov2d_blurred))
  * conic = inverse covariance; radius = ceil(3 sigma_max) via eigenvalues
  * tile span count for binning
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from splatformer_tpu.ops.camera import normalize_quats, quat_to_rotmat


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian screen-space quantities (all shape (N, ...))."""

    xys: jnp.ndarray          # (N, 2) pixel centers
    depths: jnp.ndarray       # (N,) camera-space z
    radii: jnp.ndarray        # (N,) int32 pixel radius (0 = culled)
    conics: jnp.ndarray       # (N, 3) inverse 2D covariance (a, b, c)
    compensation: jnp.ndarray  # (N,) blur compensation factor
    num_tiles_hit: jnp.ndarray  # (N,) int32
    cov3d: jnp.ndarray        # (N, 6) packed upper-triangular 3D covariance
    # per-axis pixel extents of the culling region (rx, ry), f32. With
    # opacity-aware extents these bound the EXACT set {alpha >= athr}
    # (outside it the compositor's alpha-threshold gate drops the splat
    # anyway), so tile bboxes built from them are lossless and tighter
    # than the 3-sigma circle for anisotropic or low-opacity splats.
    radii_xy: jnp.ndarray     # (N, 2)


def scale_quat_to_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                        glob_scale: float = 1.0) -> jnp.ndarray:
    """(N,3) linear scales + (N,4) wxyz quats -> (N,6) packed covariance
    [c00, c01, c02, c11, c12, c22]."""
    R = quat_to_rotmat(normalize_quats(quats))
    M = R * (scales * glob_scale)[..., None, :]  # R @ diag(s)
    # cov = M M^T, written as explicit row dots: 3x3 matmuls would otherwise
    # be padded onto the MXU at bf16 default precision — elementwise VPU math
    # keeps full f32 and fuses with the rest of the projection.
    def rowdot(i, j):
        return (M[..., i, 0] * M[..., j, 0] + M[..., i, 1] * M[..., j, 1]
                + M[..., i, 2] * M[..., j, 2])
    return jnp.stack(
        [rowdot(0, 0), rowdot(0, 1), rowdot(0, 2),
         rowdot(1, 1), rowdot(1, 2), rowdot(2, 2)], axis=-1)


def project_gaussians(
    means: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    viewmat: jnp.ndarray,
    fx, fy, cx, cy,
    img_height: int,
    img_width: int,
    tile_size: int = 16,
    glob_scale: float = 1.0,
    clip_thresh: float = 0.01,
    mask: jnp.ndarray | None = None,
    opacities: jnp.ndarray | None = None,
    alpha_threshold: float = 1.0 / 255.0,
) -> ProjectedGaussians:
    """Project N Gaussians to screen space. ``viewmat`` is the (4,4) or (3,4)
    OpenCV world-to-camera matrix. Padded/masked Gaussians get radius 0.

    With ``opacities`` (post-sigmoid, (N,)) the culling extent becomes
    opacity-aware: alpha = op * exp(-sigma) crosses the compositor's
    ``alpha_threshold`` gate at sigma = ln(op/athr), i.e. at
    k = sqrt(2 ln(op/athr)) standard deviations — never more than the
    gsplat 3-sigma default (which corresponds to op/athr = e^4.5 ~ 90) and
    much less for dim splats; splats with op <= athr can never composite
    and cull entirely. This is EXACT with respect to the alpha gate: no
    pixel whose alpha reaches the threshold lies outside the extent, so
    images and gradients are unchanged while tile spans (and with them
    binning-sort survivors and compositor walk lengths) shrink."""
    dtype = means.dtype
    R_view = viewmat[:3, :3]
    t_view = viewmat[:3, 3]

    cov3d = scale_quat_to_cov3d(scales, quats, glob_scale)  # (N, 6)

    # world -> camera, elementwise (avoids bf16 MXU default precision)
    p_view = jnp.sum(means[:, None, :] * R_view[None, :, :], axis=-1) + t_view
    tz = p_view[:, 2]
    valid = tz > clip_thresh
    if mask is not None:
        valid = valid & mask
    tz_safe = jnp.where(valid, tz, 1.0)

    # EWA Jacobian with frustum-clamped t (gsplat project_cov3d_ewa)
    tan_fovx = 0.5 * img_width / fx
    tan_fovy = 0.5 * img_height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(p_view[:, 0], -lim_x * tz_safe, lim_x * tz_safe)
    ty = jnp.clip(p_view[:, 1], -lim_y * tz_safe, lim_y * tz_safe)

    rz = 1.0 / tz_safe
    rz2 = rz * rz
    # J (2x3) rows: [fx*rz, 0, -fx*tx*rz2], [0, fy*rz, -fy*ty*rz2]
    # T = J @ R_view (2x3); cov2d = T cov3d T^T
    J00 = fx * rz
    J02 = -fx * tx * rz2
    J11 = fy * rz
    J12 = -fy * ty * rz2
    # T rows expressed via R_view rows (R_view[i] = world->cam row i)
    T0 = J00[:, None] * R_view[0][None, :] + J02[:, None] * R_view[2][None, :]
    T1 = J11[:, None] * R_view[1][None, :] + J12[:, None] * R_view[2][None, :]

    c00, c01, c02, c11, c12, c22 = (cov3d[:, 0], cov3d[:, 1], cov3d[:, 2],
                                    cov3d[:, 3], cov3d[:, 4], cov3d[:, 5])

    def quad(u, v):
        # u^T cov3d v for row vectors u, v of shape (N, 3)
        return (u[:, 0] * (c00 * v[:, 0] + c01 * v[:, 1] + c02 * v[:, 2])
                + u[:, 1] * (c01 * v[:, 0] + c11 * v[:, 1] + c12 * v[:, 2])
                + u[:, 2] * (c02 * v[:, 0] + c12 * v[:, 1] + c22 * v[:, 2]))

    v00 = quad(T0, T0)
    v01 = quad(T0, T1)
    v11 = quad(T1, T1)

    det_orig = v00 * v11 - v01 * v01
    b00 = v00 + 0.3
    b11 = v11 + 0.3
    det_blur = b00 * b11 - v01 * v01
    compensation = jnp.sqrt(jnp.maximum(0.0, det_orig / det_blur))

    det_ok = det_blur != 0.0
    det_safe = jnp.where(det_ok, det_blur, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([b11 * inv_det, -v01 * inv_det, b00 * inv_det], axis=-1)

    # extent multiplier: 3 sigma (gsplat), or the exact alpha-gate crossing
    # sqrt(2 ln(op/athr)) when opacities are provided (see docstring)
    if opacities is None:
        # worst case over opacities <= 1: exact for any splat
        import math
        k_max = math.sqrt(2.0 * math.log(1.0 / alpha_threshold))
        k_ext = jnp.full(tz.shape, k_max, dtype)
    else:
        # exact, UNclamped: at opacity 1 this is sqrt(2 ln 255) ~ 3.33 —
        # slightly wider than gsplat's hard 3-sigma crop (which can drop
        # above-threshold pixels of bright splats), far tighter for dim
        # ones, and zero (full cull) at op <= athr
        ratio = opacities / alpha_threshold
        k_ext = jnp.where(
            ratio > 1.0,
            jnp.sqrt(2.0 * jnp.log(jnp.maximum(ratio, 1.0))),
            0.0)

    # radius = ceil(k * sqrt(max eigenvalue))
    bmid = 0.5 * (b00 + b11)
    disc = jnp.sqrt(jnp.maximum(0.1, bmid * bmid - det_safe))
    v1 = bmid + disc
    v2 = bmid - disc
    radius_f = jnp.ceil(
        k_ext * jnp.sqrt(jnp.maximum(0.0, jnp.maximum(v1, v2))))
    # per-axis AABB of the level set {sigma <= k^2/2}: the extremal x on
    # that ellipse is exactly k * sqrt(cov_xx) (blurred covariance diag)
    rx = jnp.ceil(k_ext * jnp.sqrt(jnp.maximum(0.0, b00)))
    ry = jnp.ceil(k_ext * jnp.sqrt(jnp.maximum(0.0, b11)))

    # Pixel-space center (integer-pixel convention, matching gsplat v0.1.x /
    # Inria: pixel (i, j) samples at coordinate (j, i)).
    xs = fx * p_view[:, 0] * rz + cx
    ys = fy * p_view[:, 1] * rz + cy
    xys = jnp.stack([xs, ys], axis=-1)

    valid = valid & det_ok
    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    rx = jnp.where(valid, rx, 0.0)
    ry = jnp.where(valid, ry, 0.0)

    # Tile span (gsplat get_tile_bbox with per-axis extents), clamped.
    tiles_x = (img_width + tile_size - 1) // tile_size
    tiles_y = (img_height + tile_size - 1) // tile_size
    tmin_x = jnp.clip(((xys[:, 0] - rx) / tile_size).astype(jnp.int32), 0, tiles_x)
    tmax_x = jnp.clip(((xys[:, 0] + rx) / tile_size + 1.0).astype(jnp.int32), 0, tiles_x)
    tmin_y = jnp.clip(((xys[:, 1] - ry) / tile_size).astype(jnp.int32), 0, tiles_y)
    tmax_y = jnp.clip(((xys[:, 1] + ry) / tile_size + 1.0).astype(jnp.int32), 0, tiles_y)
    span = (tmax_x - tmin_x) * (tmax_y - tmin_y)
    num_tiles_hit = jnp.where(radii > 0, span, 0).astype(jnp.int32)

    depths = jnp.where(valid, tz, jnp.inf).astype(dtype)
    return ProjectedGaussians(
        xys=xys, depths=depths, radii=radii,
        conics=conic, compensation=compensation,
        num_tiles_hit=num_tiles_hit, cov3d=cov3d,
        radii_xy=jnp.stack([rx, ry], axis=-1))


def tile_bbox(xys: jnp.ndarray, radii: jnp.ndarray, tile_size: int,
              tiles_x: int, tiles_y: int):
    """Per-Gaussian tile bbox (tmin_x, tmin_y, tmax_x, tmax_y), exclusive max,
    identical to the span computation in project_gaussians. ``radii`` is
    either the scalar (N,) pixel radius or the per-axis (N, 2) extents."""
    r = radii.astype(xys.dtype)
    if r.ndim == 2:
        rx, ry = r[:, 0], r[:, 1]
    else:
        rx = ry = r
    tmin_x = jnp.clip(((xys[:, 0] - rx) / tile_size).astype(jnp.int32), 0, tiles_x)
    tmax_x = jnp.clip(((xys[:, 0] + rx) / tile_size + 1.0).astype(jnp.int32), 0, tiles_x)
    tmin_y = jnp.clip(((xys[:, 1] - ry) / tile_size).astype(jnp.int32), 0, tiles_y)
    tmax_y = jnp.clip(((xys[:, 1] + ry) / tile_size + 1.0).astype(jnp.int32), 0, tiles_y)
    return tmin_x, tmin_y, tmax_x, tmax_y
