"""Camera math: OpenGL c2w -> OpenCV w2c view matrices, quaternion utilities.

Semantics match /root/reference/utils/gs_utils.py:32-42 (flip y/z then analytic
inverse) and gsplat v0.1.11's wxyz quaternion convention.
"""
from __future__ import annotations

import jax.numpy as jnp


def opengl_c2w_to_opencv_w2c(c2w: jnp.ndarray) -> jnp.ndarray:
    """Convert an OpenGL/Blender camera-to-world matrix to an OpenCV
    world-to-camera (view) matrix.

    Mirrors the reference: flip the y and z camera axes, then invert
    analytically (R^T, -R^T t). Accepts (3,4) or (4,4); returns (4,4).
    """
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    flip = jnp.array([1.0, -1.0, -1.0], dtype=R.dtype)
    R = R * flip[None, :]  # right-multiply by diag(1,-1,-1)
    R_inv = R.T
    t_inv = -jnp.sum(R_inv * t[None, :], axis=-1)  # -R^T t, full f32 on VPU
    view = jnp.eye(4, dtype=R.dtype)
    view = view.at[:3, :3].set(R_inv)
    view = view.at[:3, 3].set(t_inv)
    return view


def normalize_quats(quats: jnp.ndarray) -> jnp.ndarray:
    """Normalize wxyz quaternions; degenerate (near-zero-norm) quats are reset
    to the reference's fallback [0, 0, 0, 1] (/root/reference/utils/gs_utils.py:46-51).

    Note the reference's fallback is expressed in the same wxyz layout it uses
    everywhere (i.e. w=0), which encodes a 180-degree rotation; we reproduce it
    bit-for-bit rather than "fixing" it, since any unit quat is an equally
    arbitrary choice for a degenerate input.
    """
    sq = jnp.sum(quats * quats, axis=-1, keepdims=True)
    ok = sq > 1e-12
    # double-where: sqrt must never see 0 or its NaN gradient leaks through
    # the select (a zero quat would poison adam state for masked slots)
    denom = jnp.sqrt(jnp.where(ok, sq, 1.0))
    fallback = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=quats.dtype)
    safe = jnp.where(ok, quats / denom, fallback)
    return safe


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """wxyz unit quaternions (..., 4) -> rotation matrices (..., 3, 3).

    Matches gsplat v0.1.11 `quat_to_rotmat` (w, x, y, z ordering, as stored in
    nerfstudio 'quats' and consumed at /root/reference/utils/gs_utils.py:82-95).
    """
    w, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> wxyz quaternions (..., 4).

    Branch-free Shepperd-style construction (valid for proper rotations)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw = 0.5 * jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12))
    qx = 0.5 * jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12))
    qy = 0.5 * jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12))
    qz = 0.5 * jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12))
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
