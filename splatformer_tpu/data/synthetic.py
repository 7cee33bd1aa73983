"""Synthetic scene generation for tests and benchmarks.

Produces GaussianScene + Camera batches with the same statistics the real
pipeline yields after normalization (means in [0,1]^3, log-scales around the
normalized splat size, wxyz quats, opacity logits, SH coeffs) — see
/root/reference/dataset/GS.py:190-198 for the normalization contract.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from splatformer_tpu.ops.types import Camera, GaussianScene


def random_scene(rng: np.random.Generator, n: int, sh_degree: int = 1,
                 n_valid: int | None = None,
                 dtype=jnp.float32) -> GaussianScene:
    n_valid = n if n_valid is None else n_valid
    sh_rest = (sh_degree + 1) ** 2 - 1
    mask = np.zeros(n, dtype=bool)
    mask[:n_valid] = True
    scene = GaussianScene(
        means=jnp.asarray(rng.uniform(0.05, 0.95, (n, 3)), dtype),
        scales=jnp.asarray(rng.uniform(-6.5, -4.5, (n, 3)), dtype),
        quats=jnp.asarray(rng.normal(size=(n, 4)), dtype),
        opacities=jnp.asarray(rng.normal(1.0, 1.0, (n, 1)), dtype),
        features_dc=jnp.asarray(rng.normal(0.0, 0.5, (n, 3)), dtype),
        features_rest=jnp.asarray(rng.normal(0.0, 0.1, (n, sh_rest, 3)), dtype),
        mask=jnp.asarray(mask),
    )
    return scene


def look_at_c2w(campos: np.ndarray, target: np.ndarray,
                up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """OpenGL-convention camera-to-world looking from campos at target."""
    forward = target - campos
    forward = forward / np.linalg.norm(forward)
    z = -forward  # OpenGL camera looks down -z
    up = np.asarray(up, dtype=np.float64)
    x = np.cross(up, z)
    if np.linalg.norm(x) < 1e-8:
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0] = x
    c2w[:3, 1] = y
    c2w[:3, 2] = z
    c2w[:3, 3] = campos
    return c2w


def orbit_cameras(n_views: int, height: int, width: int,
                  radius: float = 1.6, elevation_deg: float = 30.0,
                  target=(0.5, 0.5, 0.5), focal: float | None = None,
                  dtype=jnp.float32) -> Camera:
    """A ring of cameras orbiting the unit-cube center (batched Camera)."""
    target = np.asarray(target, dtype=np.float64)
    focal = focal if focal is not None else 1.2 * max(height, width)
    elev = np.deg2rad(elevation_deg)
    c2ws = []
    for i in range(n_views):
        az = 2 * np.pi * i / max(n_views, 1)
        campos = target + radius * np.array([
            np.cos(az) * np.cos(elev), np.sin(az) * np.cos(elev), np.sin(elev)])
        c2ws.append(look_at_c2w(campos, target))
    c2w = jnp.asarray(np.stack(c2ws)[:, :3, :4], dtype)
    ones = jnp.ones((n_views,), dtype)
    return Camera(
        c2w=c2w,
        fx=ones * focal, fy=ones * focal,
        cx=ones * (width / 2.0), cy=ones * (height / 2.0),
        width=width, height=height)


def single_camera(cameras: Camera, i: int) -> Camera:
    return Camera(
        c2w=cameras.c2w[i], fx=cameras.fx[i], fy=cameras.fy[i],
        cx=cameras.cx[i], cy=cameras.cy[i],
        width=cameras.width, height=cameras.height)
