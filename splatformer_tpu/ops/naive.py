"""Per-pixel reference compositing renderer — the correctness oracle.

Composites every Gaussian for every pixel in global depth order with a
`lax.scan` (no tiling, no culling beyond the radius>0 check). O(H*W*N): only
for tests/small scenes. Implements exactly gsplat v0.1.11 rasterize_gaussians
forward semantics (alpha clamp 0.999, skip below 1/255, stop at T < 1e-4) —
see SURVEY.md C14 and /root/reference/utils/gs_utils.py:96-109.

Differentiable via autodiff (scan is reverse-differentiable); note autodiff
through the early-stop masking matches gsplat's backward, which also only
accumulates gradients for Gaussians in front of the termination point.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from splatformer_tpu.ops.projection import ProjectedGaussians


def composite_pixels_naive(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,     # (N, 3) post-SH rgb
    opacities: jnp.ndarray,  # (N,) post-sigmoid
    img_height: int,
    img_width: int,
    background: jnp.ndarray,  # (3,)
    alpha_threshold: float = 1.0 / 255.0,
    max_alpha: float = 0.999,
    transmittance_eps: float = 1e-4,
):
    """Returns (rgb (H, W, 3), alpha (H, W))."""
    order = jnp.argsort(proj.depths)
    xys = proj.xys[order]
    conics = proj.conics[order]
    cols = colors[order]
    opac = opacities[order]
    live = (proj.radii[order] > 0) & jnp.isfinite(proj.depths[order])

    ys = jnp.arange(img_height, dtype=xys.dtype)
    xs = jnp.arange(img_width, dtype=xys.dtype)
    px, py = jnp.meshgrid(xs, ys)  # (H, W)

    def step(carry, g):
        rgb_acc, T, done = carry
        xy, conic, col, op, ok = g
        dx = xy[0] - px
        dy = xy[1] - py
        sigma = 0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) + conic[1] * dx * dy
        # Conics are PSD by construction (+0.3 blur), so true sigma >= 0 and
        # gsplat's `sigma < 0 -> skip` can only trip on rounding noise — a
        # knife edge where a full splat toggles on the f32 evaluation order
        # (pixels at splat centers). Clamping is equivalent up to rounding
        # and makes every evaluation order agree.
        sigma = jnp.maximum(sigma, 0.0)
        alpha = jnp.minimum(max_alpha, op * jnp.exp(-sigma))
        # gsplat: skip if alpha < 1/255; the Gaussian whose accumulation
        # would push T <= 1e-4 is itself skipped and terminates the pixel
        # (forward.cu: next_T <= 1e-4 -> break before accumulate).
        alpha_ok = ok & (alpha >= alpha_threshold)
        next_T = T * (1.0 - alpha)
        crosses = alpha_ok & (next_T <= transmittance_eps)
        contrib = alpha_ok & jnp.logical_not(done) & jnp.logical_not(crosses)
        done = done | crosses
        alpha = jnp.where(contrib, alpha, 0.0)
        vis = alpha * T
        rgb_acc = rgb_acc + vis[..., None] * col[None, None, :]
        T = T * (1.0 - alpha)
        return (rgb_acc, T, done), None

    init = (jnp.zeros((img_height, img_width, 3), dtype=xys.dtype),
            jnp.ones((img_height, img_width), dtype=xys.dtype),
            jnp.zeros((img_height, img_width), dtype=bool))
    (rgb_acc, T, _), _ = jax.lax.scan(step, init, (xys, conics, cols, opac, live))
    rgb = rgb_acc + T[..., None] * background[None, None, :]
    return rgb, 1.0 - T
