"""Depth-ordered alpha compositing over binned tiles — pure-JAX path.

This is the differentiable, XLA-compiled fallback/oracle for the Pallas
kernel: vmap over tiles, `lax.scan` over fixed-size entry chunks, with the
within-chunk front-to-back recurrence closed into vector form:

  For chunk entries i with effective alpha a_i (0 where skipped):
    T_incl_i = T_in * prod_{j<=i} (1 - a_j)          (cumprod)
    crossing  i*: first ok entry with T_incl <= 1e-4  (cumsum of bools)
    contrib: ok & before i*            vis_i = a_i * T_excl_i

which reproduces gsplat v0.1.11's per-pixel loop exactly (the crossing entry
is skipped and terminates the pixel). The chunk body is `jax.checkpoint`ed so
the backward pass stores only O(pixels) carry per chunk instead of the (C, P)
alpha matrices.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def composite_tiles(
    entry_xy: jnp.ndarray,      # (I + chunk, 2) entry-gathered, sorted
    entry_conic: jnp.ndarray,   # (I + chunk, 3)
    entry_color: jnp.ndarray,   # (I + chunk, 3)
    entry_opac: jnp.ndarray,    # (I + chunk,)
    tile_start: jnp.ndarray,    # (num_tiles + 1,)
    img_height: int,
    img_width: int,
    tile_size: int,
    background: jnp.ndarray,    # (3,)
    max_per_tile: int = 4096,
    chunk_size: int = 64,
    alpha_threshold: float = 1.0 / 255.0,
    max_alpha: float = 0.999,
    transmittance_eps: float = 1e-4,
):
    """Returns (rgb (H, W, 3), alpha (H, W)). Entry arrays must be padded by
    at least ``chunk_size`` rows past the entry budget so dynamic slices never
    clamp (binning pads with sentinel entries)."""
    ts = tile_size
    tiles_x = (img_width + ts - 1) // ts
    tiles_y = (img_height + ts - 1) // ts
    num_tiles = tiles_x * tiles_y
    n_pix = ts * ts
    n_chunks = max(1, (max_per_tile + chunk_size - 1) // chunk_size)
    dtype = entry_xy.dtype

    # Pixel coordinates within a tile (row-major), integer-pixel convention.
    jj = jnp.arange(n_pix, dtype=jnp.int32)
    local_x = (jj % ts).astype(dtype)
    local_y = (jj // ts).astype(dtype)

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk_step(carry, idx0, n_t, k, pxs, pys):
        rgb_acc, T, done = carry
        start = (idx0 + k * chunk_size).astype(jnp.int32)
        zero = jnp.int32(0)
        xy = jax.lax.dynamic_slice(entry_xy, (start, zero), (chunk_size, 2))
        conic = jax.lax.dynamic_slice(entry_conic, (start, zero), (chunk_size, 3))
        color = jax.lax.dynamic_slice(entry_color, (start, zero), (chunk_size, 3))
        opac = jax.lax.dynamic_slice(entry_opac, (start,), (chunk_size,))
        j = jnp.arange(chunk_size, dtype=jnp.int32)
        valid = (k * chunk_size + j) < n_t  # (C,)

        dx = xy[:, 0:1] - pxs[None, :]  # (C, P)
        dy = xy[:, 1:2] - pys[None, :]
        sigma = (0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy)
                 + conic[:, 1:2] * dx * dy)
        # sigma clamped, not sign-masked: see naive.py (PSD conics)
        sigma = jnp.maximum(sigma, 0.0)
        alpha = jnp.minimum(max_alpha, opac[:, None] * jnp.exp(-sigma))
        ok = valid[:, None] & (alpha >= alpha_threshold)
        a = jnp.where(ok, alpha, 0.0)
        om = 1.0 - a
        T_incl = jnp.cumprod(om, axis=0) * T[None, :]
        cross = ok & (T_incl <= transmittance_eps)
        seen_cross = (jnp.cumsum(cross.astype(jnp.int32), axis=0)
                      - cross.astype(jnp.int32)) > 0
        contrib = ok & jnp.logical_not(done[None, :] | seen_cross | cross)
        T_excl = jnp.concatenate([T[None, :], T_incl[:-1]], axis=0)
        vis = jnp.where(contrib, a * T_excl, 0.0)
        rgb_acc = rgb_acc + jnp.einsum("cp,cd->pd", vis, color,
                                       precision=jax.lax.Precision.HIGHEST)
        T = T * jnp.prod(jnp.where(contrib, om, 1.0), axis=0)
        done = done | jnp.any(cross, axis=0)
        return (rgb_acc, T, done)

    def render_tile(t):
        idx0 = tile_start[t]
        n_t = jnp.minimum(tile_start[t + 1] - idx0, max_per_tile)
        tx = (t % tiles_x).astype(dtype)
        ty = (t // tiles_x).astype(dtype)
        pxs = tx * ts + local_x
        pys = ty * ts + local_y

        def body(carry, k):
            return chunk_step(carry, idx0, n_t, k, pxs, pys), None

        init = (jnp.zeros((n_pix, 3), dtype=dtype),
                jnp.ones((n_pix,), dtype=dtype),
                jnp.zeros((n_pix,), dtype=bool))
        (rgb_acc, T, _), _ = jax.lax.scan(
            body, init, jnp.arange(n_chunks, dtype=jnp.int32))
        rgb = rgb_acc + T[:, None] * background[None, :]
        return rgb, 1.0 - T

    tile_rgb, tile_alpha = jax.vmap(render_tile)(
        jnp.arange(num_tiles, dtype=jnp.int32))

    # (num_tiles, P, 3) -> (H_pad, W_pad, 3) -> crop
    rgb = (tile_rgb.reshape(tiles_y, tiles_x, ts, ts, 3)
           .transpose(0, 2, 1, 3, 4)
           .reshape(tiles_y * ts, tiles_x * ts, 3))
    alpha = (tile_alpha.reshape(tiles_y, tiles_x, ts, ts)
             .transpose(0, 2, 1, 3)
             .reshape(tiles_y * ts, tiles_x * ts))
    return rgb[:img_height, :img_width], alpha[:img_height, :img_width]
