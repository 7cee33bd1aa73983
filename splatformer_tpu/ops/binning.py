"""Tile binning: per-Gaussian tile ranges -> depth-sorted per-tile entry lists.

TPU-native replacement for gsplat's CUDA radix-sort binning (SURVEY.md C14):
no atomics or dynamic allocation — a static entry budget, vectorized scatter
with out-of-range drop, and a single stable multi-key `lax.sort`.

Pipeline:
  1. per-Gaussian tile bbox + capped tile count (tiles_per_gauss)
  2. exclusive cumsum -> entry offsets into a static budget (max_intersects)
  3. vectorized expansion over (N, tiles_per_gauss) local slots -> scatter
     (tile_id, depth, gauss_idx) entries
  4. stable lexicographic sort on (tile_id, depth)  [matches gsplat's
     (tile << 32 | depth_bits) radix sort, which is also stable]
  5. per-tile [start, end) ranges via searchsorted

Entries beyond either cap are dropped and counted (`num_dropped`) — a Gaussian
covering more than `tiles_per_gauss` tiles loses its farthest tiles only.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatformer_tpu.ops.projection import ProjectedGaussians, tile_bbox


class TileBins(NamedTuple):
    gauss_idx: jnp.ndarray   # (max_intersects,) int32, sorted by (tile, depth)
    tile_ids: jnp.ndarray    # (max_intersects,) int32, sentinel = num_tiles
    tile_start: jnp.ndarray  # (num_tiles + 1,) int32 offsets into entry list
    num_entries: jnp.ndarray  # () int32 valid entries
    num_dropped: jnp.ndarray  # () int32 entries lost to caps


def bin_gaussians(
    proj: ProjectedGaussians,
    img_height: int,
    img_width: int,
    tile_size: int,
    max_intersects: int,
    tiles_per_gauss: int,
) -> TileBins:
    n = proj.xys.shape[0]
    tiles_x = (img_width + tile_size - 1) // tile_size
    tiles_y = (img_height + tile_size - 1) // tile_size
    num_tiles = tiles_x * tiles_y
    tpg = min(tiles_per_gauss, num_tiles)

    tmin_x, tmin_y, tmax_x, tmax_y = tile_bbox(
        proj.xys, proj.radii, tile_size, tiles_x, tiles_y)
    alive = proj.num_tiles_hit > 0
    span_w = tmax_x - tmin_x
    count_full = jnp.where(alive, proj.num_tiles_hit, 0)
    count = jnp.minimum(count_full, tpg)
    offsets = jnp.cumsum(count) - count  # exclusive cumsum
    total = offsets[-1] + count[-1] if n > 0 else jnp.int32(0)

    # Local slot s of Gaussian g covers tile (tmin_y + s // w, tmin_x + s % w).
    slots = jnp.arange(tpg, dtype=jnp.int32)[None, :]        # (1, tpg)
    w_safe = jnp.maximum(span_w, 1)[:, None]                 # (N, 1)
    ty = tmin_y[:, None] + slots // w_safe
    tx = tmin_x[:, None] + slots % w_safe
    tile = ty * tiles_x + tx                                  # (N, tpg)
    slot_valid = slots < count[:, None]
    pos = offsets[:, None] + slots                            # (N, tpg)
    pos = jnp.where(slot_valid, pos, max_intersects)          # drop invalid

    sentinel = jnp.int32(num_tiles)
    tile_ids = jnp.full((max_intersects,), sentinel, dtype=jnp.int32)
    depths = jnp.full((max_intersects,), jnp.inf, dtype=proj.depths.dtype)
    gidx = jnp.zeros((max_intersects,), dtype=jnp.int32)

    flat_pos = pos.reshape(-1)
    tile_ids = tile_ids.at[flat_pos].set(tile.reshape(-1).astype(jnp.int32),
                                         mode="drop")
    depth_b = jnp.broadcast_to(proj.depths[:, None], (n, tpg)).reshape(-1)
    depths = depths.at[flat_pos].set(depth_b, mode="drop")
    gidx_b = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, tpg)).reshape(-1)
    gidx = gidx.at[flat_pos].set(gidx_b, mode="drop")

    tile_ids, depths, gidx = jax.lax.sort(
        (tile_ids, depths, gidx), num_keys=2, is_stable=True)

    tile_start = jnp.searchsorted(
        tile_ids, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    num_entries = jnp.minimum(total, max_intersects).astype(jnp.int32)
    num_dropped = (jnp.sum(count_full) - num_entries).astype(jnp.int32)
    return TileBins(gauss_idx=gidx, tile_ids=tile_ids, tile_start=tile_start,
                    num_entries=num_entries, num_dropped=num_dropped)


class PaddedTileBins(NamedTuple):
    """Entry list repacked so every tile's range is chunk-aligned: tile t owns
    [tile_start[t], tile_start[t+1]) with both ends multiples of `chunk`, and
    padding slots inside a range are marked invalid (rendered inert by zero
    opacity). This gives the Pallas kernels exclusive, aligned chunks per tile
    — no cross-tile DMA write races in the backward pass."""

    gauss_idx: jnp.ndarray    # (budget,) int32
    valid: jnp.ndarray        # (budget,) bool
    tile_start: jnp.ndarray   # (num_tiles + 1,) int32, multiples of chunk


def pad_tile_ranges(bins: TileBins, num_tiles: int, chunk: int,
                    max_intersects: int) -> PaddedTileBins:
    budget = max_intersects + num_tiles * chunk
    counts = bins.tile_start[1:] - bins.tile_start[:-1]           # (T,)
    counts_p = ((counts + chunk - 1) // chunk) * chunk
    new_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_p)]).astype(jnp.int32)

    i_total = bins.gauss_idx.shape[0]
    pos = jnp.arange(i_total, dtype=jnp.int32)
    tid = jnp.clip(bins.tile_ids, 0, num_tiles - 1)
    ok = bins.tile_ids < num_tiles
    new_pos = new_start[tid] + (pos - bins.tile_start[tid])
    new_pos = jnp.where(ok, new_pos, budget)

    gidx = jnp.zeros((budget,), jnp.int32).at[new_pos].set(
        bins.gauss_idx, mode="drop")
    valid = jnp.zeros((budget,), bool).at[new_pos].set(ok, mode="drop")
    return PaddedTileBins(gauss_idx=gidx, valid=valid, tile_start=new_start)
