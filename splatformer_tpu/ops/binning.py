"""Tile binning: per-Gaussian tile ranges -> depth-sorted per-tile entry lists.

TPU-native replacement for gsplat's CUDA radix-sort binning (SURVEY.md C14),
designed around measured TPU primitive costs: `lax.sort` is fast (~1.7 ms for
262k key/value pairs on v5e) while scatters run at ~100M elem/s on the scalar
core — so this pipeline is built exclusively from sorts, gathers and
searchsorted; no scatter touches the hot path.

Pipeline:
  1. per-Gaussian tile bbox + tile counts;
  2. tiered candidate expansion (static shapes, no scatter):
     every Gaussian emits its first S1 tile slots; the top-K2 Gaussians by
     tile count emit slots [S1, S2); the top-K3 emit [S2, tiles_per_gauss).
     Object-scan scenes have tiny splats (1-4 tiles), so tier 1 covers almost
     everything and the tiers bound worst-case cost; overflow beyond a
     Gaussian's tier is cropped and counted in `num_dropped`;
  3. two int32 sort keys per candidate: tile id and the full-fidelity f32
     depth (monotone bitcast trick; ties break by Gaussian index via the
     stable sort, matching gsplat's 64-bit (tile, depth32) radix sort);
  4. single stable two-key `lax.sort` over all candidates; invalid slots
     carry the sentinel tile and sort to the tail; truncate to the
     max_intersects budget by key threshold;
  5. per-tile [start, end) ranges via searchsorted.

The Pallas kernels consume this entry list directly (unpadded): each tile
DMAs the 128-aligned chunk windows covering its [start, end) range and masks
out-of-range lanes, so no padded repack of the entry list is needed (an
earlier design's repack cost two budget-sized descriptor-rate gathers,
~14 ms/iter at bench scale).
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
    # exclusive-cumsum boundaries of each Gaussian's entry count among the
    # valid entries when they are re-sorted by Gaussian id: (N + 1,) int32.
    # Exact by construction (key-threshold truncation, see bin_gaussians), so
    # the render backward can reduce per-entry gradients to per-Gaussian ones
    # with one sort + cumsum + boundary gathers instead of a scatter-add
    # (measured 23 ms/view scatter vs ~2 ms/view sorted segment-sum on v5e).
    gauss_starts: jnp.ndarray


# tier structure: (slots covered by every Gaussian, then top-K2 / top-K3 by
# tile count). S3 is min(tiles_per_gauss, num_tiles). Baseline sizing:
# object-scan scenes with the reference's max_scale clamp measure <= 9
# tiles/Gaussian at 256^2 with ~0.25% of Gaussians above 4 (bench scene
# histogram); K2/K3 give 16x/8x margin over that. At higher resolutions a
# splat's pixel radius grows linearly, so its tile count grows ~linearly in
# image area for large splats and stays ~1 for sub-tile splats —
# `auto_tiers` scales the slot caps by sqrt(area ratio) (the geometric
# middle of those regimes) and the top-K counts likewise. Candidates beyond
# a Gaussian's tier are dropped and counted in num_dropped, so under-sizing
# is observable (and surfaced into train metrics / eval logs), not silent.
TIER1_SLOTS = 4
TIER2_K, TIER2_SLOTS = 4096, 16
TIER3_K = 512
_BASE_TILES = 256  # 256^2 image at tile_size 16


def auto_tiers(num_tiles: int) -> tuple:
    """(tier1_slots, tier2_k, tier2_slots, tier3_k) scaled from the 256^2
    baseline by sqrt(tiles-per-image ratio)."""
    import math
    f = max(1.0, math.sqrt(num_tiles / _BASE_TILES))
    return (int(math.ceil(TIER1_SLOTS * f)), int(math.ceil(TIER2_K * f)),
            int(math.ceil(TIER2_SLOTS * f)), int(math.ceil(TIER3_K * f)))


def cumsum_1d_i32(x: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """Inclusive cumsum of a 1-D int32 array, fast on TPU.

    XLA lowers large 1-D cumsums (int or float) to a slow reduce-window
    (measured ~6 ms at 400k on v5e); a blocked 2-D cumsum along lanes plus a
    tiny block-offset pass is ~20x faster. Accumulates in f32 — exact while
    the total stays below 2^24 (entry budgets are far below that).
    """
    n = x.shape[0]
    rows = (n + block - 1) // block
    xf = jnp.pad(x.astype(jnp.float32), (0, rows * block - n))
    x2 = xf.reshape(rows, block)
    row_cs = jnp.cumsum(x2, axis=1)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(row_cs[:, -1])[:-1]])
    return (row_cs + offs[:, None]).reshape(-1)[:n].astype(jnp.int32)


def depth_key_i32(depths: jnp.ndarray) -> jnp.ndarray:
    """Monotone positive-float -> int32 key, FULL f32 fidelity (bitcast
    trick: positive IEEE floats compare like their bit patterns). Shared by
    binning and the gauss-axis sharded exchange (parallel/gauss_shard.py),
    which must agree on the ordering to merge per-shard sorted runs.

    Full fidelity matters: quantized depth keys reorder near-tied splats vs
    gsplat's 32-bit depth radix sort, which measurably changes images at
    transmittance-critical pixels (0.13 max pixel diff at 22 bits on a
    100k-splat scene)."""
    return jax.lax.bitcast_convert_type(
        jnp.where(jnp.isfinite(depths),
                  jnp.maximum(depths, 0.0), jnp.inf).astype(jnp.float32),
        jnp.int32)


def bin_gaussians(
    proj: ProjectedGaussians,
    img_height: int,
    img_width: int,
    tile_size: int,
    max_intersects: int,
    tiles_per_gauss: int,
    tile_offset: jnp.ndarray | None = None,
    num_images: int = 1,
    tiers: tuple | None = None,
) -> TileBins:
    """Bin (Gaussian, tile) pairs into a depth-sorted per-tile entry list.

    Multi-view flattening: with ``num_images`` V > 1 the caller concatenates
    the V per-view projections along the Gaussian axis and passes a
    per-Gaussian ``tile_offset`` (= view * tiles_per_image) — binning then
    treats the batch as ONE virtual image of V * tiles_per_image tiles, so
    the whole batch costs one sort / one searchsorted instead of V vmapped
    ones (batched `lax.sort` measured ~5x slower than flat on v5e).
    ``max_intersects`` is the TOTAL budget across views.
    """
    n = proj.xys.shape[0]
    tiles_x = (img_width + tile_size - 1) // tile_size
    tiles_y = (img_height + tile_size - 1) // tile_size
    num_tiles = tiles_x * tiles_y          # per image
    total_tiles = num_tiles * num_images

    t1, t2k, t2s, t3k = tiers if tiers is not None else auto_tiers(num_tiles)
    s1 = min(t1, tiles_per_gauss, num_tiles)
    s2 = min(t2s, tiles_per_gauss, num_tiles)
    s3 = min(tiles_per_gauss, num_tiles)
    k2 = min(t2k * num_images, n)
    k3 = min(t3k * num_images, n)

    tmin_x, tmin_y, tmax_x, tmax_y = tile_bbox(
        proj.xys, proj.radii_xy, tile_size, tiles_x, tiles_y)
    alive = proj.num_tiles_hit > 0
    span_w = jnp.maximum(tmax_x - tmin_x, 1)
    count = jnp.where(alive, proj.num_tiles_hit, 0)

    # two-key lexicographic sort (tile, full-fidelity f32 depth): gsplat
    # packs (tile << 32 | depth_bits32) for a 64-bit radix sort; lax.sort
    # with num_keys=2 gives the identical order from two int32 keys without
    # int64 emulation, and removes any image-size limit on key bits
    sentinel_tile = jnp.int32(total_tiles + 1)
    depth_k = depth_key_i32(proj.depths)

    all_idx = jnp.arange(n, dtype=jnp.int32)

    def tier_candidates(g_idx, slot_lo: int, slot_hi: int):
        """Candidate (tile, gauss) rows for slots [slot_lo, slot_hi) of the
        given Gaussians — pure gathers/broadcasts. ``g_idx=None`` means all
        Gaussians in order: arrays are used directly (x[arange(n)] would
        otherwise compile to a real descriptor-rate gather, ~3.4 ms per
        array at 400k on v5e)."""
        slots = jnp.arange(slot_lo, slot_hi, dtype=jnp.int32)[None, :]
        take = (lambda x: x) if g_idx is None else (lambda x: x[g_idx])
        w = take(span_w)[:, None]
        ty = take(tmin_y)[:, None] + slots // w
        tx = take(tmin_x)[:, None] + slots % w
        tile = ty * tiles_x + tx
        if tile_offset is not None:
            tile = tile + take(tile_offset)[:, None]
        valid = slots < take(count)[:, None]
        tile = jnp.where(valid, tile, sentinel_tile)
        # invalid slots carry depth 0 so the (tile, depth) threshold compare
        # treats every sentinel candidate identically
        dep = jnp.where(valid, take(depth_k)[:, None], 0)
        gid = jnp.broadcast_to(
            (all_idx if g_idx is None else g_idx)[:, None], tile.shape)
        return tile.reshape(-1), dep.reshape(-1), gid.reshape(-1)

    tiles1, dep1, gid1 = tier_candidates(None, 0, s1)
    parts_t, parts_d, parts_g = [tiles1], [dep1], [gid1]
    if s2 > s1 or s3 > s2:
        # one descending argsort serves both tiers (prefix-nested, so a
        # tier-3 Gaussian always also emitted its tier-2 slots); two top_k
        # calls cost two sorts and can disagree on ties. When the bit
        # budget allows, pack (count, idx) into ONE int32 key — a
        # single-array sort runs ~2x faster than the key/value pair sort
        # on TPU (identical order: count descending, ties by index).
        cbits = num_tiles.bit_length()       # count <= tiles per image
        nbits = max((n - 1).bit_length(), 1)
        if cbits + nbits <= 31:
            packed = ((num_tiles - count) << nbits) | all_idx
            by_count = jax.lax.sort(packed, dimension=0) & ((1 << nbits) - 1)
        else:
            _, by_count = jax.lax.sort_key_val(-count, all_idx)
    if s2 > s1:
        idx2 = by_count[:k2]
        tiles2, dep2, gid2 = tier_candidates(idx2, s1, s2)
        parts_t.append(tiles2)
        parts_d.append(dep2)
        parts_g.append(gid2)
    if s3 > s2:
        idx3 = by_count[:k3]
        tiles3, dep3, gid3 = tier_candidates(idx3, s2, s3)
        parts_t.append(tiles3)
        parts_d.append(dep3)
        parts_g.append(gid3)

    tiles_c = jnp.concatenate(parts_t)
    deps_c = jnp.concatenate(parts_d)
    gidx = jnp.concatenate(parts_g)
    if tiles_c.shape[0] < max_intersects + 1:
        pad = max_intersects + 1 - tiles_c.shape[0]
        tiles_c = jnp.concatenate([tiles_c, jnp.full((pad,), sentinel_tile,
                                                     jnp.int32)])
        deps_c = jnp.concatenate([deps_c, jnp.zeros((pad,), jnp.int32)])
        gidx = jnp.concatenate([gidx, jnp.zeros((pad,), jnp.int32)])

    tiles_s, deps_s, gidx = jax.lax.sort(
        (tiles_c, deps_c, gidx), dimension=0, num_keys=2, is_stable=True)
    # Key-threshold truncation: keep entries lexicographically below the
    # first (tile, depth) pair past the budget. Unlike position-truncation
    # this makes the surviving set a *pure function of each candidate's
    # key*, so exact per-Gaussian surviving counts are computable in
    # candidate space below (at the cost of also dropping budget-boundary
    # ties — only reachable when the budget already overflows, which drops
    # entries either way).
    t_star = tiles_s[max_intersects]
    d_star = deps_s[max_intersects]

    def below_star(tile, dep):
        return (tile < t_star) | ((tile == t_star) & (dep < d_star))

    entry_valid = below_star(tiles_s[:max_intersects],
                             deps_s[:max_intersects])
    gidx = gidx[:max_intersects]
    tile_ids = jnp.where(entry_valid, tiles_s[:max_intersects],
                         total_tiles).astype(jnp.int32)

    tile_start = jnp.searchsorted(
        tile_ids, jnp.arange(total_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    # exact per-Gaussian surviving-entry counts, computed tier-by-tier in
    # the structured candidate layout (reshape-sum; no segment reduction)
    counts_surv = jnp.sum(
        below_star(tiles1, dep1).reshape(n, s1).astype(jnp.int32), axis=1)
    if s2 > s1:
        counts_surv = counts_surv.at[idx2].add(jnp.sum(
            below_star(tiles2, dep2).reshape(k2, s2 - s1).astype(jnp.int32),
            axis=1))
    if s3 > s2:
        counts_surv = counts_surv.at[idx3].add(jnp.sum(
            below_star(tiles3, dep3).reshape(k3, s3 - s2).astype(jnp.int32),
            axis=1))
    gauss_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         cumsum_1d_i32(counts_surv)])

    num_entries = gauss_starts[-1]
    num_dropped = (jnp.sum(count) - num_entries).astype(jnp.int32)
    return TileBins(gauss_idx=gidx, tile_ids=tile_ids, tile_start=tile_start,
                    num_entries=num_entries, num_dropped=num_dropped,
                    gauss_starts=gauss_starts)


