"""Input-level point-cloud downsampling baselines (reference C5,
/root/reference/models/pcd_downsampling_methods.py): FPS + 1-NN assignment,
voxel-grid averaging, random keep — plus the inverse maps that broadcast
backbone logits back to the original points.

TPU redesign: static output capacities (M = ratio * N rounded up to the
patch size), masks for the dynamic remainder, chunked distance matmuls
instead of sklearn CPU NN, and `lax.scan`-based FPS instead of a Python loop.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

_CHUNK = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def nearest_idx(queries: jnp.ndarray, refs: jnp.ndarray,
                ref_mask: jnp.ndarray) -> jnp.ndarray:
    """(N,3) queries -> index of nearest valid ref among (M,3). Chunked over
    queries to bound the (chunk, M) distance matrix."""
    n = queries.shape[0]
    ref2 = jnp.sum(refs * refs, axis=1)
    big = jnp.where(ref_mask, 0.0, jnp.inf)

    def one_chunk(q):
        # HIGHEST: the chip's default-bf16 matmul carries ~4e-3 absolute
        # error on [0,1]-normalized coords — larger than the ~1e-4 squared
        # spacing of a 16k-point cloud, which randomized every nearest-
        # centroid assignment on TPU (the r4 sweep's anomalous flat fps
        # rows: 18.3 dB at 10% reduction; correct on CPU, wrong on chip)
        d = (jnp.sum(q * q, axis=1)[:, None]
             - 2.0 * jnp.matmul(q, refs.T,
                                precision=jax.lax.Precision.HIGHEST)
             + ref2[None, :] + big[None, :])
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    pad = _round_up(n, _CHUNK) - n
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    out = jax.lax.map(one_chunk, qp.reshape(-1, _CHUNK, 3))
    return out.reshape(-1)[:n]


def furthest_point_sampling(coord: jnp.ndarray, mask: jnp.ndarray,
                            m: int) -> jnp.ndarray:
    """(N,3) -> (m,) centroid indices via iterative FPS (reference
    furthest_point_sampling semantics; deterministic start at the first valid
    point instead of a random one). Masked points are never selected."""
    n = coord.shape[0]
    neg = jnp.where(mask, 1e10, -jnp.inf)
    start = jnp.argmax(mask).astype(jnp.int32)

    def step(carry, _):
        dist, farthest = carry
        c = coord[farthest]
        d = jnp.sum((coord - c) ** 2, axis=1)
        dist = jnp.minimum(dist, jnp.where(mask, d, -jnp.inf))
        nxt = jnp.argmax(dist).astype(jnp.int32)
        return (dist, nxt), farthest

    (_, _), centroids = jax.lax.scan(step, (neg, start), None, length=m)
    return centroids


def fps_knn_downsample(coord, feat, mask, ratio: float, patch_mult: int = 128):
    """Returns (ds_coord, ds_feat, ds_mask, assignments). Downsampled points
    are centroid-cluster means (reference fps_knn_downsample)."""
    n = coord.shape[0]
    m_req = max(1, int(n * ratio))
    m = min(_round_up(m_req, patch_mult), _round_up(n, patch_mult))
    centroids = furthest_point_sampling(coord, mask, min(m_req, m))
    c_coord = coord[centroids]
    c_mask = jnp.arange(m, dtype=jnp.int32) < jnp.minimum(
        jnp.sum(mask).astype(jnp.int32), m_req)
    c_coord = jnp.pad(c_coord, ((0, m - c_coord.shape[0]), (0, 0)))
    assign = nearest_idx(coord, c_coord, c_mask)
    assign = jnp.where(mask, assign, m)  # waste bucket

    ones = mask.astype(feat.dtype)
    cnt = jax.ops.segment_sum(ones, assign, num_segments=m + 1)[:m]
    denom = jnp.maximum(cnt, 1.0)[:, None]
    ds_coord = jax.ops.segment_sum(coord * ones[:, None], assign, m + 1)[:m] / denom
    ds_feat = jax.ops.segment_sum(feat * ones[:, None], assign, m + 1)[:m] / denom
    ds_mask = c_mask & (cnt > 0)
    return ds_coord, ds_feat, ds_mask, assign


def voxel_downsample(coord, feat, mask, voxel_size: float,
                     capacity_factor: float = 0.5, patch_mult: int = 128):
    """Voxel-grid average pooling (reference voxel_downsample). Returns
    (ds_coord, ds_feat, ds_mask, assignments) where assignments maps each
    original point to its voxel row."""
    n = coord.shape[0]
    m = min(_round_up(max(patch_mult, int(n * capacity_factor)), patch_mult),
            _round_up(n, patch_mult))
    v = jnp.floor(coord / voxel_size).astype(jnp.int32)
    key = v[:, 0] * 1_000_000 + v[:, 1] * 1_000 + v[:, 2]
    key = jnp.where(mask, key, 2**31 - 1)
    iota = jnp.arange(n, dtype=jnp.int32)
    skey, sidx = jax.lax.sort((key, iota), num_keys=1)
    pos = jnp.arange(n, dtype=jnp.int32)
    valid_sorted = pos < jnp.sum(mask)
    prev = jnp.concatenate([jnp.array([-(2**31 - 1)], jnp.int32), skey[:-1]])
    is_head = valid_sorted & (skey != prev)
    cid_sorted = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    n_vox = jnp.sum(is_head.astype(jnp.int32))
    cid_sorted = jnp.where(valid_sorted & (cid_sorted < m), cid_sorted, m)
    assign = jnp.zeros((n,), jnp.int32).at[sidx].set(cid_sorted)

    ones = mask.astype(feat.dtype)
    cnt = jax.ops.segment_sum(ones, assign, num_segments=m + 1)[:m]
    denom = jnp.maximum(cnt, 1.0)[:, None]
    ds_coord = jax.ops.segment_sum(coord * ones[:, None], assign, m + 1)[:m] / denom
    ds_feat = jax.ops.segment_sum(feat * ones[:, None], assign, m + 1)[:m] / denom
    ds_mask = jnp.arange(m, dtype=jnp.int32) < jnp.minimum(n_vox, m)
    return ds_coord, ds_feat, ds_mask, assign


def random_downsample(coord, feat, mask, ratio: float, rng: jax.Array,
                      patch_mult: int = 128):
    """Random keep (reference random_downsample); map-back is 1-NN."""
    n = coord.shape[0]
    m = min(_round_up(max(1, int(n * ratio)), patch_mult),
            _round_up(n, patch_mult))
    score = jnp.where(mask, jax.random.uniform(rng, (n,)), jnp.inf)
    _, order = jax.lax.sort((score, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    keep = order[:m]
    n_keep = jnp.minimum(jnp.sum(mask).astype(jnp.int32), int(n * ratio))
    ds_mask = jnp.arange(m, dtype=jnp.int32) < n_keep
    return coord[keep], feat[keep], ds_mask, keep


def downsample_dispatch(method: str, info: Dict[str, Any], coord, feat, mask,
                        rng: Optional[jax.Array] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                   Callable[[jnp.ndarray], jnp.ndarray]]:
    """Dispatch used by FeaturePredictor (feature_predictor.py:159-196 in the
    reference). Returns (coord, feat, mask, upsample_fn) where upsample_fn
    maps backbone logits on the reduced set back to the original points."""
    if method == "voxel":
        vc, vf, vm, assign = voxel_downsample(
            coord, feat, mask, float(info["voxel_size"]),
            capacity_factor=float(info.get("voxel_capacity_factor", 0.5)))
        m = vc.shape[0]

        def up(y):
            safe = jnp.clip(assign, 0, m - 1)
            return jnp.where((assign < m)[:, None], y[safe], 0.0)

        return vc, vf, vm, up
    if method == "fps":
        fc, ff, fm, assign = fps_knn_downsample(
            coord, feat, mask, float(info["downsample_ratio"]))
        m = fc.shape[0]

        def up(y):
            safe = jnp.clip(assign, 0, m - 1)
            return jnp.where((assign < m)[:, None], y[safe], 0.0)

        return fc, ff, fm, up
    if method == "random":
        if rng is None:
            rng = jax.random.key(0)
        rc, rf, rm, keep = random_downsample(
            coord, feat, mask, float(info["downsample_ratio"]), rng)

        def up(y):
            nn_idx = nearest_idx(coord, rc, rm)
            return y[nn_idx]

        return rc, rf, rm, up
    raise NotImplementedError(method)
