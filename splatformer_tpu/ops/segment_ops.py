"""Segment reductions and patch-padding utilities.

TPU-native replacements for torch_scatter's `segment_csr` (SURVEY.md C17) and
Pointcept's `get_padding_and_inverse` — everything static-shape with masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data, segment_ids, num_segments, fill=0.0):
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    # empty segments yield -inf; replace with fill for downstream stability
    return jnp.where(jnp.isfinite(out), out, fill)


def segment_mean(data, segment_ids, num_segments):
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    cnt = jax.ops.segment_sum(jnp.ones(data.shape[:1], data.dtype), segment_ids,
                              num_segments=num_segments)
    return s / jnp.maximum(cnt, 1.0)[(...,) + (None,) * (data.ndim - 1)]


def pad_order_for_patches(order_perm: jnp.ndarray, n_valid: jnp.ndarray,
                          patch_size: int) -> jnp.ndarray:
    """Fill the fake slots of the boundary patch with duplicates of that
    patch's real points.

    `order_perm` is a serialized permutation with the `n_valid` real points
    occupying positions [0, n_valid) (serialization gives padded points the
    maximal key). Pointcept's SerializedAttention pads each sequence to a
    multiple of patch_size by re-using points of the incomplete tail patch
    (Point.get_padding_and_inverse, SURVEY.md §2.4); we reproduce that with a
    cyclic duplication so the tail patch attends over real points only.
    Positions in fully-fake patches are left as-is (their attention output is
    garbage that the inverse scatter never reads).
    """
    n = order_perm.shape[0]
    k = patch_size
    idx = jnp.arange(n, dtype=jnp.int32)
    m = n_valid % k                        # real points in the tail patch
    patch_start = n_valid - m
    dup = patch_start + (idx - patch_start) % jnp.maximum(m, 1)
    use_dup = (idx >= n_valid) & (idx < patch_start + k) & (m > 0)
    src = jnp.where(use_dup, dup, idx)
    return order_perm[src]
