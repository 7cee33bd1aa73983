"""PointBatch — the static-shape equivalent of Pointcept's `Point` structure.

The reference `Point` (SURVEY.md §2.4) is a dict of dynamically-sized tensors
with offsets marking batch boundaries. TPU-native redesign: one scene per
device slot, every array padded to a static N with a validity mask; the
four-order serialization is precomputed as (orders, N) permutations.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from splatformer_tpu.ops.serialization import ORDERS, serialize


@struct.dataclass
class PointBatch:
    coord: jnp.ndarray         # (N, 3) float in [0, 1]
    grid_coord: jnp.ndarray    # (N, 3) int32
    feat: jnp.ndarray          # (N, C)
    mask: jnp.ndarray          # (N,) bool, True = real point
    n_valid: jnp.ndarray       # () int32; real points occupy serialized [0, n)
    codes: jnp.ndarray         # (num_orders, N) int32 SFC keys
    order_perm: jnp.ndarray    # (num_orders, N) int32
    inverse_perm: jnp.ndarray  # (num_orders, N) int32

    @property
    def num_points(self) -> int:
        return self.feat.shape[0]


def make_point_batch(
    coord: jnp.ndarray,
    feat: jnp.ndarray,
    mask: jnp.ndarray,
    grid_resolution: int = 384,
    orders: Sequence[str] = ORDERS,
    depth: int = 10,
    shuffle_rng: Optional[jax.Array] = None,
) -> PointBatch:
    """Build a PointBatch from normalized coordinates.

    grid_coord = floor(coord * grid_resolution), the reference's voxelization
    (/root/reference/models/feature_predictor.py:156)."""
    grid_coord = jnp.floor(coord * grid_resolution).astype(jnp.int32)
    grid_coord = jnp.clip(grid_coord, 0, (1 << depth) - 1)
    codes, order_perm, inverse_perm = serialize(
        grid_coord, mask, orders, depth, shuffle_rng)
    return PointBatch(
        coord=coord, grid_coord=grid_coord, feat=feat, mask=mask,
        n_valid=jnp.sum(mask).astype(jnp.int32),
        codes=codes, order_perm=order_perm, inverse_perm=inverse_perm)
