"""Submanifold sparse 3D convolution over voxelized point sets.

TPU-native replacement for spconv-cu118 (SURVEY.md C15): instead of GPU hash
tables + gather/scatter kernels, we build a static-shape neighbor index map
once per stage (sort + vectorized binary search over packed voxel keys) and
express the conv itself as K gather+matmul accumulations — all MXU work,
fully differentiable through autodiff.

Used for (a) PTv3's xCPE positional encoding (3x3x3, one shared neighbor map
per stage — cpe_indice_key semantics of
/root/reference/models/pointtransformer_v3.py:316,367), and (b) the SpUNet
backbone.

Deviation from spconv noted: points sharing a voxel are kept as separate
sites (the reference feeds possibly-duplicate grid coords into
SparseConvTensor, whose behavior for duplicates is itself undefined);
neighbor lookups resolve to the first point of the neighbor voxel, and the
center tap is the point itself.
"""
from __future__ import annotations

import itertools
from typing import Tuple

import jax
import jax.numpy as jnp

_COORD_BITS = 10  # voxel coords < 1024 (grid_resolution 384 in the reference)
_INVALID_KEY = jnp.int32(2**31 - 1)


def pack_voxel_key(grid_coord: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) int voxel coords -> unique int32 key; masked -> INVALID."""
    g = grid_coord.astype(jnp.int32)
    key = g[:, 0] | (g[:, 1] << _COORD_BITS) | (g[:, 2] << (2 * _COORD_BITS))
    return jnp.where(mask, key, _INVALID_KEY)


def conv_offsets(kernel_size: int = 3) -> jnp.ndarray:
    """(K, 3) int offsets of a cubic kernel, center included, row-major."""
    r = kernel_size // 2
    offs = list(itertools.product(range(-r, r + 1), repeat=3))
    return jnp.asarray(offs, dtype=jnp.int32)


def build_neighbor_map(grid_coord: jnp.ndarray, mask: jnp.ndarray,
                       kernel_size: int = 3) -> jnp.ndarray:
    """For each point, the index of a point in each neighboring voxel.

    Returns (N, K) int32; -1 where the neighbor voxel is unoccupied (or the
    point itself is masked). The center offset maps to the point itself.
    """
    n = grid_coord.shape[0]
    keys = pack_voxel_key(grid_coord, mask)
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_keys, sorted_idx = jax.lax.sort((keys, iota), num_keys=1)

    offs = conv_offsets(kernel_size)  # (K, 3)
    k = offs.shape[0]
    center = k // 2
    nbr_coord = grid_coord[:, None, :].astype(jnp.int32) + offs[None, :, :]
    in_range = jnp.all((nbr_coord >= 0) & (nbr_coord < (1 << _COORD_BITS)),
                       axis=-1)
    nbr_key = (nbr_coord[..., 0]
               | (nbr_coord[..., 1] << _COORD_BITS)
               | (nbr_coord[..., 2] << (2 * _COORD_BITS)))  # (N, K)
    pos = jnp.searchsorted(sorted_keys, nbr_key)            # (N, K)
    pos_c = jnp.clip(pos, 0, n - 1)
    found = (sorted_keys[pos_c] == nbr_key) & in_range & mask[:, None]
    nbr = jnp.where(found, sorted_idx[pos_c], -1)
    # center tap: the point itself (not another occupant of the same voxel)
    self_idx = jnp.where(mask, iota, -1)
    nbr = nbr.at[:, center].set(self_idx)
    return nbr


def sparse_conv_apply(feat: jnp.ndarray, nbr: jnp.ndarray,
                      weight: jnp.ndarray, bias: jnp.ndarray | None = None
                      ) -> jnp.ndarray:
    """Apply a submanifold conv given a neighbor map.

    feat (N, Cin), nbr (N, K), weight (K, Cin, Cout), bias (Cout,).
    Missing neighbors contribute zero. Accumulates one offset at a time to
    bound memory at O(N * Cin) instead of O(N * K * Cin).
    """
    n, cin = feat.shape
    k, _, cout = weight.shape
    out = jnp.zeros((n, cout), dtype=feat.dtype)
    for j in range(k):
        idx = nbr[:, j]
        ok = idx >= 0
        g = feat[jnp.maximum(idx, 0)]
        g = jnp.where(ok[:, None], g, 0.0)
        out = out + jnp.dot(g, weight[j], preferred_element_type=feat.dtype)
    if bias is not None:
        out = out + bias
    return out
