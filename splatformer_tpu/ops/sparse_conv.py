"""Submanifold sparse 3D convolution over voxelized point sets.

TPU-native replacement for spconv-cu118 (SURVEY.md C15): instead of GPU hash
tables + gather/scatter kernels, we build a static-shape neighbor structure
once per stage and express the conv itself as K gather+matmul accumulations —
all MXU work.

Neighbor-map construction is a SORT-JOIN, not a binary search: XLA lowers
`jnp.searchsorted` to a log2(N)-round while-loop of full-width gathers, which
measured ~60 ms per stage at 100k points / 2.7M queries on v5e (the single
most expensive op family in a train step). The join sorts point keys and
query keys together (one 2-key sort), propagates the last point position with
a blocked running max, and restores query order with a second sort — ~10x
less device time for identical results.

The conv backward is scatter-free and EXACT (matches the autodiff transpose,
measured 30-80 ms of XLA scatter-add per block at stage-0 scale):
  * each point's neighbor entry points at its neighbor voxel's REPRESENTATIVE
    (min original index), so the cotangent each representative receives is the
    VOXEL SUM of the output cotangent over that voxel's occupants, convolved
    with the flipped kernel (conv_offsets is symmetric: offs[K-1-k] == -offs[k],
    so the transpose of "gather at +o" is "gather at -o");
  * voxel sums come from the build's sorted order: a blocked cumsum over the
    sorted cotangent rows differenced at group boundaries — no scatter;
  * the same flipped gather also yields the weight gradient:
    dW[k] = sum_i is_rep[i] * feat[i] (x) VoxSum(g)[nbr[flip(k), i]],
    so the backward needs only ONE K-tap gather pass (the autodiff backward
    re-gathers feat K times AND scatter-adds K times).

Used for (a) PTv3's xCPE positional encoding (3x3x3, one shared neighbor
structure per stage — cpe_indice_key semantics of
/root/reference/models/pointtransformer_v3.py:316,367), and (b) the SpUNet
backbone.

Deviation from spconv noted: points sharing a voxel are kept as separate
sites (the reference feeds possibly-duplicate grid coords into
SparseConvTensor, whose behavior for duplicates is itself undefined);
neighbor lookups resolve to the min-index occupant of the neighbor voxel, and
the center tap is the point itself.
"""
from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_COORD_BITS = 10  # voxel coords < 1024 (grid_resolution 384 in the reference)
_INVALID_KEY = jnp.int32(2**31 - 1)
_I32_MIN = jnp.iinfo(jnp.int32).min


class ConvStructure(NamedTuple):
    """Static per-stage neighbor structure consumed by sparse_conv_apply.

    nbr        (N, K) int32  index of the neighbor voxel's representative for
                             each offset; center tap = the point itself; -1
                             where the neighbor voxel is unoccupied or the
                             point is masked.
    sort_perm  (N,)   int32  original index of the point at each key-sorted slot.
    pos        (N,)   int32  key-sorted slot of each original point.
    group_end  (N,)   int32  sorted space: one-past-end slot of the slot's
                             equal-key group.
    is_rep     (N,)   bool   original space: point is its voxel's
                             representative (and unmasked).
    """

    nbr: jnp.ndarray
    sort_perm: jnp.ndarray
    pos: jnp.ndarray
    group_end: jnp.ndarray
    is_rep: jnp.ndarray


def pack_voxel_key(grid_coord: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) int voxel coords -> unique int32 key; masked -> INVALID."""
    g = grid_coord.astype(jnp.int32)
    key = g[:, 0] | (g[:, 1] << _COORD_BITS) | (g[:, 2] << (2 * _COORD_BITS))
    return jnp.where(mask, key, _INVALID_KEY)


def conv_offsets(kernel_size: int = 3) -> jnp.ndarray:
    """(K, 3) int offsets of a cubic kernel, center included, row-major.

    Row-major enumeration is symmetric: offs[K-1-k] == -offs[k], which the
    scatter-free conv backward relies on."""
    r = kernel_size // 2
    offs = list(itertools.product(range(-r, r + 1), repeat=3))
    return jnp.asarray(offs, dtype=jnp.int32)


def _blocked_cummax(x: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """Inclusive running max of a 1-D int32 array (same blocking rationale as
    binning.cumsum_1d_i32: XLA's long 1-D cumulative ops lower to a slow
    reduce-window)."""
    n = x.shape[0]
    rows = (n + block - 1) // block
    pad = jnp.full((rows * block - n,), _I32_MIN, x.dtype)
    x2 = jnp.concatenate([x, pad]).reshape(rows, block)
    row_cm = jax.lax.cummax(x2, axis=1)
    offs = jax.lax.cummax(row_cm[:, -1], axis=0)
    offs = jnp.concatenate([jnp.full((1,), _I32_MIN, x.dtype), offs[:-1]])
    return jnp.maximum(row_cm, offs[:, None]).reshape(-1)[:n]


def _cumsum_rows_blocked(x: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """Inclusive cumsum along axis 0 of a 2-D f32 array, blocked along the
    long axis (lanes after a transpose)."""
    xt = x.T  # (C, N)
    c, n = xt.shape
    nb = (n + block - 1) // block
    x3 = jnp.pad(xt, ((0, 0), (0, nb * block - n))).reshape(c, nb, block)
    cs = jnp.cumsum(x3, axis=-1)
    totals = cs[:, :, -1]
    off = jnp.cumsum(totals, axis=-1) - totals
    return (cs + off[:, :, None]).reshape(c, nb * block)[:, :n].T


def build_neighbor_map(grid_coord: jnp.ndarray, mask: jnp.ndarray,
                       kernel_size: int = 3) -> ConvStructure:
    """Build the per-stage neighbor structure (see ConvStructure).

    Sort-join for the neighbor entries: one combined sort of point keys and
    query keys (points tagged to sort before queries of the same key), a
    blocked running max of "position of the last point row", a boundary check
    that the run's key group actually contains a point, and a restore sort.
    """
    n = grid_coord.shape[0]
    offs = conv_offsets(kernel_size)  # (K, 3)
    k = offs.shape[0]
    center = k // 2
    iota = jnp.arange(n, dtype=jnp.int32)

    keys = pack_voxel_key(grid_coord, mask)
    nbr_coord = grid_coord[:, None, :].astype(jnp.int32) + offs[None, :, :]
    in_range = jnp.all((nbr_coord >= 0) & (nbr_coord < (1 << _COORD_BITS)),
                       axis=-1)
    nbr_key = (nbr_coord[..., 0]
               | (nbr_coord[..., 1] << _COORD_BITS)
               | (nbr_coord[..., 2] << (2 * _COORD_BITS)))  # (N, K)
    # out-of-range rows never match (valid keys < 2^30)
    nbr_key = jnp.where(in_range, nbr_key, _INVALID_KEY - 1)

    nq = n * k
    # tags: points -(i+1) (sort before queries of equal key; the LAST point
    # row of a group is the min original index = the representative),
    # queries q >= 0
    all_keys = jnp.concatenate([keys, nbr_key.reshape(-1)])
    all_tags = jnp.concatenate([-iota - 1, jnp.arange(nq, dtype=jnp.int32)])
    skeys, stags = jax.lax.sort((all_keys, all_tags), num_keys=2)

    m = n + nq
    slot = jnp.arange(m, dtype=jnp.int32)
    is_point = stags < 0
    # position of the last point row at-or-before each slot (monotone, so a
    # plain running max is exact), and position of the current key-group
    # start; the group contains a point iff last_point >= grp_start
    last_point = _blocked_cummax(jnp.where(is_point, slot, -1))
    prev_key = jnp.concatenate([jnp.full((1,), -1, jnp.int32), skeys[:-1]])
    grp_start = _blocked_cummax(jnp.where(skeys != prev_key, slot, -1))
    found = last_point >= grp_start
    point_idx = jnp.where(found, -stags[jnp.maximum(last_point, 0)] - 1, -1)

    # restore query order: point rows keyed to the tail and sliced off
    qtag = jnp.where(is_point, jnp.int32(nq), stags)
    res = jnp.where(is_point, -1, point_idx)
    _, res_sorted = jax.lax.sort((qtag, res), num_keys=1)
    nbr = res_sorted[:nq].reshape(n, k)

    nbr = jnp.where(mask[:, None], nbr, -1)
    # center tap: the point itself (not another occupant of the same voxel)
    self_idx = jnp.where(mask, iota, -1)
    nbr = nbr.at[:, center].set(self_idx)

    # points-only group structure (for the backward's voxel sums): sort by
    # (key, index) so the head of each group is the representative
    sorted_keys, sort_perm = jax.lax.sort((keys, iota), num_keys=2)
    pos = jnp.zeros((n,), jnp.int32).at[sort_perm].set(iota)
    pk = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sorted_keys[:-1]])
    is_head = sorted_keys != pk
    # one-past-end of each slot's group = the next head position after it:
    # suffix-min of (slot if head else n), shifted left by one
    b = jnp.where(is_head, iota, jnp.int32(n))
    suffmin = -jnp.flip(_blocked_cummax(jnp.flip(-b)))
    group_end = jnp.concatenate([suffmin[1:], jnp.full((1,), n, jnp.int32)])
    is_rep = jnp.zeros((n,), bool).at[sort_perm].set(is_head) & mask
    return ConvStructure(nbr=nbr, sort_perm=sort_perm, pos=pos,
                         group_end=group_end, is_rep=is_rep)


def _conv_gather_matmul(table: jnp.ndarray, nbr: jnp.ndarray,
                        weight: jnp.ndarray, row_gate=None,
                        taps=None) -> jnp.ndarray:
    """sum_k table[nbr[:, k]] @ weight[k]; missing neighbors contribute zero.
    Accumulates one offset at a time to bound memory at O(N * C)."""
    out = None
    taps = range(weight.shape[0]) if taps is None else taps
    for j in taps:
        idx = nbr[:, j]
        ok = idx >= 0
        g = table[jnp.maximum(idx, 0)]
        g = jnp.where(ok[:, None], g, 0.0)
        term = jnp.dot(g, weight[j], preferred_element_type=table.dtype)
        out = term if out is None else out + term
    if row_gate is not None:
        out = jnp.where(row_gate[:, None], out, 0.0)
    return out


@jax.custom_vjp
def sparse_conv_apply(feat: jnp.ndarray, cs: ConvStructure,
                      weight: jnp.ndarray, bias: jnp.ndarray | None = None
                      ) -> jnp.ndarray:
    """Apply a submanifold conv given a neighbor structure.

    feat (N, Cin), cs ConvStructure, weight (K, Cin, Cout), bias (Cout,).
    Missing neighbors contribute zero. custom_vjp: scatter-free exact
    backward (see module docstring).
    """
    out = _conv_gather_matmul(feat, cs.nbr, weight)
    if bias is not None:
        out = out + bias
    return out


def _conv_fwd(feat, cs, weight, bias):
    return sparse_conv_apply(feat, cs, weight, bias), (feat, cs, weight,
                                                       bias is not None)


def _conv_bwd(res, g):
    feat, cs, weight, has_bias = res
    kk = weight.shape[0]
    center = kk // 2
    n = feat.shape[0]

    # voxel sums of the output cotangent, in original indexing at every slot
    # of the group (only representative rows are ever gathered)
    gs = g[cs.sort_perm]                                   # (N, Cout)
    ci = _cumsum_rows_blocked(gs.astype(jnp.float32))
    c0 = jnp.concatenate([jnp.zeros((1, ci.shape[1]), ci.dtype), ci], axis=0)
    vox_sorted = c0[cs.group_end] - c0[:-1]                # (N, Cout)
    d_vox = vox_sorted[cs.pos].astype(g.dtype)             # original order

    # non-center taps: one flipped gather pass serves BOTH d_feat and d_W
    feat_rep = jnp.where(cs.is_rep[:, None], feat, 0.0)
    d_feat = None
    d_w = [None] * kk
    for kf in range(kk):
        if kf == center:
            continue
        idx = cs.nbr[:, kf]
        ok = idx >= 0
        gk = jnp.where(ok[:, None], d_vox[jnp.maximum(idx, 0)], 0.0)
        term = jnp.dot(gk, weight[kk - 1 - kf].transpose(1, 0),
                       preferred_element_type=g.dtype)
        d_feat = term if d_feat is None else d_feat + term
        d_w[kk - 1 - kf] = jnp.einsum(
            "nc,nd->cd", feat_rep, gk, preferred_element_type=jnp.float32)
    d_feat = jnp.where(cs.is_rep[:, None], d_feat, 0.0)
    # center tap: identity map gated by validity
    ok_c = cs.nbr[:, center] >= 0
    g_c = jnp.where(ok_c[:, None], g, 0.0)
    d_feat = d_feat + jnp.dot(g_c, weight[center].transpose(1, 0),
                              preferred_element_type=g.dtype)
    d_w[center] = jnp.einsum("nc,nd->cd", jnp.where(ok_c[:, None], feat, 0.0),
                             g_c, preferred_element_type=jnp.float32)
    d_w = jnp.stack(d_w, axis=0).astype(weight.dtype)
    d_b = jnp.sum(g, axis=0) if has_bias else None
    d_cs = jax.tree.map(lambda x: np.zeros(x.shape, jax.dtypes.float0), cs)
    return d_feat, d_cs, d_w, d_b


sparse_conv_apply.defvjp(_conv_fwd, _conv_bwd)
