"""Space-filling-curve serialization of point clouds (PTv3's core trick).

Replaces the Pointcept CUDA/torch `Point.serialization` contract
(SURVEY.md §2.4): each point's grid coordinate is encoded into a z-order
(Morton) or Hilbert key per requested order; argsorting the keys yields the
serialized order used by patch attention and pooling. The four orders are
("z", "z-trans", "hilbert", "hilbert-trans") where the -trans variants swap
the x/y axes before encoding (/root/reference/models/pointtransformer_v3.py:130).

TPU-native design: all bit-twiddling is vectorized int32 ops over (N,),
depths are static (default 10 bits/axis — grids up to 1024^3, covering the
reference's grid_resolution=384), sorting is `lax.sort`. Invalid (padded)
points get the maximal key so they sort to the tail — every consumer relies
on this invariant.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")
# Largest int32 value used as the "padding" key; real codes use 3*depth bits
# (<= 30), so INVALID_CODE strictly dominates them.
INVALID_CODE = jnp.int32(2**31 - 1)


def _part1by2(x: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Spread the low `depth` bits of x so bit i lands at position 3*i."""
    x = x.astype(jnp.int32) & ((1 << depth) - 1)
    out = jnp.zeros_like(x)
    for i in range(depth):
        out = out | (((x >> i) & 1) << (3 * i))
    return out


def z_encode(grid_coord: jnp.ndarray, depth: int = 10) -> jnp.ndarray:
    """Morton/z-order key of (N, 3) int grid coords; x fastest-varying
    (bit 0), then y, then z — 3*depth bits total."""
    x = _part1by2(grid_coord[:, 0], depth)
    y = _part1by2(grid_coord[:, 1], depth)
    z = _part1by2(grid_coord[:, 2], depth)
    return x | (y << 1) | (z << 2)


def hilbert_encode(grid_coord: jnp.ndarray, depth: int = 10) -> jnp.ndarray:
    """Hilbert-curve key of (N, 3) int grid coords, 3*depth bits.

    Vectorized Skilling transform (Skilling 2004, "Programming the Hilbert
    curve"): axes -> transposed Hilbert representation, then bit interleave.
    Static python loops over `depth` unroll into pure int32 vector ops.
    """
    n_dims = 3
    X = [grid_coord[:, i].astype(jnp.int32) & ((1 << depth) - 1)
         for i in range(n_dims)]

    # AxesToTranspose (in-place Gray-code style transform).
    Q = 1 << (depth - 1)
    while Q > 1:
        P = Q - 1
        for i in range(n_dims):
            cond = (X[i] & Q) != 0
            # if bit set: invert low bits of X[0]; else swap low bits X[0]<->X[i]
            t = (X[0] ^ X[i]) & P
            X0_if = X[0] ^ P
            X0_else = X[0] ^ t
            Xi_else = X[i] ^ t
            X[0] = jnp.where(cond, X0_if, X0_else)
            if i > 0:
                X[i] = jnp.where(cond, X[i], Xi_else)
        Q >>= 1

    # Gray encode
    for i in range(1, n_dims):
        X[i] = X[i] ^ X[i - 1]
    t = jnp.zeros_like(X[0])
    Q = 1 << (depth - 1)
    while Q > 1:
        t = jnp.where((X[n_dims - 1] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    for i in range(n_dims):
        X[i] = X[i] ^ t

    # Interleave transposed bits: X[0] holds the most significant bit of each
    # 3-bit group, and higher bit positions come first.
    key = jnp.zeros_like(X[0])
    for b in range(depth):
        for i in range(n_dims):
            bit = (X[i] >> (depth - 1 - b)) & 1
            key = (key << 1) | bit
    return key


def encode(grid_coord: jnp.ndarray, order: str, depth: int = 10) -> jnp.ndarray:
    assert order in ORDERS, order
    if order.endswith("-trans"):
        grid_coord = grid_coord[:, jnp.array([1, 0, 2])]
    if order.startswith("z"):
        return z_encode(grid_coord, depth)
    return hilbert_encode(grid_coord, depth)


def serialize(
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    orders: Sequence[str] = ORDERS,
    depth: int = 10,
    shuffle_rng: jax.Array | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute serialization for each order.

    Returns (codes, order_perm, inverse_perm), each (num_orders, N):
      codes[o, i]         SFC key of point i (INVALID_CODE for padding)
      order_perm[o, j]    index of the j-th point in serialized order
      inverse_perm[o, i]  serialized position of point i
    With shuffle_rng, the order axis is randomly permuted (PTv3
    shuffle_orders=True, pointtransformer_v3.py:146).
    """
    assert depth * 3 <= 30, "int32 keys support depth <= 10"
    n = grid_coord.shape[0]
    codes = jnp.stack([encode(grid_coord, o, depth) for o in orders])
    codes = jnp.where(mask[None, :], codes, INVALID_CODE)

    if shuffle_rng is not None:
        perm = jax.random.permutation(shuffle_rng, len(orders))
        codes = codes[perm]

    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), codes.shape)
    _, order_perm = jax.lax.sort(
        (codes, iota), dimension=-1, num_keys=1, is_stable=True)
    inverse_perm = jnp.zeros_like(order_perm)
    inverse_perm = jax.vmap(
        lambda op: jnp.zeros((n,), jnp.int32).at[op].set(
            jnp.arange(n, dtype=jnp.int32)))(order_perm)
    return codes, order_perm, inverse_perm
