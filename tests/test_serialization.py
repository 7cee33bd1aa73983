"""SFC serialization correctness (SURVEY.md §4 unit-test list)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from splatformer_tpu.ops.serialization import (INVALID_CODE, ORDERS, encode,
                                               hilbert_encode, serialize,
                                               z_encode)
from splatformer_tpu.ops.segment_ops import pad_order_for_patches


def full_grid(depth):
    side = 1 << depth
    pts = np.array(list(itertools.product(range(side), repeat=3)),
                   dtype=np.int32)
    return jnp.asarray(pts)


def test_z_order_known_values():
    pts = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                     [1, 1, 1], [2, 0, 0], [3, 3, 3]], dtype=jnp.int32)
    codes = np.asarray(z_encode(pts, depth=4))
    # x at bit0, y at bit1, z at bit2
    np.testing.assert_array_equal(codes, [0, 1, 2, 4, 7, 8, 0b111111])


def test_z_order_is_bijective_on_grid():
    pts = full_grid(2)
    codes = np.asarray(z_encode(pts, depth=2))
    assert len(np.unique(codes)) == len(codes)
    assert codes.min() == 0 and codes.max() == len(codes) - 1


def test_hilbert_bijective_and_adjacent():
    # A valid 3D Hilbert curve: codes are a bijection onto [0, 8^d) and
    # consecutive codes are grid neighbors (L1 distance exactly 1).
    for depth in (1, 2, 3):
        pts = full_grid(depth)
        codes = np.asarray(hilbert_encode(pts, depth=depth))
        n = len(codes)
        assert len(np.unique(codes)) == n
        assert codes.min() == 0 and codes.max() == n - 1
        order = np.argsort(codes)
        walk = np.asarray(pts)[order]
        d = np.abs(np.diff(walk.astype(np.int64), axis=0)).sum(axis=1)
        assert np.all(d == 1), f"depth {depth}: non-adjacent steps {np.max(d)}"


def test_trans_orders_swap_xy():
    pts = jnp.array([[3, 5, 2], [1, 0, 7]], dtype=jnp.int32)
    swapped = pts[:, jnp.array([1, 0, 2])]
    np.testing.assert_array_equal(
        np.asarray(encode(pts, "z-trans", 4)), np.asarray(encode(swapped, "z", 4)))
    np.testing.assert_array_equal(
        np.asarray(encode(pts, "hilbert-trans", 4)),
        np.asarray(encode(swapped, "hilbert", 4)))


def test_serialize_padding_sorts_last(rng):
    n, n_valid = 64, 40
    pts = jnp.asarray(rng.integers(0, 16, (n, 3)), jnp.int32)
    mask = jnp.arange(n) < n_valid
    codes, order_perm, inverse_perm = serialize(pts, mask, ORDERS, depth=4)
    assert codes.shape == (4, n)
    for o in range(4):
        op = np.asarray(order_perm[o])
        iv = np.asarray(inverse_perm[o])
        # permutation round trip
        np.testing.assert_array_equal(op[iv], np.arange(n))
        # real points occupy the first n_valid serialized positions
        assert set(op[:n_valid].tolist()) == set(range(n_valid))
        # sorted codes nondecreasing
        c = np.asarray(codes[o])[op]
        assert np.all(np.diff(c) >= 0)
        assert np.all(np.asarray(codes[o])[~np.asarray(mask)] == INVALID_CODE)


def test_serialize_shuffle_permutes_orders(rng):
    pts = jnp.asarray(rng.integers(0, 16, (32, 3)), jnp.int32)
    mask = jnp.ones(32, bool)
    codes0, _, _ = serialize(pts, mask, ORDERS, depth=4)
    codes1, _, _ = serialize(pts, mask, ORDERS, depth=4,
                             shuffle_rng=jax.random.key(3))
    sets0 = {tuple(np.asarray(c).tolist()) for c in codes0}
    sets1 = {tuple(np.asarray(c).tolist()) for c in codes1}
    assert sets0 == sets1  # same orders, possibly permuted


def test_pad_order_for_patches_duplicates_tail(rng):
    n, n_valid, k = 32, 21, 8
    order = jnp.asarray(rng.permutation(n).astype(np.int32))
    # simulate "real sorted first": ensure first n_valid entries are the reals
    real = [i for i in np.asarray(order) if i < n_valid]
    fake = [i for i in np.asarray(order) if i >= n_valid]
    order = jnp.asarray(np.array(real + fake, dtype=np.int32))
    padded = np.asarray(pad_order_for_patches(order, jnp.int32(n_valid), k))
    # real positions untouched
    np.testing.assert_array_equal(padded[:n_valid], np.asarray(order)[:n_valid])
    # tail patch (positions 16..24): fake slots 21..23 duplicate reals 16..18
    np.testing.assert_array_equal(padded[21:24], np.asarray(order)[16:19])
    # fully fake patch (24..32) unchanged
    np.testing.assert_array_equal(padded[24:], np.asarray(order)[24:])


def test_pad_order_exact_multiple_noop(rng):
    n, k = 32, 8
    order = jnp.arange(n, dtype=jnp.int32)
    padded = np.asarray(pad_order_for_patches(order, jnp.int32(16), k))
    np.testing.assert_array_equal(padded, np.arange(n))
