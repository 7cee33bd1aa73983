"""Token-merging family: shapes, size accounting, unmerge round trips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatformer_tpu.ops.merging import MERGE_MODES, process_merging


def make_qkv(rng, b=3, h=2, k=32, c=8):
    q = jnp.asarray(rng.normal(size=(b, h, k, c)), jnp.float32)
    kk = jnp.asarray(rng.normal(size=(b, h, k, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, k, c)), jnp.float32)
    return q, kk, v


@pytest.mark.parametrize("mode", MERGE_MODES)
def test_modes_shapes_and_size_conservation(rng, mode):
    q, k, v = make_qkv(rng)
    info = {"r": 0.5, "margin": 0.9, "alpha": 1.0, "stride": 4,
            "threshold": 0.5, "low_r": 4}
    q2, k2, v2, size, unmerge = process_merging(
        mode, q, k, v, info, rng=jax.random.key(0))
    kp = q2.shape[-2]
    assert kp <= 32 and q2.shape == k2.shape == v2.shape
    assert size.shape == (3, 2, kp, 1)
    # every original token is represented exactly once — except pruning,
    # which discards tokens outright (size 1 per survivor)
    expected = float(kp) if mode == "prune" else 32.0
    np.testing.assert_allclose(np.asarray(jnp.sum(size, axis=-2)).squeeze(-1),
                               expected, rtol=1e-5)
    # unmerge maps back to full patch size with finite values
    out = unmerge(v2)
    assert out.shape == v.shape
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("mode", ["tome", "tofu", "pitome", "prune", "patch"])
def test_zero_merges_at_r0_keep_everything(rng, mode):
    q, k, v = make_qkv(rng)
    info = {"r": 0.0, "stride": 4, "margin": 0.9, "threshold": 0.5}
    q2, k2, v2, size, unmerge = process_merging(mode, q, k, v, info)
    assert q2.shape[-2] == 32
    np.testing.assert_allclose(np.asarray(size), 1.0)
    # with nothing merged, unmerge(merge(x)) == x up to token reordering;
    # verify multisets of rows match by comparing sorted row norms
    out = unmerge(v2)
    a = np.sort(np.linalg.norm(np.asarray(out), axis=-1), axis=-1)
    b = np.sort(np.linalg.norm(np.asarray(v), axis=-1), axis=-1)
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_tome_merges_identical_tokens_first(rng):
    # craft a patch where tokens 0 and 1 are identical: with r=1/K the merged
    # pair must be that pair, and the merged value their mean.
    b, h, k, c = 1, 1, 8, 4
    base = rng.normal(size=(k, c)).astype(np.float32)
    base[1] = base[0]  # src position 0 (even) == dst position 0 (odd)
    q = kk = v = jnp.asarray(base)[None, None]
    q2, k2, v2, size, unmerge = process_merging(
        "tome", q, kk, v, {"r": 1.0 / k})
    assert v2.shape[-2] == k - 1
    sizes = np.asarray(size).squeeze()
    assert sizes.sum() == k and sizes.max() == 2
    # the size-2 token's value equals the mean of the identical pair == base[0]
    merged_val = np.asarray(v2).squeeze(0).squeeze(0)[np.argmax(sizes)]
    np.testing.assert_allclose(merged_val, base[0], rtol=1e-5)


def test_merging_in_attention_reduces_flops_dims(rng):
    # integration through SerializedAttention: merged attention runs at K'
    from splatformer_tpu.models.point import make_point_batch
    from splatformer_tpu.models.ptv3 import SerializedAttention

    n, c = 64, 16
    coord = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    mask = jnp.ones(n, bool)
    pb = make_point_batch(coord, feat, mask, grid_resolution=32)
    attn = SerializedAttention(
        channels=c, num_heads=2, patch_size=16, order_index=0,
        additional_info={"tome": "tome", "r": 0.5, "tome_attention": True})
    params = attn.init(jax.random.key(0), feat, pb, False)
    out = attn.apply(params, feat, pb, False)
    assert out.shape == (n, c)
    assert bool(jnp.isfinite(out).all())
