"""PTv3 backbone / FeaturePredictor structural tests (small configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatformer_tpu.data.synthetic import random_scene
from splatformer_tpu.models.feature_predictor import FeaturePredictor
from splatformer_tpu.models.point import make_point_batch
from splatformer_tpu.models.ptv3 import PointTransformerV3
from splatformer_tpu.ops.sparse_conv import (build_neighbor_map,
                                             sparse_conv_apply)

TINY_PTV3 = dict(
    enc_depths=(1, 1, 1), enc_channels=(16, 16, 32), enc_num_head=(2, 2, 4),
    enc_patch_size=(16, 16, 16), dec_depths=(1, 1), dec_channels=(16, 16),
    dec_num_head=(2, 2), dec_patch_size=(16, 16), stride=(1, 2),
    drop_path=0.1, pool_capacity_factors=(1.0, 0.75),
)


def make_inputs(rng, n=256, n_valid=200, c=8):
    coord = jnp.asarray(rng.uniform(0.05, 0.95, (n, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    mask = jnp.arange(n) < n_valid
    feat = jnp.where(mask[:, None], feat, 0.0)
    return coord, feat, mask


def test_neighbor_map_correctness(rng):
    n = 128
    grid = jnp.asarray(rng.integers(0, 8, (n, 3)), jnp.int32)
    mask = jnp.arange(n) < 100
    nbr = np.asarray(build_neighbor_map(grid, mask).nbr)
    g = np.asarray(grid)
    m = np.asarray(mask)
    # center tap is self
    np.testing.assert_array_equal(nbr[m, 13], np.arange(n)[m])
    assert np.all(nbr[~m] == -1)
    # spot check: resolved neighbors really occupy the offset voxel
    offs = np.array(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                indexing="ij")).reshape(3, -1).T
    for i in range(0, 100, 7):
        for k in range(27):
            j = nbr[i, k]
            target = g[i] + offs[k]
            if j >= 0:
                assert m[j] and np.array_equal(g[j], target)
            else:
                # no valid point occupies that voxel
                occupied = np.any(np.all(g[m] == target, axis=1))
                assert not occupied or not m[i]


def test_sparse_conv_identity_kernel(rng):
    n, c = 64, 8
    grid = jnp.asarray(rng.integers(0, 32, (n, 3)), jnp.int32)  # sparse: mostly isolated
    mask = jnp.ones(n, bool)
    feat = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    nbr = build_neighbor_map(grid, mask)
    w = jnp.zeros((27, c, c)).at[13].set(jnp.eye(c))  # center-only identity
    out = sparse_conv_apply(feat, nbr, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat), atol=1e-6)


def test_sparse_conv_backward_exact_vs_autodiff(rng):
    """The scatter-free custom backward must match autodiff of the plain
    gather formulation — including multi-occupant voxels and masked points."""
    n, c, cout = 96, 8, 6
    # tiny grid -> guaranteed duplicate voxel keys
    grid = jnp.asarray(rng.integers(0, 4, (n, 3)), jnp.int32)
    mask = jnp.arange(n) < 80
    feat = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(27, c, cout)), jnp.float32) * 0.2
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    cs = build_neighbor_map(grid, mask)
    cot = jnp.asarray(rng.normal(size=(n, cout)), jnp.float32)

    def ref_conv(feat, w, b):
        out = jnp.zeros((n, cout), jnp.float32)
        for j in range(27):
            idx = cs.nbr[:, j]
            ok = idx >= 0
            g = jnp.where(ok[:, None], feat[jnp.maximum(idx, 0)], 0.0)
            out = out + g @ w[j]
        return out + b

    def loss(fn):
        return lambda feat, w, b: jnp.sum(fn(feat, w, b) * cot)

    g_ref = jax.grad(loss(ref_conv), argnums=(0, 1, 2))(feat, w, b)
    g_cus = jax.grad(
        loss(lambda f, w_, b_: sparse_conv_apply(f, cs, w_, b_)),
        argnums=(0, 1, 2))(feat, w, b)
    for a, bb, name in zip(g_ref, g_cus, ("feat", "w", "b")):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_bf16_compute_train_step(rng):
    """compute_dtype='bfloat16' (the reference's AMP equivalent) must keep
    f32 outputs/params, finite grads, and eval (train=False) bit-identical
    to the f32 model."""
    scene = random_scene(rng, 256, sh_degree=1, n_valid=200)
    kw = dict(backbone_type="PT", sh_degree=1, grid_resolution=64,
              res_feature_activation={"means": "tanh"},
              backbone_kwargs=TINY_PTV3)
    m32 = FeaturePredictor(**kw)
    m16 = FeaturePredictor(compute_dtype="bfloat16", **kw)
    v = m32.init(jax.random.key(0), scene, False)

    out32, _ = m32.apply(v, scene, False)
    out16, _ = m16.apply(v, scene, False)  # eval path ignores compute_dtype
    np.testing.assert_array_equal(np.asarray(out16.means),
                                  np.asarray(out32.means))

    def loss(params):
        (ref, _), _ = m16.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, scene, True,
            rngs={"droppath": jax.random.key(1), "orders": jax.random.key(2)},
            mutable=["batch_stats"])
        return jnp.mean(jnp.abs(ref.means)) + jnp.mean(jnp.abs(ref.scales))

    l, g = jax.value_and_grad(loss)(v["params"])
    assert np.isfinite(float(l))
    leaves = jax.tree.leaves(g)
    assert all(x.dtype == jnp.float32 for x in leaves)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_ptv3_forward_shapes_and_mask_invariance(rng):
    coord, feat, mask = make_inputs(rng)
    pb = make_point_batch(coord, feat, mask, grid_resolution=64)
    model = PointTransformerV3(in_channels=8, **TINY_PTV3)
    params = model.init(jax.random.key(0), pb, False)
    y, diag = model.apply(params, pb, False)
    assert y.shape == (256, 16)
    assert bool(jnp.isfinite(y[np.asarray(mask)]).all())

    # padding invariance: garbage in padded slots must not change valid outputs
    feat2 = feat.at[200:].set(123.0)
    coord2 = coord.at[200:].set(0.77)
    pb2 = make_point_batch(coord2, feat2, mask, grid_resolution=64)
    y2, _ = model.apply(params, pb2, False)
    np.testing.assert_allclose(np.asarray(y[np.asarray(mask)]),
                               np.asarray(y2[np.asarray(mask)]),
                               atol=1e-4, rtol=1e-4)


def test_ptv3_train_mode_runs_with_rngs(rng):
    coord, feat, mask = make_inputs(rng)
    pb = make_point_batch(coord, feat, mask, grid_resolution=64,
                          shuffle_rng=jax.random.key(1))
    model = PointTransformerV3(in_channels=8, **TINY_PTV3)
    variables = model.init(
        {"params": jax.random.key(0), "droppath": jax.random.key(1)}, pb, True)
    (y, _), _ = model.apply(
        variables, pb, True, rngs={"droppath": jax.random.key(2)},
        mutable=["batch_stats"])
    assert bool(jnp.isfinite(y[np.asarray(mask)]).all())


@pytest.mark.parametrize("backbone", ["PT", "SP"])
def test_feature_predictor_zeroinit_is_identity(rng, backbone):
    scene = random_scene(rng, 256, sh_degree=1, n_valid=200)
    bk = TINY_PTV3 if backbone == "PT" else dict(
        channels=(16, 16, 32), dec_channels=(16, 16), depths=(1, 1, 1),
        dec_depths=(1, 1), stride=(2, 2), pool_capacity_factors=(0.75, 0.625),
        output_dim=16, base_channels=16)
    model = FeaturePredictor(
        backbone_type=backbone, sh_degree=1, grid_resolution=64,
        res_feature_activation={"means": "tanh"}, backbone_kwargs=bk)
    variables = model.init(jax.random.key(0), scene, False)
    refined, _ = model.apply(variables, scene, False)
    # zero-init heads + residual mode -> exact identity refinement at init
    for key in ("means", "scales", "quats", "opacities", "features_dc",
                "features_rest"):
        np.testing.assert_allclose(np.asarray(getattr(refined, key)),
                                   np.asarray(getattr(scene, key)), atol=1e-5,
                                   err_msg=key)


def test_feature_predictor_grad_flows(rng):
    scene = random_scene(rng, 256, sh_degree=1, n_valid=200)
    model = FeaturePredictor(backbone_type="PT", sh_degree=1,
                             grid_resolution=64,
                             res_feature_activation={"means": "tanh"},
                             backbone_kwargs=TINY_PTV3)
    variables = model.init(jax.random.key(0), scene, False)

    def loss(params):
        refined, _ = model.apply({"params": params, **{k: v for k, v in
                                  variables.items() if k != "params"}},
                                 scene, False)
        return jnp.sum(refined.means ** 2) + jnp.sum(refined.scales ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert np.isfinite(total) and total > 0
