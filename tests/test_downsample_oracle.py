"""Dense-numpy oracle tests for the input downsamplers (reference C5,
/root/reference/models/pcd_downsampling_methods.py) — added after the r4
sweep's anomalous fps rows, which traced to the chip's default-bf16 matmul
randomizing nearest-centroid assignments (fixed with Precision.HIGHEST in
ops/downsample.nearest_idx; tools/diag_fps.py is the original diagnosis).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatformer_tpu.ops import downsample as ds


@pytest.fixture
def cloud():
    rng = np.random.default_rng(0)
    n, n_valid = 1024, 1000
    coord = rng.uniform(size=(n, 3)).astype(np.float32)
    coord[n_valid:] = 0.0
    feat = rng.normal(size=(n, 8)).astype(np.float32)
    feat[n_valid:] = 0.0
    mask = np.arange(n) < n_valid
    return coord, feat, mask, n_valid


def _fps_oracle(xyz, m, start):
    centroids = np.zeros(m, np.int64)
    dist = np.full(xyz.shape[0], 1e10)
    farthest = start
    for i in range(m):
        centroids[i] = farthest
        d = np.sum((xyz - xyz[farthest]) ** 2, axis=1)
        dist = np.minimum(dist, d)
        farthest = int(np.argmax(dist))
    return centroids


@pytest.mark.parametrize("ratio", [0.9, 0.3])
def test_fps_selection_matches_greedy_oracle(cloud, ratio):
    coord, feat, mask, n_valid = cloud
    m_req = max(1, int(coord.shape[0] * ratio))
    sel = np.asarray(ds.furthest_point_sampling(
        jnp.asarray(coord), jnp.asarray(mask), m_req))
    nsel = min(m_req, n_valid)
    oracle = _fps_oracle(coord[:n_valid], nsel, int(np.argmax(mask)))
    np.testing.assert_array_equal(sel[:nsel], oracle[:nsel])
    assert not np.any(sel[:nsel] >= n_valid)  # masked never selected


@pytest.mark.parametrize("ratio", [0.9, 0.3])
def test_fps_assignment_and_aggregation(cloud, ratio):
    coord, feat, mask, n_valid = cloud
    c_coord, c_feat, c_mask, assign = jax.jit(
        lambda c, f, mk: ds.fps_knn_downsample(c, f, mk, ratio)
    )(jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask))
    c_coord, c_feat, c_mask, assign = map(
        np.asarray, (c_coord, c_feat, c_mask, assign))
    mv = int(c_mask.sum())
    m_req = max(1, int(coord.shape[0] * ratio))
    assert mv == min(m_req, n_valid)

    # every valid point assigned to its true nearest selected centroid
    sel = _fps_oracle(coord[:n_valid], mv, int(np.argmax(mask)))
    cents = coord[sel]
    d2 = ((coord[:n_valid, None, :] - cents[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(assign[:n_valid], np.argmin(d2, axis=1))

    # aggregation = exact cluster means
    cm = np.zeros((mv, 3))
    cnt = np.zeros(mv)
    np.add.at(cm, assign[:n_valid], coord[:n_valid])
    np.add.at(cnt, assign[:n_valid], 1.0)
    np.testing.assert_allclose(c_coord[:mv],
                               cm / np.maximum(cnt, 1.0)[:, None],
                               atol=1e-5)


def test_fps_mapback_gathers_assigned_row(cloud):
    coord, feat, mask, n_valid = cloud
    _, _, _, up = ds.downsample_dispatch(
        "fps", {"downsample_ratio": 0.5},
        jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask))
    _, _, _, assign = ds.fps_knn_downsample(
        jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask), 0.5)
    m = ds._round_up(max(1, int(coord.shape[0] * 0.5)), 128)
    y = np.random.default_rng(1).normal(size=(m, 4)).astype(np.float32)
    back = np.asarray(up(jnp.asarray(y)))
    a = np.asarray(assign)[:n_valid].clip(0, m - 1)
    np.testing.assert_array_equal(back[:n_valid], y[a])


def test_voxel_capacity_sufficient_means_no_waste(cloud):
    coord, feat, mask, n_valid = cloud
    vs = 0.25  # coarse: few voxels, capacity ample
    vc, vf, vm, assign = ds.voxel_downsample(
        jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask), vs,
        capacity_factor=1.0)
    assign = np.asarray(assign)
    m = np.asarray(vc).shape[0]
    # no valid point in the waste bucket
    assert not np.any(assign[:n_valid] >= m)
    v = np.floor(coord[:n_valid] / vs).astype(np.int64)
    key = v[:, 0] * 1_000_000 + v[:, 1] * 1_000 + v[:, 2]
    assert int(np.asarray(vm).sum()) == len(np.unique(key))
    # same-voxel points share a row; different-voxel points don't
    import collections
    groups = collections.defaultdict(set)
    for i in range(n_valid):
        groups[key[i]].add(int(assign[i]))
    assert all(len(s) == 1 for s in groups.values())
    rows = [next(iter(s)) for s in groups.values()]
    assert len(set(rows)) == len(rows)
