"""Data pipeline: transforms, COLMAP round trips, nerfstudio loading,
dataset sharding + batching (reference C6-C9 semantics)."""
import os
import pickle

import numpy as np
import pytest

from splatformer_tpu.data import colmap as colmap_io
from splatformer_tpu.data.dataset import (SplatfactoScenes, pad_gaussians,
                                          read_image, to_scene_batch)
from splatformer_tpu.data.transforms import MinMaxScaler, remove_outliers


def test_minmax_scaler_roundtrip_and_ratio(rng):
    x = rng.normal(size=(500, 3)).astype(np.float32) * np.array([1, 5, 0.2])
    sc = MinMaxScaler()
    y = sc.fit_transform(x)
    assert y.min() >= -1e-5 and y.max() <= 1 + 1e-5
    # ratio preserved: one shared scale
    ratio = (np.ptp(x[:, 1]) / np.ptp(x[:, 0]))
    ratio_y = (np.ptp(y[:, 1]) / np.ptp(y[:, 0]))
    np.testing.assert_allclose(ratio, ratio_y, rtol=1e-5)
    # the largest-extent axis spans [0, 1]
    np.testing.assert_allclose(y[:, 1].min(), 0, atol=1e-6)
    np.testing.assert_allclose(y[:, 1].max(), 1, atol=1e-6)
    back = sc.inverse_transform(y)
    np.testing.assert_allclose(back, x, atol=1e-4)
    # transform matches fit_transform
    np.testing.assert_allclose(sc.transform(x), y, atol=1e-6)


def test_remove_outliers(rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    pts[0] = [100, 0, 0]
    filtered, mask = remove_outliers(pts, n_devs=3)
    assert not mask[0]
    assert mask.sum() == filtered.shape[0] > 900


def test_colmap_binary_roundtrip(tmp_path, rng):
    cams = {1: colmap_io.ColmapCamera(1, "PINHOLE", 64, 48,
                                      np.array([50.0, 52.0, 32.0, 24.0]))}
    q = np.array([0.9, 0.1, 0.2, 0.1])
    q /= np.linalg.norm(q)
    imgs = {
        1: colmap_io.ColmapImage(1, q, np.array([0.1, 0.2, 0.3]), 1,
                                 "test_000.png", np.zeros((0, 2)),
                                 np.zeros(0, np.int64)),
        2: colmap_io.ColmapImage(2, q, np.array([0.4, 0.5, 0.6]), 1,
                                 "train_000.png", np.zeros((0, 2)),
                                 np.zeros(0, np.int64)),
    }
    colmap_io.write_cameras_binary(cams, tmp_path / "cameras.bin")
    colmap_io.write_images_binary(imgs, tmp_path / "images.bin")
    c2, i2, _ = colmap_io.read_model(tmp_path)
    assert c2[1].model == "PINHOLE" and c2[1].width == 64
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    np.testing.assert_allclose(i2[1].qvec, q)
    assert i2[1].name == "test_000.png"
    # text round trip too
    colmap_io.write_cameras_text(cams, tmp_path / "cameras.txt")
    colmap_io.write_images_text(imgs, tmp_path / "images.txt")
    c3 = colmap_io.read_cameras_text(tmp_path / "cameras.txt")
    i3 = colmap_io.read_images_text(tmp_path / "images.txt")
    np.testing.assert_allclose(c3[1].params, cams[1].params)
    np.testing.assert_allclose(i3[2].tvec, imgs[2].tvec)


def test_qvec_rotmat_roundtrip(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap_io.qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        q2 = colmap_io.rotmat2qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-8)


# ---------------------------------------------------------------------------
# synthetic on-disk dataset
# ---------------------------------------------------------------------------

@pytest.fixture
def fake_dataset(tmp_path, rng):
    import torch
    from PIL import Image

    ns_root = tmp_path / "nerfstudio"
    cm_root = tmp_path / "colmap"
    n_scenes, n_gauss, hw = 3, 120, 16
    for s in range(n_scenes):
        ns_dir = ns_root / f"scene{s}" / "splatfacto"
        (ns_dir / "nerfstudio_models").mkdir(parents=True)
        ckpt = {}
        for k, shape in (("means", (n_gauss, 3)), ("scales", (n_gauss, 3)),
                         ("quats", (n_gauss, 4)), ("opacities", (n_gauss, 1)),
                         ("features_dc", (n_gauss, 3)),
                         ("features_rest", (n_gauss, 3, 3))):
            ckpt[f"_model.gauss_params.{k}"] = torch.tensor(
                rng.normal(size=shape).astype(np.float32))
        # inject one NaN row to exercise filtering
        ckpt["_model.gauss_params.means"][5, 0] = float("nan")
        torch.save(ckpt, ns_dir / "nerfstudio_models" / "step-000009999.ckpt")

        img_dir = cm_root / f"scene{s}" / "images"
        img_dir.mkdir(parents=True)
        names = [f"train_{i:03d}.png" for i in range(4)] + \
                [f"test_{i:03d}.png" for i in range(3)]
        for name in names:
            arr = (rng.uniform(size=(hw, hw, 4)) * 255).astype(np.uint8)
            Image.fromarray(arr, "RGBA").save(img_dir / name)

        meta = {
            "fx": np.float32(20.0), "fy": np.float32(20.0),
            "cx": np.float32(hw / 2), "cy": np.float32(hw / 2),
            "width": np.float32(hw), "height": np.float32(hw),
            "train_camera_to_worlds": np.tile(np.eye(4, dtype=np.float32)
                                              [None, :3, :4], (4, 1, 1)),
            "test_camera_to_worlds": np.tile(np.eye(4, dtype=np.float32)
                                             [None, :3, :4], (3, 1, 1)),
        }
        meta["train_camera_to_worlds"][:, 2, 3] = 2.0
        meta["test_camera_to_worlds"][:, 2, 3] = 2.5
        with open(ns_dir / "camera_for-3d-denoise.pkl", "wb") as f:
            pickle.dump(meta, f)
    return str(ns_root), str(cm_root)


def test_dataset_train_iteration_and_batching(fake_dataset):
    ns_root, cm_root = fake_dataset
    ds = SplatfactoScenes(
        "train", ns_root, cm_root, sample_ratio_test=0.7, image_per_scene=4,
        max_gs_num=100, pad_to=128, background_color=[0, 0, 0])
    it = ds.iter_train()
    samples = [next(it) for _ in range(2)]
    s = samples[0]
    assert s["gs_params"]["means"].shape == (128, 3)
    assert s["gs_mask"].sum() <= 100
    assert s["images"].shape == (4, 16, 16, 3)
    assert s["c2w"].shape == (4, 3, 4)
    # normalized means within unit cube on valid slots
    m = s["gs_params"]["means"][s["gs_mask"]]
    assert m.min() >= 0 and m.max() <= 1
    batch = to_scene_batch(samples)
    assert batch.scene.means.shape == (2, 128, 3)
    assert batch.images.shape == (2, 4, 16, 16, 3)
    assert batch.cameras.width == 16


def test_dataset_test_split_sharding(fake_dataset):
    ns_root, cm_root = fake_dataset
    seen = []
    for rank in range(2):
        ds = SplatfactoScenes(
            "test", ns_root, cm_root, background_color=[0, 0, 0],
            max_gs_num=100, pad_to=128, process_index=rank, process_count=2)
        seen.append([s["scene_idx"] for s in ds.iter_test()])
    # disjoint, covering all 3 scenes, last rank takes remainder
    assert seen[0] == [0] and seen[1] == [1, 2]


def test_train_epoch_permutations_cover_all(fake_dataset):
    ns_root, cm_root = fake_dataset
    parts = []
    for rank in range(2):
        ds = SplatfactoScenes(
            "train", ns_root, cm_root, image_per_scene=2,
            sample_ratio_test=0.5, max_gs_num=100, pad_to=128,
            background_color="random", process_index=rank, process_count=2)
        parts.append(ds._train_epoch_ids())
    # padded permutation: union covers all scenes, equal chunk sizes
    assert set(parts[0]) | set(parts[1]) == {0, 1, 2}
    assert len(parts[0]) == len(parts[1]) == 2


def test_read_image_alpha_compositing(tmp_path, rng):
    from PIL import Image
    arr = np.zeros((8, 8, 4), np.uint8)
    arr[..., 0] = 200  # red
    arr[..., 3] = 128  # half alpha
    p = tmp_path / "img.png"
    Image.fromarray(arr, "RGBA").save(p)
    bg = np.array([0.0, 1.0, 0.0], np.float32)
    img = read_image(str(p), bg)
    a = 128 / 255
    np.testing.assert_allclose(img[0, 0],
                               [200 / 255 * a, (1 - a), 0.0], atol=1e-6)


def test_colmap_points3d_write_model_roundtrip(tmp_path, rng):
    """Full write_model/read_model round trip incl. points3D, binary AND
    text (C7 parity: /root/reference/dataset/colmap_utils.py:356-436)."""
    cams = {1: colmap_io.ColmapCamera(1, "PINHOLE", 64, 48,
                                      np.array([50.0, 52.0, 32.0, 24.0]))}
    q = np.array([0.9, 0.1, 0.2, 0.1])
    q /= np.linalg.norm(q)
    imgs = {1: colmap_io.ColmapImage(
        1, q, np.array([0.1, 0.2, 0.3]), 1, "frame_000.png",
        np.array([[1.5, 2.5], [3.0, 4.0]]), np.array([7, -1], np.int64))}
    pts = {
        3: colmap_io.ColmapPoint3D(
            3, np.array([0.1, 0.2, 0.3]), np.array([10, 20, 30], np.uint8),
            0.5, np.array([1, 1], np.int64), np.array([0, 1], np.int64)),
        9: colmap_io.ColmapPoint3D(
            9, np.array([-1.0, 2.0, -3.0]), np.array([0, 255, 7], np.uint8),
            1.25, np.zeros(0, np.int64), np.zeros(0, np.int64)),
    }
    for ext in (".bin", ".txt"):
        d = tmp_path / ext.strip(".")
        colmap_io.write_model(cams, imgs, pts, str(d), ext=ext)
        c2, i2, p2 = colmap_io.read_model(str(d), ext=ext)
        assert set(p2) == {3, 9}
        for pid in (3, 9):
            np.testing.assert_allclose(p2[pid].xyz, pts[pid].xyz, atol=1e-12)
            np.testing.assert_array_equal(p2[pid].rgb, pts[pid].rgb)
            assert abs(p2[pid].error - pts[pid].error) < 1e-12
            np.testing.assert_array_equal(p2[pid].image_ids,
                                          pts[pid].image_ids)
            np.testing.assert_array_equal(p2[pid].point2D_idxs,
                                          pts[pid].point2D_idxs)
        np.testing.assert_allclose(i2[1].xys, imgs[1].xys, atol=1e-12)
        np.testing.assert_array_equal(i2[1].point3D_ids, imgs[1].point3D_ids)


def test_scene_cache_eviction_with_unequal_scene_sizes(fake_dataset,
                                                       monkeypatch):
    """Regression: cache eviction used list.remove, which compares entries
    with == and broadcasts the numpy arrays inside the scene dicts —
    crashing as soon as two cached scenes had different Gaussian counts
    (seen at step ~60 of the first real oodbench training run)."""
    ns_root, cm_root = fake_dataset
    ds = SplatfactoScenes(
        "train", ns_root, cm_root, image_per_scene=2, max_gs_num=100,
        pad_to=128, background_color=[0, 0, 0],
        cache_steps=2, cache_num_scenes=3)
    sizes = iter([50, 60, 70, 80, 90])

    real_load = SplatfactoScenes.load_scene

    def load_varying(self, idx):
        scene = real_load(self, idx)
        n = next(sizes)
        scene["gs_params"] = {k: v[:n] for k, v in scene["gs_params"].items()}
        return scene

    monkeypatch.setattr(SplatfactoScenes, "load_scene", load_varying)
    # hit each scene cache entry cache_steps times with several different
    # shapes resident; pre-fix this raised "operands could not be broadcast"
    for idx in [0, 1, 0, 1, 0, 1, 2, 2]:
        ds._cached_scene(idx % len(ds.folders))
    assert len(ds._cache) <= 3


def test_corrupt_gaussians_augmentation():
    """corrupt_gaussians: fresh artifacts per draw, input untouched,
    floaters appended within capacity, prob=0 is identity."""
    from splatformer_tpu.data.dataset import corrupt_gaussians
    rng = np.random.default_rng(0)
    n, pad_to = 200, 256
    gs = {
        "means": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "scales": rng.normal(-4, 0.5, (n, 3)).astype(np.float32),
        "quats": np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        "opacities": rng.normal(1, 0.5, (n, 1)).astype(np.float32),
        "features_dc": rng.normal(0, 1, (n, 3)).astype(np.float32),
        "features_rest": rng.normal(0, 0.1, (n, 3, 3)).astype(np.float32),
    }
    snapshot = {k: v.copy() for k, v in gs.items()}
    aug = dict(prob=1.0, noise_means=0.01, noise_scales=0.1,
               noise_quats=0.05, noise_opacities=0.2, floater_frac=0.3)

    out = corrupt_gaussians(gs, np.random.default_rng(1), aug, pad_to)
    # input never mutated (scenes are cached and reused)
    for k in gs:
        np.testing.assert_array_equal(gs[k], snapshot[k])
    m = out["means"].shape[0]
    assert n <= m <= pad_to
    for k, v in out.items():
        assert v.shape[0] == m, k
        assert np.isfinite(v).all(), k
    # attributes actually jittered
    assert not np.allclose(out["means"][:n], gs["means"])
    # floaters sit in the unit cube with upward bias
    if m > n:
        fl = out["means"][n:]
        assert fl.min() >= 0.0 and fl.max() <= 1.0
        assert fl[:, 2].mean() > 0.35

    # two draws differ (resampling is the point)
    out2 = corrupt_gaussians(gs, np.random.default_rng(2), aug, pad_to)
    assert not np.allclose(out["means"][:n], out2["means"][:n])

    # prob=0: identity
    same = corrupt_gaussians(gs, np.random.default_rng(3),
                             dict(prob=0.0), pad_to)
    for k in gs:
        np.testing.assert_array_equal(same[k], gs[k])
