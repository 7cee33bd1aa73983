"""Config system, FLOPs accounting, viewer export, downsamplers."""
import jax
import jax.numpy as jnp
import numpy as np

from splatformer_tpu.configs import apply_overrides, build_full_config
from splatformer_tpu.utils.flops import (block_attention_flops,
                                         ptv3_attention_mlp_gflops)
from splatformer_tpu.utils.viewer import (export_ply_for_viewer,
                                          prepare_viewer, read_ply, write_ply)


def test_config_stack_and_overrides():
    cfg = build_full_config("ptv3_base", "synthetic", "default",
                            ["model.grid_resolution=64",
                             "train.total_steps=100",
                             "model.additional_info.r=0.4"])
    assert cfg.model.grid_resolution == 64
    assert cfg.train.total_steps == 100
    assert cfg.model.additional_info.r == 0.4
    assert cfg.model.backbone.stride == (1, 2, 2, 2)


def test_variant_configs_resolve():
    for name in ("ptv3_tome", "ptv3_pitome", "ptv3_tofu", "ptv3_prune",
                 "ptv3_patch", "ptv3_wpatch", "ptv3_algm", "ptv3_fps",
                 "ptv3_voxel", "ptv3_drop"):
        cfg = build_full_config(name, "synthetic", "default")
        info = dict(cfg.model.additional_info)
        assert ("tome" in info) or ("downsample" in info)


def test_merge_rate_reduces_attention_flops():
    base = block_attention_flops(100_000, 64, 2, 128, {"tome": "base", "r": 0})
    merged = block_attention_flops(100_000, 64, 2, 128,
                                   {"tome": "tome", "r": 0.5})
    assert merged < base
    bk = dict(enc_depths=(2, 2), enc_channels=(64, 96), enc_num_head=(2, 4),
              enc_patch_size=(128, 128), dec_depths=(2,), dec_channels=(96,),
              dec_num_head=(4,), dec_patch_size=(128,), mlp_ratio=4.0)
    pts = {"enc0": 100_000, "enc1": 50_000, "dec0": 100_000}
    a, m = ptv3_attention_mlp_gflops(bk, pts, {"tome": "base", "r": 0})
    assert a > 0 and m > 0


def test_ply_roundtrip_and_viewer_export(tmp_path, rng):
    n = 50
    fields = {"x": rng.normal(size=n).astype(np.float32),
              "y": rng.normal(size=n).astype(np.float32),
              "z": rng.normal(size=n).astype(np.float32)}
    path = str(tmp_path / "test.ply")
    write_ply(path, fields)
    back = read_ply(path)
    for k in fields:
        np.testing.assert_allclose(back[k], fields[k], rtol=1e-6)

    gs = {"means": rng.normal(size=(n, 3)).astype(np.float32),
          "scales": rng.normal(size=(n, 3)).astype(np.float32),
          "quats": rng.normal(size=(n, 4)).astype(np.float32),
          "opacities": rng.normal(size=(n, 1)).astype(np.float32),
          "features_dc": rng.normal(size=(n, 3)).astype(np.float32),
          "features_rest": rng.normal(size=(n, 3, 3)).astype(np.float32)}
    ply_path = str(tmp_path / "viewer" / "point_cloud.ply")
    export_ply_for_viewer(gs, ply_path)
    data = read_ply(ply_path)
    # Inria field set: positions, normals, f_dc, f_rest, opacity, scales, rots
    assert "f_dc_0" in data and "f_rest_8" in data and "rot_3" in data
    np.testing.assert_allclose(data["x"], gs["means"][:, 0], rtol=1e-6)
    np.testing.assert_allclose(data["opacity"], gs["opacities"][:, 0],
                               rtol=1e-6)
    # f_rest uses the Inria color-major transpose
    np.testing.assert_allclose(data["f_rest_0"], gs["features_rest"][:, 0, 0],
                               rtol=1e-6)
    np.testing.assert_allclose(data["f_rest_1"], gs["features_rest"][:, 1, 0],
                               rtol=1e-6)

    cams = {"camera_to_worlds": np.tile(np.eye(4)[None, :3, :4], (2, 1, 1)),
            "fx": 50.0, "fy": 50.0, "width": 64, "height": 64}
    prepare_viewer(cams, str(tmp_path / "viewer"), sh_degree=1)
    import json
    with open(tmp_path / "viewer" / "cameras.json") as f:
        meta = json.load(f)
    assert len(meta) == 2 and meta[0]["fx"] == 50.0


def test_downsample_ops(rng):
    from splatformer_tpu.ops.downsample import (downsample_dispatch,
                                                furthest_point_sampling)
    n = 256
    coord = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    mask = jnp.arange(n) < 200

    cents = furthest_point_sampling(coord, mask, 16)
    assert len(set(np.asarray(cents).tolist())) == 16
    assert np.asarray(cents).max() < 200  # only valid points picked

    for method, info in (("fps", {"downsample_ratio": 0.25}),
                         ("voxel", {"voxel_size": 0.1,
                                    "voxel_capacity_factor": 1.0}),
                         ("random", {"downsample_ratio": 0.5})):
        c, f, m, up = downsample_dispatch(method, info, coord, feat, mask,
                                          rng=jax.random.key(0))
        assert c.shape[0] % 128 == 0
        y = jnp.ones((c.shape[0], 4))
        mapped = up(y)
        assert mapped.shape == (n, 4)
        assert bool(jnp.isfinite(mapped).all())
