"""Per-head attention replay must reproduce the module's own computation
(reference hook parity, /root/reference/visualize.py:132-247)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatformer_tpu.data.synthetic import random_scene
from splatformer_tpu.models.feature_predictor import FeaturePredictor
from splatformer_tpu.utils.attn_replay import replay_model

BK = dict(enc_depths=(1, 1), enc_channels=(8, 16), enc_num_head=(2, 2),
          enc_patch_size=(16, 16), dec_depths=(1,), dec_channels=(8,),
          dec_num_head=(2,), dec_patch_size=(16,), stride=(2,),
          drop_path=0.0, remat_blocks=False)


def make(info):
    model = FeaturePredictor(sh_degree=1, output_head_width=16,
                             output_head_nlayer=2, grid_resolution=32,
                             additional_info=info, backbone_kwargs=BK)
    scene = random_scene(np.random.default_rng(0), 64, sh_degree=1)
    variables = model.init(jax.random.key(0), scene, False)
    return model, variables, scene


@pytest.mark.parametrize("info", [
    None,
    {"tome": "tome", "r": 0.5, "tome_attention": True},
    {"tome": "algm", "r": 0.5, "threshold": 0.0, "tome_attention": True},
])
def test_replay_matches_module_attention(info):
    model, variables, scene = make(info)
    replays = replay_model(model, variables, scene, BK, 16,
                           additional_info=info)
    assert replays, "no attention blocks captured"
    # the sown attn_feat equals the per-head replay concatenated over heads
    from splatformer_tpu.utils.attn_replay import collect_attention_blocks
    recs = collect_attention_blocks(model, variables, scene)
    for path, rep in replays.items():
        sown = recs[path]["attn_feat"]
        stacked = np.concatenate(rep["attn_feats"], axis=1)
        np.testing.assert_allclose(stacked, sown, rtol=1e-4, atol=1e-5)


def test_replay_base_equals_ori():
    model, variables, scene = make(None)
    replays = replay_model(model, variables, scene, BK, 16)
    for rep in replays.values():
        for a, b in zip(rep["attn_feats"], rep["ori_attn_feats"]):
            np.testing.assert_allclose(a, b)
        assert rep["size"] is None
        assert rep["n_effective_tokens"] == rep["n_tokens"]


def test_trace_back_colors_original_points():
    info = {"tome": "tome", "r": 0.5, "tome_attention": True,
            "trace_back": True}
    model, variables, scene = make(info)
    replays = replay_model(model, variables, scene, BK, 16,
                           additional_info=info)
    for rep in replays.values():
        n = rep["n_tokens"]
        assert rep["n_effective_tokens"] < n
        # traced-back colorings live on the block's original points
        for hi in range(len(rep["merged_colors"])):
            assert rep["merged_colors"][hi].shape == (n, 3)
            assert rep["merged_coords"][hi].shape == (n, 3)
        # merge groups: at least one color appears on >= 2 points
        c = rep["merged_colors"][0]
        _, counts = np.unique(np.round(c, 6), axis=0, return_counts=True)
        assert counts.max() >= 2


def test_no_trace_back_reports_merged_tokens():
    info = {"tome": "tome", "r": 0.5, "tome_attention": True,
            "trace_back": False}
    model, variables, scene = make(info)
    replays = replay_model(model, variables, scene, BK, 16,
                           additional_info=info)
    for rep in replays.values():
        n = rep["n_tokens"]
        for hi in range(len(rep["merged_colors"])):
            assert rep["merged_colors"][hi].shape[0] < n
