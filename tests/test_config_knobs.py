"""Config knobs that must actually change behavior: ALGM threshold,
proportional attention, tome_attention, turn_off_bn, resume_ckpt partial load
(VERDICT round-1 items 4-5: no declared-but-unread config keys)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatformer_tpu.models.point import make_point_batch
from splatformer_tpu.models.ptv3 import SerializedAttention
from splatformer_tpu.ops.merging import process_merging


def make_qkv(rng, b=2, h=2, k=32, c=8):
    return tuple(jnp.asarray(rng.normal(size=(b, h, k, c)), jnp.float32)
                 for _ in range(3))


def test_algm_threshold_changes_merge_counts(rng):
    q, k, v = make_qkv(rng)
    def merged_count(threshold):
        _, _, _, size, _ = process_merging(
            "algm", q, k, v, {"r": 0.5, "threshold": threshold})
        return int(jnp.sum(size == 0.0))

    # random unit vectors: cosine > 0.99 essentially never, cosine > -1 always
    assert merged_count(1.01) == 0
    assert merged_count(-1.0) == 2 * 2 * (32 // 2)  # every pair, r caps at K/2
    lo, hi = merged_count(0.0), merged_count(0.9)
    assert lo >= hi  # lower threshold merges at least as many


def test_algm_uncapped_vs_capped(rng):
    q, k, v = make_qkv(rng)
    # threshold -1: every pair qualifies; r caps the merges per (b, h)
    _, _, _, size, _ = process_merging(
        "algm", q, k, v, {"r": 0.25, "threshold": -1.0})
    dead = np.asarray(jnp.sum(size[..., 0] == 0.0, axis=-1))
    np.testing.assert_array_equal(dead, 32 // 4)  # int(32 * 0.25) / pair


def test_algm_identity_when_nothing_qualifies(rng):
    q, k, v = make_qkv(rng)
    q2, k2, v2, size, unmerge = process_merging(
        "algm", q, k, v, {"r": 0.5, "threshold": 1.01})
    np.testing.assert_allclose(np.asarray(size), 1.0)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v))
    np.testing.assert_allclose(np.asarray(unmerge(v2)), np.asarray(v))


def test_algm_unmerge_restores_pair_heads():
    # two identical adjacent tokens -> merged; dead slot must unmerge to the
    # pair-head (merged) feature
    base = np.random.default_rng(0).normal(size=(1, 1, 8, 4)).astype(np.float32)
    base[0, 0, 1] = base[0, 0, 0]
    x = jnp.asarray(base)
    q2, k2, v2, size, unmerge = process_merging(
        "algm", x, x, x, {"r": 0.5, "threshold": 0.999})
    s = np.asarray(size)[0, 0, :, 0]
    assert s[0] == 2.0 and s[1] == 0.0
    out = np.asarray(unmerge(v2))
    np.testing.assert_allclose(out[0, 0, 0], base[0, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 1], out[0, 0, 0])


def test_proportional_attention_masks_dead_keys(rng):
    """The composed contract the attention module relies on: softmax over
    logits + log(size) gives zero weight to size-0 keys and weights
    size-2 keys ~2x a size-1 key of equal similarity."""
    q, k, v = make_qkv(rng, b=1, h=1, k=8, c=4)
    q2, k2, v2, size, _ = process_merging(
        "algm", q, k, v, {"r": 0.5, "threshold": -1.0})
    logits = jnp.einsum("bhqc,bhkc->bhqk", q2, k2)
    bias = jnp.log(jnp.maximum(size[..., 0], 1e-30))[..., None, :]
    attn = jax.nn.softmax(logits + bias, axis=-1)
    dead = np.asarray(size[..., 0])[0, 0] == 0.0
    np.testing.assert_allclose(np.asarray(attn)[0, 0][:, dead], 0.0,
                               atol=1e-12)


def test_proportional_attention_biases_key_axis(rng):
    """Regression for the (B,H,K',1) broadcast bug: merging exact-duplicate
    tokens is LOSSLESS iff the size bias lands on the KEY axis (ToMe eq. 2);
    a query-axis bias is a softmax no-op and fails this exactness."""
    x = rng.normal(size=(1, 1, 16, 4)).astype(np.float32)
    x[..., 1::2, :] = x[..., 0::2, :]  # each even/odd pair identical
    q = k = v = jnp.asarray(x)
    ref = jnp.einsum(
        "bhqk,bhkc->bhqc",
        jax.nn.softmax(jnp.einsum("bhqc,bhkc->bhqk", q, k), axis=-1), v)

    q2, k2, v2, size, unmerge = process_merging("tome", q, k, v, {"r": 0.5})
    assert q2.shape[-2] == 8 and float(size.min()) == 2.0  # all pairs merged
    bias = jnp.log(size[..., 0])[..., None, :]  # KEY axis, as the module does
    logits = jnp.einsum("bhqc,bhkc->bhqk", q2, k2) + bias
    out = jnp.einsum("bhqk,bhkc->bhqc", jax.nn.softmax(logits, axis=-1), v2)
    np.testing.assert_allclose(np.asarray(unmerge(out)), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_tome_attention_false_disables_attention_merging(rng):
    n, c = 64, 16
    coord = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    pb = make_point_batch(coord, feat, jnp.ones(n, bool), grid_resolution=32)

    def run(info):
        attn = SerializedAttention(channels=c, num_heads=2, patch_size=16,
                                   order_index=0, additional_info=info)
        params = attn.init(jax.random.key(0), feat, pb, False)
        return attn.apply(params, feat, pb, False)

    off = run({"tome": "tome", "r": 0.5, "tome_attention": False})
    base = run(None)
    on = run({"tome": "tome", "r": 0.5, "tome_attention": True})
    np.testing.assert_allclose(np.asarray(off), np.asarray(base), rtol=1e-6)
    assert not np.allclose(np.asarray(on), np.asarray(base))


def test_turn_off_bn_removes_batchnorm(rng):
    from splatformer_tpu.models.ptv3 import PointTransformerV3

    n, c = 128, 8
    coord = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    pb = make_point_batch(coord, feat, jnp.ones(n, bool), grid_resolution=32)
    kwargs = dict(
        in_channels=c, enc_depths=(1, 1), enc_channels=(8, 16),
        enc_num_head=(1, 2), enc_patch_size=(16, 16), dec_depths=(1,),
        dec_channels=(8,), dec_num_head=(1,), dec_patch_size=(16,),
        stride=(2,), drop_path=0.0, remat_blocks=False)
    model_on = PointTransformerV3(**kwargs)
    model_off = PointTransformerV3(turn_off_bn=True, **kwargs)
    v_on = model_on.init(jax.random.key(0), pb, False)
    v_off = model_off.init(jax.random.key(0), pb, False)
    assert "batch_stats" in v_on
    assert not v_off.get("batch_stats", {})
    assert "embed_norm" in v_on["params"]
    assert "embed_norm" not in v_off["params"]
    y, _ = model_off.apply(v_off, pb, False)
    assert bool(jnp.isfinite(y).all())


def test_resume_ckpt_partial_backbone_load(rng, tmp_path):
    """Shape-tolerant backbone-only load
    (reference models/pointtransformer_v3.py:164-178)."""
    import optax

    from splatformer_tpu.models.feature_predictor import FeaturePredictor
    from splatformer_tpu.ops.types import GaussianScene
    from splatformer_tpu.training import checkpoints as ckpt_lib
    from splatformer_tpu.training.train_step import TrainState

    n = 64
    scene = GaussianScene(
        means=jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32),
        scales=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        quats=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        opacities=jnp.asarray(rng.normal(size=(n, 1)), jnp.float32),
        features_dc=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        features_rest=jnp.asarray(rng.normal(size=(n, 3, 3)), jnp.float32),
        mask=jnp.ones((n,), bool))

    bk = dict(enc_depths=(1, 1), enc_channels=(8, 16), enc_num_head=(1, 2),
              enc_patch_size=(16, 16), dec_depths=(1,), dec_channels=(8,),
              dec_num_head=(1,), dec_patch_size=(16,), stride=(2,),
              drop_path=0.0, remat_blocks=False)
    model_a = FeaturePredictor(sh_degree=1, output_head_width=16,
                               output_head_nlayer=2, grid_resolution=32,
                               backbone_kwargs=bk)
    params_a = model_a.init(jax.random.key(1), scene, False)["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params_a,
                       batch_stats={}, opt_state=optax.adam(1e-3).init(params_a))
    ckpt_lib.save_checkpoint(str(tmp_path / "ckpt"), state, 0)

    # target model: same backbone, DIFFERENT head width -> heads keep init
    model_b = FeaturePredictor(sh_degree=1, output_head_width=32,
                               output_head_nlayer=2, grid_resolution=32,
                               backbone_kwargs=bk)
    params_b = model_b.init(jax.random.key(2), scene, False)["params"]
    merged, report = ckpt_lib.load_partial_params(
        str(tmp_path / "ckpt"), params_b, scope="backbone")
    assert report["loaded"] and not report["mismatched"]
    # backbone leaves equal the checkpoint, heads untouched
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(merged["backbone"])[0]),
        np.asarray(jax.tree.leaves(params_a["backbone"])[0]))
    h_b = jax.tree.leaves(params_b["head_means"])
    h_m = jax.tree.leaves(merged["head_means"])
    for a, b in zip(h_b, h_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_pitome_protected_ratio_limits_merges(rng):
    q, k, v = make_qkv(rng, b=1, h=1, k=32, c=8)
    # protect half the tokens: merge count must drop vs unprotected
    _, _, _, s0, _ = process_merging(
        "pitome", q, k, v, {"r": 0.9, "margin": 0.9, "alpha": 1.0,
                            "protected_ratio": 0.0})
    _, _, _, s1, _ = process_merging(
        "pitome", q, k, v, {"r": 0.9, "margin": 0.9, "alpha": 1.0,
                            "protected_ratio": 0.5})
    merged0 = 32 - s0.shape[-2]
    merged1 = 32 - s1.shape[-2]
    assert merged1 < merged0
    assert merged1 <= 32 // 2 - 8  # at most half - protected src count


def test_pt_embedding_stem(rng):
    from splatformer_tpu.models.ptv3 import PointTransformerV3

    n, c = 128, 8
    coord = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    pb = make_point_batch(coord, feat, jnp.ones(n, bool), grid_resolution=32)
    kwargs = dict(
        in_channels=c, enc_depths=(1, 1), enc_channels=(8, 16),
        enc_num_head=(1, 2), enc_patch_size=(16, 16), dec_depths=(1,),
        dec_channels=(8,), dec_num_head=(1,), dec_patch_size=(16,),
        stride=(2,), drop_path=0.0, remat_blocks=False)
    model = PointTransformerV3(embedding_type="PT_embedding", **kwargs)
    variables = model.init(jax.random.key(0), pb, False)
    assert "embed_conv_kernel" in variables["params"]
    assert "embed_linear" not in variables["params"]
    y, _ = model.apply(variables, pb, False)
    assert y.shape[0] == n and bool(jnp.isfinite(y).all())


def test_resume_from_step_offsets_counter(tmp_path):
    from splatformer_tpu.configs import build_full_config
    from splatformer_tpu.training.loop import run_training

    cfg = build_full_config("ptv3_base", "synthetic", "default")
    cfg.dataset.n_scenes = 1
    cfg.dataset.n_gaussians = 128
    cfg.dataset.pad_to = 128
    cfg.dataset.max_gs_num = 128
    cfg.dataset.image_size = 16
    cfg.dataset.image_per_scene = 1
    b = cfg.model.backbone
    b.enc_channels = (8, 16)
    b.dec_channels = (8,)
    b.enc_depths = (1, 1)
    b.enc_num_head = (1, 2)
    b.dec_depths = (1,)
    b.dec_num_head = (1,)
    b.stride = (2,)
    b.patch_size = 16
    b.drop_path = 0.0
    b.pool_capacity_factors = (1.0,)
    cfg.model.output_head_width = 8
    cfg.model.output_head_nlayer = 2
    cfg.model.grid_resolution = 16
    cfg.train.eval_interval = 0
    cfg.train.log_image_interval = 0
    cfg.train.bf16 = False
    cfg.train.resume_from_step = 3
    state, *_ = run_training(cfg, str(tmp_path / "r"), max_steps=4)
    assert int(state.step) == 4  # started at 3, ran 1 step


def test_prefetch_iterator_order():
    from splatformer_tpu.data.dataset import prefetch_iterator
    assert list(prefetch_iterator(iter(range(20)), depth=3)) == list(range(20))


def test_downsample_with_input_feat_to_mlp():
    """Input downsampling + input_feat_to_mlp (the gin default) must concat
    the ORIGINAL per-point features with the upsampled logits — caught in
    round 4 by the sweep smoke test (reduced feat concatenated with
    full-size y)."""
    import jax
    import numpy as np
    from splatformer_tpu.data.synthetic import random_scene
    from splatformer_tpu.models.feature_predictor import FeaturePredictor

    scene = random_scene(np.random.default_rng(0), 512, sh_degree=1)
    for method, knobs in (("fps", {"downsample_ratio": 0.5}),
                          ("voxel", {"voxel_size": 0.05}),
                          ("random", {"downsample_ratio": 0.5})):
        m = FeaturePredictor(
            backbone_type="PT", sh_degree=1, grid_resolution=64,
            res_feature_activation={"means": "tanh"},
            input_feat_to_mlp=True,
            additional_info={"downsample": method, **knobs},
            backbone_kwargs=dict(
                enc_depths=(1,), enc_channels=(16,), enc_num_head=(2,),
                enc_patch_size=(16,), dec_depths=(), dec_channels=(),
                dec_num_head=(), dec_patch_size=(), stride=(),
                drop_path=0.0, pool_capacity_factors=()))
        v = m.init(jax.random.key(0), scene, False)
        refined, _ = m.apply(v, scene, False)
        assert refined.means.shape == scene.means.shape, method
