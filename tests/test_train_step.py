"""Multi-device DP training step on the virtual 8-CPU mesh
(BASELINE config 4 analog; SURVEY.md §4 'fake backend' testing)."""
import jax
import jax.numpy as jnp
import numpy as np

from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
from splatformer_tpu.models.feature_predictor import FeaturePredictor
from splatformer_tpu.ops.types import RasterizeConfig
from splatformer_tpu.parallel.mesh import make_mesh, shard_batch
from splatformer_tpu.training.optim import build_optimizer, build_schedule
from splatformer_tpu.training.train_step import (SceneBatch, init_state,
                                                 make_eval_step,
                                                 make_train_step)

TINY = dict(enc_depths=(1, 1), enc_channels=(16, 32), enc_num_head=(2, 4),
            enc_patch_size=(16, 16), dec_depths=(1,), dec_channels=(16,),
            dec_num_head=(2,), dec_patch_size=(16,), stride=(2,),
            drop_path=0.0, pool_capacity_factors=(0.75,))

RCFG = RasterizeConfig(max_intersects=2**12, max_per_tile=256,
                       tiles_per_gauss=16, chunk_size=32)


def make_model(axis=None, zeroinit=True):
    return FeaturePredictor(backbone_type="PT", sh_degree=1,
                            grid_resolution=64, zeroinit=zeroinit,
                            res_feature_activation={"means": "tanh"},
                            bn_axis_name=axis, backbone_kwargs=TINY)


def make_batch(n_dev, n=128, v=2, hw=32):
    def one(i):
        r = np.random.default_rng(i)
        scene = random_scene(r, n, sh_degree=1, n_valid=n - 8)
        cams = orbit_cameras(v, hw, hw)
        imgs = jnp.asarray(r.uniform(size=(v, hw, hw, 3)), jnp.float32)
        return SceneBatch(scene=scene, cameras=cams, images=imgs,
                          background=jnp.zeros(3))

    return jax.tree.map(lambda *xs: jnp.stack(xs), *[one(i) for i in range(n_dev)])


def test_schedules():
    s = build_schedule(1.0, "linear", 100)
    assert np.isclose(float(s(0)), 1.0) and np.isclose(float(s(50)), 0.5)
    s = build_schedule(1.0, "cosine", 100)
    assert float(s(100)) < 1e-6
    s = build_schedule(1.0, "constant", 100, warmup_steps=10)
    assert float(s(5)) < 1.0 and np.isclose(float(s(50)), 1.0)


def test_dp_train_step_8dev_loss_decreases():
    n_dev = 8
    mesh = make_mesh(n_devices=n_dev)
    model = make_model(axis="data")
    batch = shard_batch(mesh, make_batch(n_dev))
    example = jax.tree.map(lambda a: a[0], batch.scene)
    params0 = model.init(jax.random.key(0), example, False)["params"]
    tx = build_optimizer(params0, lr_dict={"base": 1e-2, "backbone": 1e-2},
                         total_steps=50)
    state = init_state(model, tx, example, jax.random.key(0))
    step = make_train_step(model, tx, mesh, RCFG)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.key(42))
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_grad_accumulation_multisteps():
    mesh = make_mesh(n_devices=2)
    model = make_model(axis="data")
    batch = shard_batch(mesh, make_batch(2))
    example = jax.tree.map(lambda a: a[0], batch.scene)
    params0 = model.init(jax.random.key(0), example, False)["params"]
    tx = build_optimizer(params0, lr_dict={"base": 1e-3, "backbone": 1e-3},
                         total_steps=50, accumulate_steps=2)
    state = init_state(model, tx, example, jax.random.key(0))
    step = make_train_step(model, tx, mesh, RCFG)

    def flat(params):
        return np.concatenate([np.asarray(l).ravel()
                               for l in jax.tree.leaves(params)])

    p0 = flat(state.params)
    state, _ = step(state, batch, jax.random.key(1))
    np.testing.assert_array_equal(p0, flat(state.params))  # accum 1/2: no-op
    state, _ = step(state, batch, jax.random.key(2))
    assert not np.array_equal(p0, flat(state.params))  # accum 2/2: applied


def test_finetune_filter_freezes_other_params():
    mesh = make_mesh(n_devices=2)
    # zeroinit=False: the qkv-only finetune mode is used on trained
    # checkpoints (the fork's optimizers.py:46-47 hack); with zero-init heads
    # no gradient would reach the backbone at all
    model = make_model(axis="data", zeroinit=False)
    batch = shard_batch(mesh, make_batch(2))
    example = jax.tree.map(lambda a: a[0], batch.scene)
    params0 = model.init(jax.random.key(0), example, False)["params"]
    tx = build_optimizer(params0, lr_dict={"base": 1e-2, "backbone": 1e-2},
                         total_steps=50, finetune_filter=["attn/qkv"])
    state = init_state(model, tx, example, jax.random.key(0))
    step = make_train_step(model, tx, mesh, RCFG)
    before = jax.tree_util.tree_map_with_path(lambda p, x: np.asarray(x),
                                              state.params)
    # zero-init head last layers mean backbone grads are exactly zero at the
    # first step; run a few steps so gradient reaches the qkv weights
    for i in range(3):
        state, _ = step(state, batch, jax.random.key(1 + i))
    flat_before = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_after = jax.tree_util.tree_flatten_with_path(state.params)[0]
    changed_qkv, changed_other = 0, 0
    for (path_b, b), (path_a, a) in zip(flat_before, flat_after):
        key = "/".join(p.key if hasattr(p, "key") else str(p) for p in path_b)
        if np.array_equal(b, np.asarray(a)):
            continue
        if "attn/qkv" in key:
            changed_qkv += 1
        else:
            changed_other += 1
    assert changed_qkv > 0 and changed_other == 0


def test_eval_step_shards_scenes():
    n_dev = 4
    mesh = make_mesh(n_devices=n_dev)
    model = make_model()
    batch = shard_batch(mesh, make_batch(n_dev))
    example = jax.tree.map(lambda a: a[0], batch.scene)
    variables = model.init(jax.random.key(0), example, False)
    ev = make_eval_step(model, mesh, RCFG)
    rgb, alpha, m_psnr, m_ssim, n_drop = ev(variables["params"],
                                            variables.get("batch_stats", {}),
                                            batch)
    assert rgb.shape == (n_dev, 2, 32, 32, 3)
    assert m_psnr.shape == (n_dev, 2)
    assert bool(jnp.isfinite(m_psnr).all()) and bool(jnp.isfinite(m_ssim).all())
    assert n_drop.shape == (n_dev,) and int(jnp.sum(n_drop)) == 0


def test_dryrun_multichip_entrypoint():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_pretrain_step_identity_loss_zero():
    # zero-init heads + residual outputs -> refined == input, so the pretrain
    # per-attribute L1 (create_pseudo_target contract) must be ~0 at init
    mesh = make_mesh(n_devices=2)
    model = make_model(axis="data")
    batch = shard_batch(mesh, make_batch(2))
    example = jax.tree.map(lambda a: a[0], batch.scene)
    params0 = model.init(jax.random.key(0), example, False)["params"]
    tx = build_optimizer(params0, lr_dict={"base": 1e-3, "backbone": 1e-3},
                         total_steps=10)
    state = init_state(model, tx, example, jax.random.key(0))
    step = make_train_step(model, tx, mesh, RCFG, pretrain=True)
    state, metrics = step(state, batch, jax.random.key(1))
    assert float(metrics["pretrain_loss"]) < 1e-5
    assert "pretrain/means" in metrics
