"""CI-scale refinement regression (VERDICT round-1 next-step 1): a tiny
FeaturePredictor trained for 100 steps on noisy-scene/clean-render pairs
must IMPROVE held-view PSNR over the input scenes — the product claim
(feed-forward 3DGS refinement) at smoke scale.

turn_off_bn keeps train/eval normalization identical (BN running stats lag
far behind at 100 steps with the reference's 0.01 momentum); the full-scale
proof on the generated OOD benchmark lives in the committed eval artifacts.
"""
import jax
import jax.numpy as jnp
import numpy as np

from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
from splatformer_tpu.models.feature_predictor import FeaturePredictor
from splatformer_tpu.ops.render import render_images
from splatformer_tpu.ops.types import RasterizeConfig
from splatformer_tpu.parallel.mesh import make_mesh, shard_batch
from splatformer_tpu.training.metrics import psnr
from splatformer_tpu.training.optim import build_optimizer
from splatformer_tpu.training.train_step import (SceneBatch, init_state,
                                                 make_train_step)

RCFG = RasterizeConfig(max_intersects=2**12, max_per_tile=256,
                       tiles_per_gauss=16, chunk_size=32)
TINY = dict(enc_depths=(1, 1), enc_channels=(16, 32), enc_num_head=(2, 4),
            enc_patch_size=(16, 16), dec_depths=(1,), dec_channels=(16,),
            dec_num_head=(2,), dec_patch_size=(16,), stride=(2,),
            drop_path=0.0, pool_capacity_factors=(0.75,), turn_off_bn=True)


def _pair(i, n=256, v=2, hw=48, noise=0.02):
    r = np.random.default_rng(i)
    clean = random_scene(r, n, sh_degree=1)
    cams = orbit_cameras(v, hw, hw)
    gt, _ = render_images(clean, cams, jnp.zeros(3), RCFG)
    corrupted = clean.replace(
        means=clean.means + noise * jnp.asarray(
            r.normal(size=clean.means.shape), jnp.float32),
        scales=clean.scales + 0.3 * jnp.asarray(
            r.normal(size=clean.scales.shape), jnp.float32))
    return SceneBatch(scene=corrupted, cameras=cams, images=gt,
                      background=jnp.zeros(3))


def test_training_improves_psnr_over_input():
    pairs = [_pair(i) for i in range(2)]
    batch = jax.tree.map(lambda *x: jnp.stack(x), *pairs)
    mesh = make_mesh(n_devices=2)
    model = FeaturePredictor(
        backbone_type="PT", sh_degree=1, grid_resolution=64,
        res_feature_activation={"means": "tanh"}, bn_axis_name="data",
        backbone_kwargs=TINY)
    example = jax.tree.map(lambda a: a[0], batch.scene)
    params0 = model.init(jax.random.key(0), example, False)["params"]

    def eval_psnr(params):
        vals = []
        for b in pairs:
            if params is None:
                refined = b.scene
            else:
                refined, _ = model.apply({"params": params}, b.scene, False)
            rgb, _ = render_images(refined, b.cameras, b.background, RCFG)
            vals.append(float(jnp.mean(psnr(rgb, b.images))))
        return sum(vals) / len(vals)

    input_psnr = eval_psnr(None)
    # zero-init heads: the untrained model is an identity refinement
    assert abs(eval_psnr(params0) - input_psnr) < 1e-3

    tx = build_optimizer(params0, lr_dict={"base": 1e-3, "backbone": 1e-3},
                         total_steps=1000)
    state = init_state(model, tx, example, jax.random.key(0))
    step = make_train_step(model, tx, mesh, RCFG)
    sb = shard_batch(mesh, batch)
    for i in range(100):
        state, metrics = step(state, sb, jax.random.key(7))

    refined_psnr = eval_psnr(jax.device_get(state.params))
    assert refined_psnr > input_psnr + 1.0, (refined_psnr, input_psnr)
