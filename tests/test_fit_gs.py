"""Per-scene 3DGS fitting (training/fit_gs.py): optimization makes real
progress on a synthetic target, and densify/prune keep fixed-shape
invariants."""
import jax
import jax.numpy as jnp
import numpy as np

from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
from splatformer_tpu.ops.render import render_images
from splatformer_tpu.ops.types import RasterizeConfig
from splatformer_tpu.training import fit_gs

RCFG = RasterizeConfig(max_intersects=2**13, tiles_per_gauss=16,
                       max_per_tile=1024, chunk_size=32, use_pallas=False)


def _target_views(hw=48, views=5):
    rng = np.random.default_rng(11)
    gt = random_scene(rng, 384, sh_degree=1, n_valid=384)
    # make the target opaque-ish and chunky so it is fittable
    gt = gt.replace(scales=jnp.clip(gt.scales + 1.5, -5.0, -2.5),
                    opacities=gt.opacities + 2.0)
    cams = orbit_cameras(views, hw, hw)
    imgs, _ = jax.jit(lambda s: render_images(s, cams, jnp.zeros(3), RCFG))(gt)
    return jnp.clip(imgs, 0.0, 1.0), cams


def test_fit_improves_psnr():
    images, cams = _target_views()
    cfg = fit_gs.FitConfig(
        steps=220, capacity=1024, warmup_steps=40, densify_every=40,
        densify_stop=160, reset_opacity_every=0, sh_degree=1,
        sh_degree_interval=60, densify_budget_frac=0.05,
        lr_means=2e-3, lr_means_final=2e-4)
    tx = fit_gs.build_fit_optimizer(cfg)
    state0 = fit_gs.init_state(cfg, tx, n_init=256, seed=0)
    scene0 = fit_gs._scene(state0.params, state0.mask)
    before = fit_gs.eval_fit(scene0, images, cams, RCFG)

    scene, metrics = fit_gs.fit_gaussians(images, cams, cfg, RCFG, seed=0)
    after = fit_gs.eval_fit(scene, images, cams, RCFG)

    assert np.isfinite(metrics["loss"])
    assert after["psnr"] > before["psnr"] + 4.0, (before, after)
    assert after["psnr"] > 18.0, (before, after)
    # fixed-shape invariants
    assert scene.means.shape == (cfg.capacity, 3)
    n = int(jnp.sum(scene.mask))
    assert 0 < n <= cfg.capacity
    for k in fit_gs.ATTRS:
        assert bool(jnp.all(jnp.isfinite(getattr(scene, k)))), k


def test_densify_slot_invariants():
    cfg = fit_gs.FitConfig(capacity=256, densify_budget_frac=0.25,
                           densify_grad_thresh=0.0, steps=10)
    tx = fit_gs.build_fit_optimizer(cfg)
    state = fit_gs.init_state(cfg, tx, n_init=64, seed=1)
    # forge densification stats: every valid Gaussian is a candidate
    state = state._replace(
        grad_accum=jnp.where(state.mask, 1.0, 0.0),
        grad_count=jnp.ones_like(state.grad_count))
    densify = fit_gs.make_densify(cfg, tx)
    n0 = int(jnp.sum(state.mask))
    state2, n_new = densify(state, jax.random.key(0))
    n1 = int(jnp.sum(state2.mask))
    budget = int(cfg.capacity * cfg.densify_budget_frac)
    assert int(n_new) == budget  # all candidates above threshold, slots free
    # growth equals insertions minus prunes; mask never exceeds capacity
    assert n0 < n1 <= cfg.capacity
    # stats reset after densify
    assert float(jnp.sum(state2.grad_accum)) == 0.0
    # new slots carry finite params
    for k in fit_gs.ATTRS:
        assert bool(jnp.all(jnp.isfinite(state2.params[k]))), k


def test_opacity_reset():
    cfg = fit_gs.FitConfig(capacity=128, steps=10)
    tx = fit_gs.build_fit_optimizer(cfg)
    state = fit_gs.init_state(cfg, tx, n_init=32, seed=2)
    state = state._replace(params=dict(
        state.params, opacities=jnp.full((128, 1), 3.0)))
    state2 = fit_gs.reset_opacities(state, value=0.01)
    op = jax.nn.sigmoid(state2.params["opacities"])
    assert float(op.max()) <= 0.0101
