"""2-D (data x gauss) mesh training: scene DP composed with Gaussian-axis
sharded rendering — the north-star composition (scenes too big for one
chip's render memory, trained data-parallel; VERDICT r1 weak #4 / next #6).

Design: the FeaturePredictor forward is cheap in memory relative to
rendering (per-entry buffers + image-space tensors dominate at large
N * V * H * W), so the model runs REPLICATED within each gauss group (every
member computes the identical refinement for its data-row's scene) while
rendering runs Gaussian-sharded via parallel/gauss_shard.py: each member
renders only its shard's contribution to its pixel-row block, the binning
halo exchange (all_to_all over ICI) assembles depth-sorted tiles, and each
member composites + computes the photometric loss on its own row block.

Gradients: each member's partial loss grad carries its row block's
contribution; `psum` over the gauss axis reconstructs the full dL/dparams
for the scene, then `pmean` over the data axis is the DDP reduction. Both
collectives ride ICI inside one jitted step.

RNG folds in the data index ONLY, so gauss-group members agree on
droppath/order shuffles (required for the replicated-forward invariant).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from splatformer_tpu.ops.types import RasterizeConfig
from splatformer_tpu.parallel.gauss_shard import make_gauss_shard_body
from splatformer_tpu.training.train_step import SceneBatch, TrainState

DATA_AXIS = "data"
GAUSS_AXIS = "gauss"


def make_mesh_2d(n_data: int, n_gauss: int, devices=None) -> Mesh:
    import numpy as np
    devs = list(devices) if devices is not None else jax.devices()
    assert len(devs) >= n_data * n_gauss, (len(devs), n_data, n_gauss)
    grid = np.asarray(devs[: n_data * n_gauss]).reshape(n_data, n_gauss)
    return Mesh(grid, (DATA_AXIS, GAUSS_AXIS))


def shard_batch_2d(mesh: Mesh, batch: SceneBatch) -> SceneBatch:
    """Batch leaves carry a leading data axis; replicate over gauss."""
    from jax.sharding import NamedSharding
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def make_train_step_2d(model, tx, mesh: Mesh,
                       raster_config: RasterizeConfig,
                       image_l1_loss_weight: float = 1.0,
                       height: Optional[int] = None,
                       width: Optional[int] = None,
                       exchange_budget: Optional[int] = None):
    """Returns jitted step(state, batch, rng) -> (state, metrics) on a
    (data, gauss) mesh. `batch` has one scene per data row, replicated over
    the gauss axis (shard_batch_2d)."""
    g_size = mesh.shape[GAUSS_AXIS]

    def per_device(state: TrainState, batch: SceneBatch, rng: jax.Array):
        batch = jax.tree.map(lambda a: a[0], batch)  # this data-row's scene
        h = height or batch.images.shape[1]
        w = width or batch.images.shape[2]
        body, rows_loc = make_gauss_shard_body(
            h, w, raster_config, g_size, GAUSS_AXIS, exchange_budget)

        # identical rngs across the gauss group (replicated forward)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        rng = jax.random.fold_in(rng, state.step)
        rngs = {name: jax.random.fold_in(rng, i) for i, name in
                enumerate(("droppath", "orders", "merging", "downsample"))}

        n = batch.scene.num_points
        assert n % g_size == 0, (n, g_size)
        n_loc = n // g_size
        gi = jax.lax.axis_index(GAUSS_AXIS)
        rows_tot = rows_loc * g_size
        v = batch.images.shape[0]
        # gt rows for this member's block (pad to the row grid; rows past
        # the true image height are masked out of the loss)
        gt_pad = jnp.pad(batch.images,
                         ((0, 0), (0, rows_tot - h), (0, 0), (0, 0)))
        gt_loc = jax.lax.dynamic_slice_in_dim(gt_pad, gi * rows_loc,
                                              rows_loc, axis=1)
        row_ids = gi * rows_loc + jnp.arange(rows_loc)
        row_mask = (row_ids < h).astype(jnp.float32)[None, :, None, None]

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            (refined, _), mut = model.apply(
                variables, batch.scene, True, rngs=rngs,
                mutable=["batch_stats"])
            scene_loc = jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, gi * n_loc, n_loc,
                                                       0), refined)
            rgb, _, dropped = body(
                scene_loc, batch.cameras.c2w, batch.cameras.fx,
                batch.cameras.fy, batch.cameras.cx, batch.cameras.cy,
                batch.background)
            # partial loss: this member's row block only — psum of the grads
            # over the gauss axis reconstructs the full-image gradient
            denom = float(v * h * w * 3)
            l1_part = jnp.sum(jnp.abs(rgb - gt_loc) * row_mask) / denom
            loss_part = image_l1_loss_weight * l1_part
            metrics = {"image_l1": l1_part, "total_loss": loss_part,
                       "num_dropped": jnp.max(dropped).astype(jnp.float32)}
            return loss_part, (mut.get("batch_stats", state.batch_stats),
                               metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        grads = jax.lax.psum(grads, GAUSS_AXIS)       # assemble full scene
        grads = jax.lax.pmean(grads, DATA_AXIS)       # DDP reduction
        metrics = jax.lax.psum(metrics, GAUSS_AXIS)
        metrics["num_dropped"] = metrics["num_dropped"] / g_size  # undo psum
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               batch_stats=new_bs, opt_state=opt_state)
        return new_state, metrics

    step = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(step, donate_argnums=(0,))
