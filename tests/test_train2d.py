"""2-D (data x gauss) mesh training parity vs the 1-D DP step
(VERDICT round-1 item 6: the north-star gauss sharding must compose with
DP). Runs on the virtual 8-CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from splatformer_tpu.parallel.mesh import make_mesh, shard_batch
from splatformer_tpu.parallel.train2d import (make_mesh_2d,
                                              make_train_step_2d,
                                              shard_batch_2d)
from splatformer_tpu.training.optim import build_optimizer
from splatformer_tpu.training.train_step import init_state, make_train_step
from tests.test_train_step import RCFG, make_batch, make_model


def _setup(n_data, lr=1e-2):
    model = make_model(axis="data")
    batch = make_batch(n_data)
    example = jax.tree.map(lambda a: a[0], batch.scene)
    params0 = model.init(jax.random.key(0), example, False)["params"]
    tx = build_optimizer(params0, lr_dict={"base": lr, "backbone": lr},
                         total_steps=50)
    state = init_state(model, tx, example, jax.random.key(0))
    return model, tx, state, batch


def test_2d_mesh_parity_with_1d_dp():
    n_data, n_gauss = 2, 4
    model, tx, state, batch = _setup(n_data)

    mesh1 = make_mesh(n_devices=n_data)
    step1 = make_train_step(model, tx, mesh1, RCFG)
    s1, m1 = step1(state, shard_batch(mesh1, batch), jax.random.key(42))

    model2, tx2, state2, _ = _setup(n_data)
    mesh2 = make_mesh_2d(n_data, n_gauss)
    step2 = make_train_step_2d(model2, tx2, mesh2, RCFG)
    s2, m2 = step2(state2, shard_batch_2d(mesh2, batch), jax.random.key(42))

    # same loss (full-image L1 reassembled from row blocks)
    np.testing.assert_allclose(float(m2["image_l1"]), float(m1["image_l1"]),
                               rtol=2e-4)
    assert float(m2["num_dropped"]) == 0.0
    # same parameter update (grads psum'd over gauss == unsharded grads)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=2e-5)
    # same BN statistics (replicated forward + data-axis SyncBN)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_2d_mesh_loss_decreases():
    n_data, n_gauss = 2, 2
    model, tx, state, batch = _setup(n_data, lr=1e-3)
    mesh = make_mesh_2d(n_data, n_gauss)
    step = make_train_step_2d(model, tx, mesh, RCFG)
    sb = shard_batch_2d(mesh, batch)
    losses = []
    for i in range(4):
        state, metrics = step(state, sb, jax.random.key(42))
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4
