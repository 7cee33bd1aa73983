"""Train-step throughput on one chip: full refine step (PTv3-base forward,
4-view render, L1 loss, backward, adam update) on a synthetic 100k-Gaussian
scene — the BASELINE.json "train iters/s" number.

Prints one JSON line like bench.py (dev tool; bench.py stays the driver
headline).
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
    from splatformer_tpu.models.feature_predictor import FeaturePredictor
    from splatformer_tpu.ops.types import RasterizeConfig
    from splatformer_tpu.parallel.mesh import make_mesh, shard_batch
    from splatformer_tpu.training.optim import build_optimizer
    from splatformer_tpu.training.train_step import (SceneBatch, init_state,
                                                     make_train_step)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    views = 4
    rng = np.random.default_rng(0)
    # pad to the data pipeline's bucket granularity (multiple of 1024, which
    # also satisfies the backbone's patch-size divisibility)
    n_pad = ((n + 1023) // 1024) * 1024
    scene = random_scene(rng, n_pad, sh_degree=1, n_valid=n)
    model = FeaturePredictor(backbone_type="PT", sh_degree=1,
                             grid_resolution=384,
                             res_feature_activation={"means": "tanh"},
                             bn_axis_name="data",
                             compute_dtype="bfloat16")
    tx = build_optimizer(
        model.init(jax.random.key(0), scene, False)["params"],
        lr_dict={"base": 1e-4, "backbone": 3e-5}, total_steps=100)
    state = init_state(model, tx, scene, jax.random.key(0))

    cams = orbit_cameras(views, hw, hw)
    batch = SceneBatch(
        scene=scene, cameras=cams,
        images=jnp.asarray(rng.uniform(size=(views, hw, hw, 3)), jnp.float32),
        background=jnp.zeros(3))
    batch = jax.tree.map(lambda a: jnp.asarray(a)[None], batch)

    mesh = make_mesh(n_devices=1)
    batch = shard_batch(mesh, batch)
    rcfg = RasterizeConfig()
    step = make_train_step(model, tx, mesh, rcfg)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.key(1))
    jax.block_until_ready(metrics)
    print(f"compile+1st step: {time.perf_counter() - t0:.1f}s",
          {k: float(v) for k, v in metrics.items()}, file=sys.stderr)
    # a second compile fires on the first donated-device-array call (remote
    # compile through the axon tunnel); absorb it before timing
    for i in range(3):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.key(100 + i))
        l = float(metrics["total_loss"])
        print(f"warmup {i}: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.key(i))
    l = float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "train_step_iters_per_s_per_chip",
        "value": round(1.0 / dt, 3),
        "unit": "iters/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
