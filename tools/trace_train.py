"""Capture a jax.profiler trace of the full train step and print top HLO ops.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_train.py
"""
import glob
import sys

import numpy as np
import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/splat_trace_train"


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
    n_pad = ((n + 1023) // 1024) * 1024
    scene = random_scene(rng, n_pad, sh_degree=1, n_valid=n)
    model = FeaturePredictor(backbone_type="PT", sh_degree=1,
                             grid_resolution=384,
                             res_feature_activation={"means": "tanh"},
                             bn_axis_name="data")
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
    step = make_train_step(model, tx, mesh, RasterizeConfig())

    state, metrics = step(state, batch, jax.random.key(1))
    jax.block_until_ready(metrics)
    # absorb the second compile that fires on the first donated-device-array
    # call (see bench_train.py)
    for i in range(2):
        state, metrics = step(state, batch, jax.random.key(50 + i))
        _ = float(metrics["total_loss"])
    print("warm steps done", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for i in range(2):
        state, metrics = step(state, batch, jax.random.key(2 + i))
    jax.block_until_ready(metrics)
    jax.profiler.stop_trace()

    xplanes = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True))
    print("xplane files:", xplanes, flush=True)
    from xprof.convert import raw_to_tool_data as rtd
    params_ = {"graph_viewer_options": {}}
    for tool in ("framework_op_stats", "hlo_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, params_)
            out = f"/tmp/splat_trace_train_{tool}.out"
            if isinstance(data, bytes):
                open(out, "wb").write(data)
            else:
                open(out, "w").write(str(data))
            print("wrote", out, flush=True)
        except Exception as e:
            print(tool, "failed:", repr(e), flush=True)


if __name__ == "__main__":
    main()
