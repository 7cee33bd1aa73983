"""Benchmark: differentiable-rasterizer fwd+bwd throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
driver. The headline number is Mrays/s through render forward + backward to
all six Gaussian attributes (BASELINE.json north-star metric). The reference
publishes no wall-clock throughput (BASELINE.md), so vs_baseline is reported
against the fixed target of 1.0 (ratio vs itself = informational).
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
    from splatformer_tpu.ops.render import render_images
    from splatformer_tpu.ops.types import RasterizeConfig

    n_gauss = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    views = 4

    rng = np.random.default_rng(0)
    scene = random_scene(rng, n_gauss, sh_degree=1)
    cameras = orbit_cameras(views, hw, hw)
    background = jnp.zeros(3)
    target = jnp.asarray(rng.uniform(size=(views, hw, hw, 3)), jnp.float32)
    rcfg = RasterizeConfig()

    attrs = ("means", "scales", "quats", "opacities", "features_dc",
             "features_rest")
    params = {k: getattr(scene, k) for k in attrs}

    @jax.jit
    def fwd_bwd(params):
        def loss(p):
            rgb, _ = render_images(scene.replace(**p), cameras, background,
                                   rcfg)
            return jnp.mean(jnp.abs(rgb - target))
        l, g = jax.value_and_grad(loss)(params)
        return l, g

    # warmup/compile
    l, g = fwd_bwd(params)
    jax.block_until_ready(g)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        l, g = fwd_bwd(params)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters

    rays = views * hw * hw
    mrays_per_s = rays / dt / 1e6
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_mrays_per_s_per_chip",
        "value": round(mrays_per_s, 3),
        "unit": "Mrays/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
