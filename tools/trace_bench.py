"""Capture a jax.profiler trace of the bench fwd+bwd and print the top ops.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_bench.py
Parses the xplane proto with xprof's converter to an op-profile table.
"""
import glob
import gzip
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/splat_trace"


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
        return jax.value_and_grad(loss)(params)

    l, g = fwd_bwd(params)
    jax.block_until_ready(g)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        l, g = fwd_bwd(params)
    jax.block_until_ready(g)
    jax.profiler.stop_trace()

    # parse: find the xplane file and run xprof's op_profile converter
    xplanes = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True))
    print("xplane files:", xplanes, flush=True)
    from xprof.convert import raw_to_tool_data as rtd
    params_ = {"graph_viewer_options": {}}
    for tool in ("framework_op_stats", "hlo_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, params_)
            out = f"/tmp/splat_trace_{tool}.out"
            if isinstance(data, bytes):
                open(out, "wb").write(data)
            else:
                open(out, "w").write(str(data))
            print("wrote", out, flush=True)
        except Exception as e:
            print(tool, "failed:", repr(e), flush=True)


if __name__ == "__main__":
    main()
