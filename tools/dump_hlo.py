"""Dump compiled HLO of the bench fwd+bwd to /tmp/fwd_bwd_hlo.txt."""
import sys

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

    def fwd_bwd(params):
        def loss(p):
            rgb, _ = render_images(scene.replace(**p), cameras, background,
                                   rcfg)
            return jnp.mean(jnp.abs(rgb - target))
        return jax.value_and_grad(loss)(params)

    lowered = jax.jit(fwd_bwd).lower(params)
    compiled = lowered.compile()
    txt = compiled.as_text()
    open("/tmp/fwd_bwd_hlo.txt", "w").write(txt)
    print("wrote /tmp/fwd_bwd_hlo.txt", len(txt))


if __name__ == "__main__":
    main()
