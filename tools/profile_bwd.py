"""Localize backward cost: grad subsets of the render."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
from splatformer_tpu.ops.render import render_images
from splatformer_tpu.ops.types import RasterizeConfig

def timeit(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)

def main():
    rng = np.random.default_rng(0)
    scene = random_scene(rng, 100_000, sh_degree=1)
    cams = orbit_cameras(4, 256, 256)
    bg = jnp.zeros(3)
    tgt = jnp.asarray(rng.uniform(size=(4, 256, 256, 3)), jnp.float32)
    rcfg = RasterizeConfig()

    def loss_of(keys):
        def f(p):
            rgb, _ = render_images(scene.replace(**p), cams, bg, rcfg)
            return jnp.mean(jnp.abs(rgb - tgt))
        return jax.jit(jax.grad(f))

    all_attrs = ("means", "scales", "quats", "opacities", "features_dc",
                 "features_rest")
    timeit("grad wrt all 6", loss_of(None),
           {k: getattr(scene, k) for k in all_attrs})
    timeit("grad wrt features_dc only", loss_of(None),
           {"features_dc": scene.features_dc})
    timeit("grad wrt opacities only", loss_of(None),
           {"opacities": scene.opacities})
    timeit("grad wrt means only", loss_of(None),
           {"means": scene.means})
    timeit("grad wrt means+scales+quats", loss_of(None),
           {k: getattr(scene, k) for k in ("means", "scales", "quats")})

if __name__ == "__main__":
    main()
