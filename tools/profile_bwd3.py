"""Isolate the gather-transpose scatter cost in the full render backward."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
from splatformer_tpu.ops import render as render_mod
from splatformer_tpu.ops.pallas import raster as raster_mod
from splatformer_tpu.ops.types import RasterizeConfig

def timeit(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)

def main():
    rng = np.random.default_rng(0)
    hw = 256
    scene = random_scene(rng, 100_000, sh_degree=1)
    cams = orbit_cameras(4, hw, hw)
    bg = jnp.zeros(3)
    tgt = jnp.asarray(rng.uniform(size=(4, hw, hw, 3)), jnp.float32)
    rcfg = RasterizeConfig()

    def full(scene):
        def loss(fdc):
            rgb, _ = render_mod.render_images(
                scene.replace(features_dc=fdc), cams, bg, rcfg)
            return jnp.mean(jnp.abs(rgb - tgt))
        return jax.grad(loss)(scene.features_dc)

    orig_gather = raster_mod.gather_packed_entries

    # variant 1: gather with ZERO backward (isolates the scatter cost)
    @jax.custom_vjp
    def gather_nograd(pg, gidx):
        return pg[:, gidx]
    gather_nograd.defvjp(
        lambda pg, gidx: (pg[:, gidx], (pg.shape, gidx)),
        lambda res, g: (jnp.zeros(res[0], jnp.float32), None))

    # variant 2: backward via sort+cumsum segment sum (no scatter)
    @jax.custom_vjp
    def gather_segsum(pg, gidx):
        return pg[:, gidx]
    def _fwd(pg, gidx):
        return pg[:, gidx], (pg.shape, gidx)
    def _bwd(res, g):
        (w, n), gidx = res
        b = gidx.shape[0]
        order0 = jnp.arange(b, dtype=jnp.int32)
        gs, order = jax.lax.sort_key_val(gidx, order0)
        gsort = g[:, order]
        c = jnp.cumsum(gsort, axis=1)
        c = jnp.concatenate([jnp.zeros((w, 1), jnp.float32), c], axis=1)
        ends = jnp.searchsorted(gs, jnp.arange(n + 1, dtype=jnp.int32)
                                ).astype(jnp.int32)
        d = c[:, ends[1:]] - c[:, ends[:-1]]
        return d, None
    gather_segsum.defvjp(_fwd, _bwd)

    timeit("full (baseline)", jax.jit(full), scene)

    raster_mod.gather_packed_entries = gather_nograd
    render_mod.gather_packed_entries = gather_nograd
    try:
        timeit("full, gather bwd = zero", jax.jit(full), scene)
    finally:
        raster_mod.gather_packed_entries = orig_gather

    raster_mod.gather_packed_entries = gather_segsum
    render_mod.gather_packed_entries = gather_segsum
    try:
        timeit("full, gather bwd = sort+cumsum", jax.jit(full), scene)
    finally:
        raster_mod.gather_packed_entries = orig_gather
        render_mod.gather_packed_entries = orig_gather

if __name__ == "__main__":
    main()
