import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from tools.diag_part1 import build_inputs
from splatformer_tpu.ops.binning import bin_gaussians
from splatformer_tpu.ops.pallas.raster import (pack_entries_t,
    gather_entries_segsum, composite_packed)

proj, colors, opac, bg, target = build_inputs()
jbg, jt = jnp.asarray(bg), jnp.asarray(target)
bins = jax.jit(lambda p: bin_gaussians(p, 32, 32, 16, 2**13, 16))(proj)
pg = pack_entries_t(jnp.asarray(proj.xys), jnp.asarray(proj.conics),
                    jnp.asarray(colors), jnp.asarray(opac))
sortkey = jnp.where(bins.tile_ids < 4, bins.gauss_idx, pg.shape[1])
packed = jnp.asarray(np.asarray(gather_entries_segsum(
    pg, bins.gauss_idx, sortkey, bins.gauss_starts)))
npx = 1024
f = lambda pk: composite_packed(pk, jnp.asarray(bins.tile_start),
                                32, 32, 16, jbg)
(rgb, alpha), _ = jax.vjp(f, packed)
c1_np = np.asarray(2.0*(np.minimum(np.asarray(rgb)[0], 1.0)
                        - np.asarray(jt))/(npx*3), np.float32)
c1_np = np.where(np.asarray(rgb)[0] <= 1.0, c1_np, 0.0)[None]
c2_np = np.full((1, 32, 32), 0.1/npx, np.float32)

def mk(c1_mode, c2_mode):
    def g(pk, c1_in, c2_in):
        (rgb, alpha), vjp_fn = jax.vjp(f, pk)
        r0 = rgb[0]
        if c1_mode == "prog":
            c1 = 2.0*(jnp.clip(r0, max=1.0) - jt)/(npx*3)
            c1 = jnp.where(r0 <= 1.0, c1, 0.0)[None]
        else:
            c1 = c1_in
        if c2_mode == "prog":
            c2 = jnp.full((1, 32, 32), 0.1/npx, jnp.float32) \
                + 0.0 * alpha  # depend on alpha like mean() grad does
        else:
            c2 = c2_in
        return vjp_fn((c1, c2))[0]
    return jax.jit(g)

for m1, m2 in (("in", "in"), ("prog", "in"), ("in", "prog"),
               ("prog", "prog")):
    d = np.asarray(mk(m1, m2)(packed, jnp.asarray(c1_np),
                              jnp.asarray(c2_np)))
    print(f"c1={m1:4s} c2={m2:4s} -> entry246 dx = {d[0,246]:.6e}")
