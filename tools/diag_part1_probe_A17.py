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
(rgb0, alpha0), _ = jax.vjp(f, packed)
rgb0c = jnp.asarray(np.asarray(rgb0))
c1_np = np.asarray(2.0*(np.minimum(np.asarray(rgb0)[0], 1.0)
                        - np.asarray(jt))/(npx*3), np.float32)[None]
c2_np = np.full((1, 32, 32), 0.1/npx, np.float32)

def g(pk, c1_in, c2_in, rgb_ref):
    (rgb, alpha), vjp_fn = jax.vjp(f, pk)
    r0 = rgb[0]
    c1 = (2.0*(jnp.clip(r0, max=1.0) - jt)/(npx*3))[None]
    d = vjp_fn((c1, c2_in))[0]
    return (d, jnp.max(jnp.abs(c1 - c1_in)),
            jnp.max(jnp.abs(rgb - rgb_ref)))

d, dc1, drgb = jax.jit(g)(packed, jnp.asarray(c1_np), jnp.asarray(c2_np),
                          rgb0c)
print("dx:", float(np.asarray(d)[0, 246]),
      " max|c1_prog - c1_in|:", float(dc1),
      " max|rgb_prog - rgb_standalone|:", float(drgb))
