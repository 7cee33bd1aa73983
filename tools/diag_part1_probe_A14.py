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

def g2(pk):
    (rgb, alpha), vjp_fn = jax.vjp(f, pk)
    r0 = rgb[0]
    c1 = 2.0 * (jnp.clip(r0, max=1.0) - jt) / (npx * 3)
    c1 = jnp.where(r0 <= 1.0, c1, 0.0)[None]
    c2 = jnp.full((1, 32, 32), 0.1 / npx, jnp.float32)
    return vjp_fn((c1, c2))[0]

print("in-program cotangents (jit):",
      np.asarray(jax.jit(g2)(packed))[0, 246])

def loss(pk):
    rgb, alpha = f(pk)
    return jnp.mean(jnp.square(jnp.clip(rgb[0], max=1.0) - jt)) \
        + 0.1 * jnp.mean(alpha[0])
print("jax.grad(loss) same process:",
      np.asarray(jax.jit(jax.grad(loss))(packed))[0, 246])
