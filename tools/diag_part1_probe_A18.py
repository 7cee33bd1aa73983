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
packed = np.asarray(gather_entries_segsum(
    pg, bins.gauss_idx, sortkey, bins.gauss_starts))

@jax.jit
def loss(pk):
    rgb, alpha = composite_packed(pk, jnp.asarray(bins.tile_start),
                                  32, 32, 16, jbg)
    return jnp.mean(jnp.square(jnp.clip(rgb[0], max=1.0) - jt)) \
        + 0.1 * jnp.mean(alpha[0])

g = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(packed)))
print("autodiff dx[246]:", g[0, 246])
for h in (2e-3, 1e-2, 4e-2):
    pp = packed.copy(); pp[0, 246] += h
    pm = packed.copy(); pm[0, 246] -= h
    fd = (float(loss(jnp.asarray(pp))) - float(loss(jnp.asarray(pm)))) / (2*h)
    print(f"finite-diff h={h}: {fd:.6e}")
