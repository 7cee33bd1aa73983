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

f = lambda pk: composite_packed(pk, jnp.asarray(bins.tile_start),
                                32, 32, 16, jbg)
(rgb, alpha), vjp_fn = jax.vjp(f, packed)
# concrete image-level cotangents equal to the loss's
npx = 1024
g_rgb_img = np.asarray(2.0*(np.minimum(np.asarray(rgb)[0], 1.0)
                            - np.asarray(jt))/(npx*3), np.float32)
g_rgb_img = np.where(np.asarray(rgb)[0] <= 1.0, g_rgb_img, 0.0)[None]
g_alpha_img = np.full((1, 32, 32), 0.1/npx, np.float32)
(d,) = vjp_fn((jnp.asarray(g_rgb_img), jnp.asarray(g_alpha_img)))
print("library vjp concrete-cotangent entry246 dx:", np.asarray(d)[0, 246])
# same but under jit
dj = np.asarray(jax.jit(lambda c1, c2: vjp_fn((c1, c2))[0])(
    jnp.asarray(g_rgb_img), jnp.asarray(g_alpha_img)))
print("same under jit:", dj[0, 246])
