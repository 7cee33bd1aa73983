"""Test whether pack_entries_t's VJP is the part-1 corruption site.

On the chip, every probe differentiating wrt the PACKED/pg level matched
the oracles; diag_part1's failing g_p differentiates wrt the raw attribute
arrays (xys/conics/colors/opac) THROUGH pack_entries_t. Compute, in ONE
chip process on identical inputs:

  E  grad wrt adict (validate/diag_part1's exact structure);
  G  grad wrt pg (proven-correct level), unpacked to d_xys etc. by NUMPY
     row slicing (pack's VJP applied outside the program);
  f64 independent oracle on the same fetched inputs.

If E deviates where G matches, pack_entries_t's VJP (or its fusion) is the
bug. Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_part1_packvjp.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from diag_part1 import build_inputs, numpy_f64_grads  # noqa: E402

TS, BUDGET = 16, 2 ** 13
H = W = 32


def main():
    import jax
    import jax.numpy as jnp
    from splatformer_tpu.ops.binning import bin_gaussians
    from splatformer_tpu.ops.pallas import raster

    proj, colors, opac, bg, target = build_inputs()
    jbg = jnp.asarray(bg)
    jtarget = jnp.asarray(target)

    def loss_from_adict(a):
        p = proj._replace(xys=a["xys"], conics=a["conics"])
        bins = bin_gaussians(p, H, W, TS, BUDGET, 16)
        pg = raster.pack_entries_t(a["xys"], a["conics"], a["colors"],
                                   a["opac"])
        entry_valid = bins.tile_ids < 4
        sortkey = jnp.where(entry_valid, bins.gauss_idx, pg.shape[1])
        packed = raster.gather_entries_segsum(pg, bins.gauss_idx, sortkey,
                                              bins.gauss_starts)
        rgb, alpha = raster.composite_packed(packed, bins.tile_start,
                                             H, W, TS, jbg)
        rgb = jnp.clip(rgb[0], max=1.0)
        return (jnp.mean(jnp.square(rgb - jtarget))
                + 0.1 * jnp.mean(alpha[0]))

    adict = {"xys": jnp.asarray(proj.xys), "conics": jnp.asarray(proj.conics),
             "colors": jnp.asarray(colors), "opac": jnp.asarray(opac)}
    gE = jax.tree.map(np.asarray,
                      jax.jit(jax.grad(loss_from_adict))(adict))

    # G: same loss but pg as the differentiated argument
    def loss_from_pg(pgauss):
        bins = bin_gaussians(proj, H, W, TS, BUDGET, 16)
        entry_valid = bins.tile_ids < 4
        sortkey = jnp.where(entry_valid, bins.gauss_idx, pgauss.shape[1])
        packed = raster.gather_entries_segsum(pgauss, bins.gauss_idx,
                                              sortkey, bins.gauss_starts)
        rgb, alpha = raster.composite_packed(packed, bins.tile_start,
                                             H, W, TS, jbg)
        rgb = jnp.clip(rgb[0], max=1.0)
        return (jnp.mean(jnp.square(rgb - jtarget))
                + 0.1 * jnp.mean(alpha[0]))

    pg = raster.pack_entries_t(adict["xys"], adict["conics"],
                               adict["colors"], adict["opac"])
    d_pg = np.asarray(jax.jit(jax.grad(loss_from_pg))(pg))
    n = np.asarray(proj.xys).shape[0]
    gG = {"xys": np.stack([d_pg[0, :n], d_pg[1, :n]], axis=1),
          "conics": np.stack([d_pg[2, :n], d_pg[3, :n], d_pg[4, :n]], axis=1),
          "opac": d_pg[5, :n],
          "colors": np.stack([d_pg[6, :n], d_pg[7, :n], d_pg[8, :n]], axis=1)}

    print("computing f64 oracle on the fetched inputs (minutes)...",
          flush=True)
    g64 = numpy_f64_grads(proj, colors, opac, bg, target)

    for k in ("xys", "conics", "opac", "colors"):
        ref = g64[k].reshape(n, -1)
        sc = np.abs(ref).max() + 1e-30
        eE = np.abs(gE[k].reshape(n, -1) - ref).max() / sc
        eG = np.abs(gG[k].reshape(n, -1) - ref).max() / sc
        eEG = np.abs(gE[k].reshape(n, -1) - gG[k].reshape(n, -1)).max() / sc
        print(f"{k:7s}: E(adict)-vs-f64 {eE:.3e}   G(pg)-vs-f64 {eG:.3e}"
              f"   E-vs-G {eEG:.3e}")


if __name__ == "__main__":
    main()
