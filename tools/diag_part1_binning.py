"""Final localization: the ONLY structural difference left between the
(correct) probes and the (failing) validate part-1 program is binning
computed IN-PROGRAM from the differentiated xys. Compare:

  C  validate's exact structure: grad wrt {xys, conics, colors, opac} with
     bin_gaussians inside the jitted loss;
  D  same grad but with the binning arrays precomputed and closed over as
     concrete constants;
and fetch C's in-program binning arrays via a second (instrumented) jit to
check they match the standalone binning.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_part1_binning.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from diag_part1 import build_inputs  # noqa: E402

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

    def make_loss(bins_fn):
        def loss(a):
            p = proj._replace(xys=a["xys"], conics=a["conics"])
            bins = bins_fn(p)
            pg = raster.pack_entries_t(a["xys"], a["conics"], a["colors"],
                                       a["opac"])
            entry_valid = bins.tile_ids < 4
            sortkey = jnp.where(entry_valid, bins.gauss_idx, pg.shape[1])
            packed = raster.gather_entries_segsum(pg, bins.gauss_idx,
                                                  sortkey, bins.gauss_starts)
            rgb, alpha = raster.composite_packed(packed, bins.tile_start,
                                                 H, W, TS, jbg)
            rgb = jnp.clip(rgb[0], max=1.0)
            return (jnp.mean(jnp.square(rgb - jtarget))
                    + 0.1 * jnp.mean(alpha[0]))
        return loss

    adict = {"xys": jnp.asarray(proj.xys), "conics": jnp.asarray(proj.conics),
             "colors": jnp.asarray(colors), "opac": jnp.asarray(opac)}

    # C: binning in-program (validate's structure)
    gC = jax.jit(jax.grad(make_loss(
        lambda p: bin_gaussians(p, H, W, TS, BUDGET, 16))))(adict)
    gC = jax.tree.map(np.asarray, gC)

    # D: binning concrete
    bins_c = jax.jit(lambda p: bin_gaussians(p, H, W, TS, BUDGET, 16))(proj)
    bins_c = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), bins_c)
    gD = jax.jit(jax.grad(make_loss(lambda p: bins_c)))(adict)
    gD = jax.tree.map(np.asarray, gD)

    for k in ("xys", "conics", "colors", "opac"):
        sc = np.abs(gD[k]).max() + 1e-30
        e = np.abs(gC[k] - gD[k]).max() / sc
        print(f"grad {k:7s} C(in-prog-binning) vs D(concrete): "
              f"max rel {e:.3e}")

    # fetch C's in-program binning arrays and compare to standalone
    @jax.jit
    def binned(a):
        p = proj._replace(xys=a["xys"], conics=a["conics"])
        b = bin_gaussians(p, H, W, TS, BUDGET, 16)
        return b.gauss_idx, b.tile_ids, b.tile_start, b.gauss_starts

    gi, ti, tstart, gstart = map(np.asarray, binned(adict))
    for name, got, want in (
            ("gauss_idx", gi, np.asarray(bins_c.gauss_idx)),
            ("tile_ids", ti, np.asarray(bins_c.tile_ids)),
            ("tile_start", tstart, np.asarray(bins_c.tile_start)),
            ("gauss_starts", gstart, np.asarray(bins_c.gauss_starts))):
        print(f"binning {name}: identical={np.array_equal(got, want)}")


if __name__ == "__main__":
    main()
