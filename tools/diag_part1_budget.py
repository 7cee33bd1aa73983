"""Staleness test: the exact validate part-1 pallas-vs-naive gradient check
run at TWO budgets in one process. budget=8192 is the byte-identical
historical program (failing bit-identically since r3 across three different
backward kernels); budget=16384 changes every shape, forcing fresh
compilation of everything. If 8192 fails while 16384 passes on the same
library code — code that tools/diag_part1_onematrix.py just proved correct
against an f64 oracle in-process — the failure is stale state in the remote
compile stack, not the library.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_part1_budget.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from diag_part1 import build_inputs  # noqa: E402

H = W = 32
TS = 16


def main():
    import jax
    import jax.numpy as jnp
    from splatformer_tpu.ops.binning import bin_gaussians
    from splatformer_tpu.ops.naive import composite_pixels_naive
    from splatformer_tpu.ops.pallas import raster

    proj, colors, opac, bg, target = build_inputs()
    jbg = jnp.asarray(bg)
    jtarget = jnp.asarray(target)

    def naive_fwd(xys, conics, colors_, opac_):
        p = proj._replace(xys=xys, conics=conics)
        rgb, alpha = composite_pixels_naive(p, colors_, opac_, H, W, jbg)
        return jnp.clip(rgb, max=1.0), alpha

    def make_pallas_fwd(budget):
        def pallas_fwd(xys, conics, colors_, opac_):
            p = proj._replace(xys=xys, conics=conics)
            bins = bin_gaussians(p, H, W, TS, budget, 16)
            pg = raster.pack_entries_t(xys, conics, colors_, opac_)
            entry_valid = bins.tile_ids < 4
            sortkey = jnp.where(entry_valid, bins.gauss_idx, pg.shape[1])
            packed = raster.gather_entries_segsum(pg, bins.gauss_idx,
                                                  sortkey, bins.gauss_starts)
            rgb, alpha = raster.composite_packed(packed, bins.tile_start,
                                                 H, W, TS, jbg)
            return jnp.clip(rgb[0], max=1.0), alpha[0]
        return pallas_fwd

    def make_loss(fwd):
        def loss(a):
            rgb, alpha = fwd(a["xys"], a["conics"], a["colors"], a["opac"])
            return (jnp.mean(jnp.square(rgb - jtarget))
                    + 0.1 * jnp.mean(alpha))
        return loss

    adict = {"xys": jnp.asarray(proj.xys), "conics": jnp.asarray(proj.conics),
             "colors": jnp.asarray(colors), "opac": jnp.asarray(opac)}
    g_n = jax.tree.map(np.asarray,
                       jax.jit(jax.grad(make_loss(naive_fwd)))(adict))

    for budget in (2 ** 13, 2 ** 14):
        g_p = jax.tree.map(np.asarray, jax.jit(
            jax.grad(make_loss(make_pallas_fwd(budget))))(adict))
        print(f"--- budget {budget} ---", flush=True)
        for k in ("xys", "conics", "colors", "opac"):
            sc = np.abs(g_n[k]).max() + 1e-30
            err = np.abs(g_p[k] - g_n[k])
            print(f"  grad {k:7s} p99.9={np.quantile(err, 0.999)/sc:.2e} "
                  f"max={err.max()/sc:.2e}", flush=True)


if __name__ == "__main__":
    main()
