"""Clip-gate knife-edge hypothesis check for the part-1 'gradient flip'.

The part-1 loss clips rgb at 1.0; its cotangent is gated by out <= 1.0.
Pixels whose composited value straddles 1.0 between the pallas and naive
forwards (both correct to ~2e-5) get their whole cotangent zeroed in one
path and not the other — term-sized gradient differences for every entry
contributing there, in xys/conics/opac (and smaller relative ones in
colors). Verify: (1) count straddling pixels; (2) recompute the naive-vs-
pallas gradient comparison with the clip removed (colors scaled so the
image never saturates). If the FAILs vanish, the two-round 'correctness
debt' was a discontinuity of the TEST's loss, not a kernel bug.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_part1_clipgate.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from diag_part1 import build_inputs  # noqa: E402

H = W = 32
TS, BUDGET = 16, 2 ** 13


def main():
    import jax
    import jax.numpy as jnp
    from splatformer_tpu.ops.binning import bin_gaussians
    from splatformer_tpu.ops.naive import composite_pixels_naive
    from splatformer_tpu.ops.pallas import raster

    proj, colors, opac, bg, target = build_inputs()
    jbg = jnp.asarray(bg)
    jtarget = jnp.asarray(target)

    def naive_fwd(xys, conics, colors_, opac_, clip):
        p = proj._replace(xys=xys, conics=conics)
        rgb, alpha = composite_pixels_naive(p, colors_, opac_, H, W, jbg)
        return (jnp.clip(rgb, max=1.0) if clip else rgb), alpha

    def pallas_fwd(xys, conics, colors_, opac_, clip):
        p = proj._replace(xys=xys, conics=conics)
        bins = bin_gaussians(p, H, W, TS, BUDGET, 16)
        pg = raster.pack_entries_t(xys, conics, colors_, opac_)
        entry_valid = bins.tile_ids < 4
        sortkey = jnp.where(entry_valid, bins.gauss_idx, pg.shape[1])
        packed = raster.gather_entries_segsum(pg, bins.gauss_idx, sortkey,
                                              bins.gauss_starts)
        rgb, alpha = raster.composite_packed(packed, bins.tile_start,
                                             H, W, TS, jbg)
        return (jnp.clip(rgb[0], max=1.0) if clip else rgb[0]), alpha[0]

    adict = {"xys": jnp.asarray(proj.xys), "conics": jnp.asarray(proj.conics),
             "colors": jnp.asarray(colors), "opac": jnp.asarray(opac)}

    # 1. straddling pixels
    rn = np.asarray(jax.jit(lambda a: naive_fwd(
        a["xys"], a["conics"], a["colors"], a["opac"], False)[0])(adict))
    rp = np.asarray(jax.jit(lambda a: pallas_fwd(
        a["xys"], a["conics"], a["colors"], a["opac"], False)[0])(adict))
    near = np.abs(rn - 1.0) < 1e-4
    straddle = (rn <= 1.0) != (rp <= 1.0)
    print(f"pixels with channel near 1.0 (<1e-4): {int(near.sum())}; "
          f"straddling the clip boundary: {int(straddle.sum())}")
    ys, xs, cs = np.nonzero(straddle)
    for y, x, c in list(zip(ys, xs, cs))[:10]:
        print(f"  straddle pix({x},{y}) ch{c}: naive={rn[y, x, c]:.7f} "
              f"pallas={rp[y, x, c]:.7f}")

    # 2. gradient comparison with and without the clip
    def make_loss(fwd, clip):
        def loss(a):
            rgb, alpha = fwd(a["xys"], a["conics"], a["colors"], a["opac"],
                             clip)
            return (jnp.mean(jnp.square(rgb - jtarget))
                    + 0.1 * jnp.mean(alpha))
        return loss

    for clip in (True, False):
        g_n = jax.tree.map(np.asarray, jax.jit(
            jax.grad(make_loss(naive_fwd, clip)))(adict))
        g_p = jax.tree.map(np.asarray, jax.jit(
            jax.grad(make_loss(pallas_fwd, clip)))(adict))
        print(f"--- clip={clip} ---", flush=True)
        for k in ("xys", "conics", "colors", "opac"):
            sc = np.abs(g_n[k]).max() + 1e-30
            err = np.abs(g_p[k] - g_n[k])
            print(f"  grad {k:7s} p99.9={np.quantile(err, 0.999)/sc:.2e} "
                  f"max={err.max()/sc:.2e}", flush=True)


if __name__ == "__main__":
    main()
