"""Order-poisoning test: run the adict-level gradient FIRST (the
configuration that fails), then the pg-level and packed-level gradients,
all anchored against the f64 per-entry oracle in-process. If the
packed-level gradient — proven correct when compiled first
(diag_part1_onematrix.py) — is ALSO wrong after the adict program ran,
the wrongness lives in a shared cached artifact (the backward kernel
binary reused across programs), not in any one program's structure.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_part1_order.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from diag_part1 import build_inputs  # noqa: E402
import diag_part1_terms as terms  # noqa: E402

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

    def tail(rgb, alpha):
        rgb = jnp.clip(rgb[0], max=1.0)
        return (jnp.mean(jnp.square(rgb - jtarget))
                + 0.1 * jnp.mean(alpha[0]))

    # ---------- 1. adict-level grad FIRST (failing config) ----------------
    def loss_adict(a):
        p2 = proj._replace(xys=a["xys"], conics=a["conics"])
        b = bin_gaussians(p2, H, W, TS, BUDGET, 16)
        pgauss = raster.pack_entries_t(a["xys"], a["conics"], a["colors"],
                                       a["opac"])
        sortkey = jnp.where(b.tile_ids < 4, b.gauss_idx, pgauss.shape[1])
        packed = raster.gather_entries_segsum(pgauss, b.gauss_idx, sortkey,
                                              b.gauss_starts)
        rgb, alpha = raster.composite_packed(packed, b.tile_start,
                                             H, W, TS, jbg)
        return tail(rgb, alpha)

    adict = {"xys": jnp.asarray(proj.xys), "conics": jnp.asarray(proj.conics),
             "colors": jnp.asarray(colors), "opac": jnp.asarray(opac)}
    gE = jax.tree.map(np.asarray, jax.jit(jax.grad(loss_adict))(adict))
    print("adict grad computed first", flush=True)

    # ---------- 2. now the binning + oracle anchor ------------------------
    bins = jax.jit(lambda p: bin_gaussians(p, H, W, TS, BUDGET, 16))(proj)
    gidx_np = np.asarray(bins.gauss_idx)
    tile_ids_np = np.asarray(bins.tile_ids)
    tstart_np = np.asarray(bins.tile_start).astype(np.int32)
    pg = raster.pack_entries_t(adict["xys"], adict["conics"],
                               adict["colors"], adict["opac"])
    pg_np = np.asarray(pg)
    n_pad = pg_np.shape[1]
    packed_np = pg_np[:, gidx_np]
    sortkey_np = np.where(tile_ids_np < 4, gidx_np, n_pad).astype(np.int32)
    ts_j = jnp.asarray(tstart_np)

    def loss_packed(p):
        rgb, alpha = raster.composite_packed(p, ts_j, H, W, TS, jbg)
        return tail(rgb, alpha)

    d_entry = np.asarray(jax.jit(jax.grad(loss_packed))(
        jnp.asarray(packed_np)))

    composite, (tiles_x, tiles_y, num_tiles, p) = raster._cached_calls(
        H, W, TS, float(terms.ATHR), float(terms.AMAX), float(terms.EPS),
        BUDGET, jax.default_backend() == "cpu", 1)
    out_c = np.asarray(jax.jit(composite)(jnp.asarray(packed_np), ts_j))

    def postprocess(out):
        v = 1
        rgb = (out[:, :, 0:3]
               .reshape(v, tiles_y, tiles_x, TS, TS, 3)
               .transpose(0, 1, 3, 2, 4, 5)
               .reshape(v, tiles_y * TS, tiles_x * TS, 3))
        t_img = (out[:, :, 3].reshape(v, tiles_y, tiles_x, TS, TS)
                 .transpose(0, 1, 3, 2, 4)
                 .reshape(v, tiles_y * TS, tiles_x * TS))
        rgb2 = (rgb[:, :H, :W]
                + t_img[:, :H, :W, None] * jbg[None, None, None])
        alpha = 1.0 - t_img[:, :H, :W]
        return tail(rgb2, alpha)

    g_tile = np.asarray(jax.jit(jax.grad(postprocess))(jnp.asarray(out_c)))
    dO, _ = terms.oracle(packed_np.astype(np.float64), tstart_np,
                         g_tile.astype(np.float64))
    for r in (0, 5):
        sc = max(np.abs(dO[r]).max(), 1e-30)
        print(f"packed-level (after adict) row {r}: max rel vs oracle "
              f"{np.abs(d_entry[r] - dO[r]).max()/sc:.3e}", flush=True)

    # truth per gaussian
    n = np.asarray(proj.xys).shape[0]
    R = np.zeros((9, n_pad))
    for r in range(9):
        np.add.at(R[r], np.clip(sortkey_np, 0, n_pad - 1),
                  np.where(sortkey_np < n_pad, dO[r], 0.0))

    d3 = np.zeros((9, n_pad))
    d3[0, :n], d3[1, :n] = gE["xys"][:, 0], gE["xys"][:, 1]
    d3[2, :n] = gE["conics"][:, 0]
    d3[5, :n] = gE["opac"]
    d3[6, :n] = gE["colors"][:, 0]
    for r in (0, 1, 2, 5, 6):
        sc = max(np.abs(R[r]).max(), 1e-30)
        print(f"adict-grad row {r}: max rel vs truth "
              f"{np.abs(d3[r] - R[r]).max()/sc:.3e}", flush=True)


if __name__ == "__main__":
    main()
