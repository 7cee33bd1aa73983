"""Single-process bisection matrix for the part-1 flip: every comparison
anchored in THIS process against the per-entry oracle.

  1. d_entry = grad wrt packed (no binning/gather in-program)  -> verified
     against the f64 per-entry walk oracle (diag_part1_terms.oracle, itself
     CPU-arbitrated against the independent oracle to 1e-6);
  2. R = numpy segment-sum of the ORACLE rows per gaussian (ground truth);
  3. A1 grad wrt pg, binning arrays CONCRETE;
  4. A2 grad wrt pg, binning IN-PROGRAM;
  5. A3 grad wrt adict (validate's exact structure);
each compared to R. The first configuration that deviates names the trigger.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_part1_onematrix.py
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

    bins = jax.jit(lambda p: bin_gaussians(p, H, W, TS, BUDGET, 16))(proj)
    gidx_np = np.asarray(bins.gauss_idx)
    tile_ids_np = np.asarray(bins.tile_ids)
    tstart_np = np.asarray(bins.tile_start).astype(np.int32)
    gstart_np = np.asarray(bins.gauss_starts)
    pg = raster.pack_entries_t(jnp.asarray(proj.xys),
                               jnp.asarray(proj.conics),
                               jnp.asarray(colors), jnp.asarray(opac))
    pg_np = np.asarray(pg)
    n_pad = pg_np.shape[1]
    packed_np = pg_np[:, gidx_np]
    sortkey_np = np.where(tile_ids_np < 4, gidx_np, n_pad).astype(np.int32)

    def tail(rgb, alpha):
        rgb = jnp.clip(rgb[0], max=1.0)
        return (jnp.mean(jnp.square(rgb - jtarget))
                + 0.1 * jnp.mean(alpha[0]))

    # ---- 1. packed-level gradient + in-process oracle anchor -------------
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
    for r in (0, 2, 5, 6):
        sc = max(np.abs(dO[r]).max(), 1e-30)
        print(f"anchor row {r}: d_entry vs oracle max rel "
              f"{np.abs(d_entry[r] - dO[r]).max()/sc:.3e}", flush=True)

    # ---- 2. ground truth per gaussian ------------------------------------
    n = np.asarray(proj.xys).shape[0]
    R = np.zeros((9, n_pad))
    for r in range(9):
        np.add.at(R[r], np.clip(sortkey_np, 0, n_pad - 1),
                  np.where(sortkey_np < n_pad, dO[r], 0.0))

    def report(tag, d_pg):
        errs = []
        for r in (0, 1, 2, 3, 4, 5, 6):
            sc = max(np.abs(R[r]).max(), 1e-30)
            errs.append(np.abs(d_pg[r] - R[r]).max() / sc)
        print(f"{tag}: max rel vs truth per row "
              + " ".join(f"{e:.2e}" for e in errs), flush=True)

    # ---- 3. A1: grad wrt pg, binning concrete ----------------------------
    gidx_j = jnp.asarray(gidx_np)
    sk_j = jnp.asarray(sortkey_np)
    gs_j = jnp.asarray(gstart_np)

    def loss_pg_concrete(pgauss):
        packed = raster.gather_entries_segsum(pgauss, gidx_j, sk_j, gs_j)
        rgb, alpha = raster.composite_packed(packed, ts_j, H, W, TS, jbg)
        return tail(rgb, alpha)

    report("A1 pg/concrete-binning",
           np.asarray(jax.jit(jax.grad(loss_pg_concrete))(pg)))

    # ---- 4. A2: grad wrt pg, binning in-program --------------------------
    def loss_pg_binned(pgauss):
        b = bin_gaussians(proj, H, W, TS, BUDGET, 16)
        sortkey = jnp.where(b.tile_ids < 4, b.gauss_idx, n_pad)
        packed = raster.gather_entries_segsum(pgauss, b.gauss_idx, sortkey,
                                              b.gauss_starts)
        rgb, alpha = raster.composite_packed(packed, b.tile_start,
                                             H, W, TS, jbg)
        return tail(rgb, alpha)

    report("A2 pg/in-program-binning",
           np.asarray(jax.jit(jax.grad(loss_pg_binned))(pg)))

    # ---- 5. A3: grad wrt adict (validate structure) ----------------------
    def loss_adict(a):
        p2 = proj._replace(xys=a["xys"], conics=a["conics"])
        b = bin_gaussians(p2, H, W, TS, BUDGET, 16)
        pgauss = raster.pack_entries_t(a["xys"], a["conics"], a["colors"],
                                       a["opac"])
        sortkey = jnp.where(b.tile_ids < 4, b.gauss_idx, n_pad)
        packed = raster.gather_entries_segsum(pgauss, b.gauss_idx, sortkey,
                                              b.gauss_starts)
        rgb, alpha = raster.composite_packed(packed, b.tile_start,
                                             H, W, TS, jbg)
        return tail(rgb, alpha)

    adict = {"xys": jnp.asarray(proj.xys), "conics": jnp.asarray(proj.conics),
             "colors": jnp.asarray(colors), "opac": jnp.asarray(opac)}
    gE = jax.tree.map(np.asarray, jax.jit(jax.grad(loss_adict))(adict))
    d3 = np.zeros((9, n_pad))
    d3[0, :n], d3[1, :n] = gE["xys"][:, 0], gE["xys"][:, 1]
    d3[2, :n], d3[3, :n], d3[4, :n] = (gE["conics"][:, 0],
                                       gE["conics"][:, 1],
                                       gE["conics"][:, 2])
    d3[5, :n] = gE["opac"]
    d3[6, :n] = gE["colors"][:, 0]
    report("A3 adict/validate-struct", d3)


if __name__ == "__main__":
    main()
