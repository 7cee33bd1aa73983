"""Localize the part-1 flip inside gather_entries_segsum's backward.

tools/diag_part1_terms.py proved the Pallas kernel's per-entry gradients
are correct on the chip even with an in-program cotangent. The remaining
suspect is the sort-based segment-sum backward (_gather_segsum_bwd) when
its cotangent is produced IN-PROGRAM (fused with the pallas custom call's
output) rather than fed concrete.

  A  full failing path, one jit: grad wrt per-gaussian packed attrs through
     gather_entries_segsum + composite_packed + loss (cotangent in-program);
  B  two-step: fetch the concrete per-entry d_packed (proven correct), then
     run the segsum backward alone in its own jit on the concrete array;
  O  numpy oracle: per-gaussian sum of d_packed columns grouped by sortkey.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_part1_segsum.py
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

    bins = jax.jit(lambda p: bin_gaussians(p, H, W, TS, BUDGET, 16))(proj)
    gidx = jnp.asarray(bins.gauss_idx)
    entry_valid = np.asarray(bins.tile_ids) < 4
    pg = raster.pack_entries_t(jnp.asarray(proj.xys),
                               jnp.asarray(proj.conics),
                               jnp.asarray(colors), jnp.asarray(opac))
    n_pad = pg.shape[1]
    sortkey = jnp.asarray(np.where(entry_valid, np.asarray(bins.gauss_idx),
                                   n_pad).astype(np.int32))
    gauss_starts = jnp.asarray(bins.gauss_starts)
    ts_j = jnp.asarray(np.asarray(bins.tile_start).astype(np.int32))

    # ---- A: full failing path, in-program cotangent ----------------------
    def loss_from_pg(pgauss):
        packed = raster.gather_entries_segsum(pgauss, gidx, sortkey,
                                              gauss_starts)
        rgb, alpha = raster.composite_packed(packed, ts_j, H, W, TS, jbg)
        rgb = jnp.clip(rgb[0], max=1.0)
        return (jnp.mean(jnp.square(rgb - jtarget))
                + 0.1 * jnp.mean(alpha[0]))

    dA = np.asarray(jax.jit(jax.grad(loss_from_pg))(pg))

    # ---- B: concrete per-entry cotangent through the segsum bwd alone ----
    def loss_from_packed(p):
        rgb, alpha = raster.composite_packed(p, ts_j, H, W, TS, jbg)
        rgb = jnp.clip(rgb[0], max=1.0)
        return (jnp.mean(jnp.square(rgb - jtarget))
                + 0.1 * jnp.mean(alpha[0]))

    packed = pg[:, np.asarray(bins.gauss_idx)]
    d_entry = np.asarray(jax.jit(jax.grad(loss_from_packed))(packed))

    def segsum_bwd_only(ct):
        _, vjp = jax.vjp(
            lambda g: raster.gather_entries_segsum(g, gidx, sortkey,
                                                   gauss_starts), pg)
        return vjp(ct)[0]

    dB = np.asarray(jax.jit(segsum_bwd_only)(jnp.asarray(d_entry)))

    # ---- O: numpy oracle segment sum on the same concrete d_entry --------
    sk = np.asarray(sortkey)
    dO = np.zeros_like(dA)
    for r in range(9):
        np.add.at(dO[r], np.clip(sk, 0, n_pad - 1),
                  np.where(sk < n_pad, d_entry[r], 0.0))

    names = ["x", "y", "c0", "c1", "c2", "op", "r", "g", "b"]
    print("per-row max rel deviation vs numpy segsum oracle:")
    for r in range(9):
        sc = max(np.abs(dO[r]).max(), 1e-30)
        eA = np.abs(dA[r] - dO[r]).max() / sc
        eB = np.abs(dB[r] - dO[r]).max() / sc
        print(f"  row {names[r]:3s} A(in-prog)={eA:.3e}  B(concrete)={eB:.3e}")

    # worst-entry detail for row x under A
    r = 0
    sc = max(np.abs(dO[r]).max(), 1e-30)
    err = np.abs(dA[r] - dO[r]) / sc
    worst = np.argsort(-err)[:8]
    print("\nworst A gaussians (row x): gi, A, B, O, n_entries")
    gs = np.asarray(gauss_starts)
    for gi in worst:
        cnt = gs[gi + 1] - gs[gi] if gi + 1 < len(gs) else -1
        print(f"  g{gi}: A={dA[r, gi]:+.6e} B={dB[r, gi]:+.6e} "
              f"O={dO[r, gi]:+.6e} entries={cnt}")


if __name__ == "__main__":
    main()
