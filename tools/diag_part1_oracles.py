"""Arbitrate the two f64 oracles (CPU-only, no chip needed).

diag_part1.numpy_f64_grads (independent per-pixel walk over ALL gaussians)
disagrees term-sized with the kernel on ~0.1% of entries, while
diag_part1_terms.oracle (a walk over the BINNED entry lists, mirroring the
kernel's gating) agrees with the kernel. Both are f64 — so the difference
is SEMANTIC, not rounding. Segsum the per-entry oracle to per-gaussian
rows, diff against the independent oracle, and dump the worst gaussian's
per-pixel terms from both to expose the semantic difference.

Run: python tools/diag_part1_oracles.py      (forces CPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from diag_part1 import build_inputs, numpy_f64_grads  # noqa: E402
import diag_part1_terms as terms  # noqa: E402

TS, BUDGET = 16, 2 ** 13
H = W = 32


def main():
    import jax.numpy as jnp
    from splatformer_tpu.ops.binning import bin_gaussians
    from splatformer_tpu.ops.pallas import raster

    proj, colors, opac, bg, target = build_inputs()
    jbg = jnp.asarray(bg)
    jtarget = jnp.asarray(target)

    bins = jax.jit(lambda p: bin_gaussians(p, H, W, TS, BUDGET, 16))(proj)
    gidx = np.asarray(bins.gauss_idx)
    tile_ids = np.asarray(bins.tile_ids)
    tile_start = np.asarray(bins.tile_start).astype(np.int32)
    pg = raster.pack_entries_t(jnp.asarray(proj.xys),
                               jnp.asarray(proj.conics),
                               jnp.asarray(colors), jnp.asarray(opac))
    packed = np.asarray(pg)[:, gidx]
    n_pad = np.asarray(pg).shape[1]

    # tile-level cotangent from the f32 postprocess (CPU jit, same math)
    composite, (tiles_x, tiles_y, num_tiles, p) = raster._cached_calls(
        H, W, TS, float(terms.ATHR), float(terms.AMAX), float(terms.EPS),
        BUDGET, True, 1)
    out_c = np.asarray(jax.jit(composite)(
        jnp.asarray(packed), jnp.asarray(tile_start)))

    def postprocess(out):
        v = 1
        rgb = (out[:, :, 0:3]
               .reshape(v, tiles_y, tiles_x, TS, TS, 3)
               .transpose(0, 1, 3, 2, 4, 5)
               .reshape(v, tiles_y * TS, tiles_x * TS, 3))
        t_img = (out[:, :, 3].reshape(v, tiles_y, tiles_x, TS, TS)
                 .transpose(0, 1, 3, 2, 4)
                 .reshape(v, tiles_y * TS, tiles_x * TS))
        rgb = rgb[:, :H, :W] + t_img[:, :H, :W, None] * jbg[None, None, None]
        alpha = 1.0 - t_img[:, :H, :W]
        rgb = jnp.clip(rgb[0], max=1.0)
        return (jnp.mean(jnp.square(rgb - jtarget))
                + 0.1 * jnp.mean(alpha[0]))

    g_tile = np.asarray(jax.jit(jax.grad(postprocess))(jnp.asarray(out_c)))

    dO, ledger = terms.oracle(packed.astype(np.float64), tile_start,
                              g_tile.astype(np.float64))

    # segsum per-entry oracle rows -> per-gaussian
    valid = tile_ids < num_tiles
    dG = np.zeros((9, n_pad))
    for r in range(9):
        np.add.at(dG[r], np.clip(gidx, 0, n_pad - 1),
                  np.where(valid, dO[r], 0.0))

    print("computing independent f64 oracle (minutes)...", flush=True)
    g64 = numpy_f64_grads(proj, colors, opac, bg, target)

    n = g64["xys"].shape[0]
    pairs = [("xys.x", dG[0][:n], g64["xys"][:, 0]),
             ("xys.y", dG[1][:n], g64["xys"][:, 1]),
             ("con.0", dG[2][:n], g64["conics"][:, 0]),
             ("opac", dG[5][:n], g64["opac"]),
             ("col.r", dG[6][:n], g64["colors"][:, 0])]
    for name, mine, ind in pairs:
        sc = np.abs(ind).max() + 1e-30
        e = np.abs(mine - ind)
        print(f"{name}: max rel {e.max()/sc:.3e} at g{np.argmax(e)}")

    # dump the worst xys.x gaussian from both oracles
    gi = int(np.argmax(np.abs(dG[0][:n] - g64["xys"][:, 0])))
    print(f"\n=== gaussian g{gi}: mine={dG[0][gi]:.6e} "
          f"independent={g64['xys'][gi, 0]:.6e} ===")
    # entries of gi in the binned lists
    ent_ids = np.nonzero((gidx == gi) & valid)[0]
    print(f"binned entries: {ent_ids.tolist()} "
          f"(tiles {tile_ids[ent_ids].tolist()})")
    for e in ent_ids:
        if e in ledger:
            print(f"  entry {e} per-pixel terms (binned-walk oracle):")
            for (px, a, T_in, tdx) in ledger[e]:
                print(f"    p{px}: a={a:.8f} T_in={T_in:.6f} "
                      f"term={tdx:+.4e}")
    # independent oracle per-pixel terms for gi
    dump_independent_terms(proj, colors, opac, bg, target, gi)


def dump_independent_terms(proj, colors, opac, bg, target, gi_want,
                           athr=1.0 / 255.0, amax=0.999, eps=1e-4):
    """Per-pixel dsig-term ledger for one gaussian, mirroring
    numpy_f64_grads' walk."""
    n = proj.xys.shape[0]
    order = np.lexsort((np.arange(n),
                        np.asarray(proj.depths).astype(np.float64)))
    alive = np.asarray(proj.radii) > 0
    xys = np.asarray(proj.xys).astype(np.float64)
    con = np.asarray(proj.conics).astype(np.float64)
    col = np.asarray(colors).astype(np.float64)
    op = np.asarray(opac).astype(np.float64)
    npix = H * W
    print("  independent-oracle per-pixel terms:")
    for py in range(H):
        for px in range(W):
            T = 1.0
            rgb = np.zeros(3)
            walked = []
            for gidx_ in order:
                if not alive[gidx_]:
                    continue
                dx = xys[gidx_, 0] - px
                dy = xys[gidx_, 1] - py
                sig = 0.5 * (con[gidx_, 0] * dx * dx
                             + con[gidx_, 2] * dy * dy) \
                    + con[gidx_, 1] * dx * dy
                sig = max(sig, 0.0)
                a = min(amax, op[gidx_] * np.exp(-sig))
                if a < athr:
                    continue
                nT = T * (1.0 - a)
                if nT <= eps:
                    break
                rgb += col[gidx_] * (a * T)
                walked.append((gidx_, a, T, dx, dy))
                T = nT
            if not any(w[0] == gi_want for w in walked):
                continue
            out = rgb + T * bg
            clipped = np.minimum(out, 1.0)
            g_out = 2.0 * (clipped - target[py, px]) / (npix * 3)
            g_out = np.where(out <= 1.0, g_out, 0.0)
            gT = -(0.1 / npix) + float(g_out @ bg)
            S = np.zeros(3)
            for (gidx_, a, Tk, dx, dy) in reversed(walked):
                da = float(g_out @ col[gidx_]) * Tk \
                    - (float(np.sum(S)) + gT * T) / (1.0 - a)
                dsig = -a * da if a < amax else 0.0
                if gidx_ == gi_want:
                    term = dsig * (con[gidx_, 0] * dx + con[gidx_, 1] * dy)
                    tid = (py // TS) * ((W + TS - 1) // TS) + (px // TS)
                    print(f"    pix({px},{py}) tile{tid}: a={a:.8f} "
                          f"T_in={Tk:.6f} term={term:+.4e}")
                S = S + g_out * (col[gidx_] * (a * Tk))


if __name__ == "__main__":
    main()
