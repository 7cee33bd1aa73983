"""Per-ENTRY term-level arbitration of the part-1 gradient flip (round 5).

Three per-entry (PACK_W, budget) gradient computations on identical concrete
(packed, tile_start):

  F  failing-style: one jit, cotangent computed IN-PROGRAM from the
     forward's rgb (grad wrt the packed arg of loss(composite_packed(...)));
  P  passing-style: forward jit -> fetch tile out -> tile-level cotangent
     g_tile in a second jit -> backward-only vjp with CONCRETE g_tile;
  O  float64 numpy oracle: vectorized per-tile walk with the kernel's exact
     gating (athr/amax/eps), using P's fetched g_tile.

Then for the worst F-vs-O entries, dump the per-pixel term structure:
knife-edge margins |a - athr| and |T - eps| of every contributing pixel.
If F's deviation equals one pixel's term with a tiny margin, the bug is a
knife-edge mask divergence; if margins are large, it is real corruption.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_part1_terms.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from diag_part1 import build_inputs  # noqa: E402  (same directory)

ATHR, AMAX, EPS = 1.0 / 255.0, 0.999, 1e-4
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
    pg = raster.pack_entries_t(jnp.asarray(proj.xys),
                               jnp.asarray(proj.conics),
                               jnp.asarray(colors), jnp.asarray(opac))
    packed = np.asarray(pg[:, np.asarray(bins.gauss_idx)])
    tile_start = np.asarray(bins.tile_start).astype(np.int32)
    packed_j = jnp.asarray(packed)
    ts_j = jnp.asarray(tile_start)

    # ---- F: failing-style (cotangent in-program) --------------------------
    def loss_from_packed(p):
        rgb, alpha = raster.composite_packed(p, ts_j, H, W, TS, jbg)
        rgb = jnp.clip(rgb[0], max=1.0)
        return (jnp.mean(jnp.square(rgb - jtarget))
                + 0.1 * jnp.mean(alpha[0]))

    dF = np.asarray(jax.jit(jax.grad(loss_from_packed))(packed_j))

    # ---- P: passing-style (concrete tile-level cotangent) -----------------
    composite, (tiles_x, tiles_y, num_tiles, p) = raster._cached_calls(
        H, W, TS, float(ATHR), float(AMAX), float(EPS), BUDGET,
        jax.default_backend() == "cpu", 1)

    def postprocess(out):
        # replicate composite_packed's tail exactly (raster.py:591-603)
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

    out_c = np.asarray(jax.jit(composite)(packed_j, ts_j))
    g_tile = np.asarray(jax.jit(jax.grad(postprocess))(jnp.asarray(out_c)))

    def bwd_only(p, g):
        _, vjp = jax.vjp(lambda pp: composite(pp, ts_j), p)
        return vjp(g)[0]

    dP = np.asarray(jax.jit(bwd_only)(packed_j, jnp.asarray(g_tile)))

    # ---- O: f64 oracle on the same packed walk ---------------------------
    dO, ledger = oracle(packed.astype(np.float64), tile_start,
                        g_tile.astype(np.float64))

    scale = {r: max(np.abs(dO[r]).max(), 1e-30) for r in range(9)}
    names = ["x", "y", "c0", "c1", "c2", "op", "r", "g", "b"]
    print("per-row max rel deviation vs f64 oracle (F=in-prog ct, "
          "P=concrete ct):")
    for r in range(9):
        eF = np.abs(dF[r] - dO[r]).max() / scale[r]
        eP = np.abs(dP[r] - dO[r]).max() / scale[r]
        eFP = np.abs(dF[r] - dP[r]).max() / scale[r]
        print(f"  row {names[r]:3s} F-vs-O={eF:.3e}  P-vs-O={eP:.3e}  "
              f"F-vs-P={eFP:.3e}")

    # worst entries under F for the xys row
    err = np.abs(dF[0] - dO[0]) / scale[0]
    worst = np.argsort(-err)[:6]
    print("\nworst F entries (row x): entry, F, P, O, F-P, knife-edge dump")
    for e in worst:
        print(f"  entry {e}: F={dF[0, e]:.6e} P={dP[0, e]:.6e} "
              f"O={dO[0, e]:.6e}")
        if e in ledger:
            for (px, a, T_before, term_dx) in ledger[e][:8]:
                print(f"    pixel {px}: a={a:.8f} (a-athr={a - ATHR:+.2e}) "
                      f"T_in={T_before:.6f} term_dx={term_dx:.3e}")


def oracle(packed, tile_start, g_tile):
    """Vectorized f64 per-tile walk; returns (9, budget) rows + a ledger of
    per-pixel terms for high-|term| entries."""
    num_tiles = tile_start.shape[0] - 1
    tiles_x = (W + TS - 1) // TS
    d = np.zeros((9, packed.shape[1]))
    ledger = {}
    pxs = np.arange(TS * TS) % TS
    pys = np.arange(TS * TS) // TS
    for t in range(num_tiles):
        s, e = int(tile_start[t]), int(tile_start[t + 1])
        if e <= s:
            continue
        ox = (t % tiles_x) * TS
        oy = (t // tiles_x) * TS
        px = (ox + pxs)[:, None]            # (P, 1)
        py = (oy + pys)[:, None]
        ent = packed[:, s:e]                # (16, C)
        x, y = ent[0][None, :], ent[1][None, :]
        c0, c1, c2 = ent[2][None, :], ent[3][None, :], ent[4][None, :]
        op = ent[5][None, :]
        col = ent[6:9]                      # (3, C)
        dx = x - px
        dy = y - py
        sig = np.maximum(0.5 * (c0 * dx * dx + c2 * dy * dy) + c1 * dx * dy,
                         0.0)
        a = np.minimum(AMAX, op * np.exp(-sig))
        okm = a >= ATHR
        a = np.where(okm, a, 0.0)
        om = 1.0 - a
        incl = np.cumprod(om, axis=1)       # (P, C)
        excl = np.concatenate([np.ones((TS * TS, 1)), incl[:, :-1]], axis=1)
        contrib = okm & (excl > EPS) & (incl > EPS)
        # gsplat breaks BEFORE compositing the crossing entry; entries after
        # the first incl <= eps never composite
        crossed = np.cumsum((incl <= EPS).astype(np.int64), axis=1) > 0
        contrib &= ~(np.concatenate(
            [np.zeros((TS * TS, 1), bool), crossed[:, :-1]], axis=1))
        vis = np.where(contrib, a * excl, 0.0)
        g_rgb = g_tile[t, :, 0:3]           # (P, 3)
        gT = g_tile[t, :, 3]
        acc_rgb = (vis[:, :, None] * col.T[None, :, :]).sum(axis=1)
        T_final = np.where(crossed.any(axis=1),
                           excl[np.arange(TS * TS),
                                np.argmax(crossed, axis=1)],
                           incl[:, -1])
        gc = g_rgb @ col                    # (P, C)
        terms = np.where(contrib, gc * vis, 0.0)
        s_total = (g_rgb * acc_rgb).sum(axis=1, keepdims=True)
        s_after = s_total - np.cumsum(terms, axis=1)
        gt_term = (gT * T_final)[:, None]
        da = excl * gc - (s_after + gt_term) / om
        active = contrib & (op * np.exp(-sig) < AMAX)
        dsig = np.where(active, -a * da, 0.0)
        d[0, s:e] = (dsig * (c0 * dx + c1 * dy)).sum(axis=0)
        d[1, s:e] = (dsig * (c2 * dy + c1 * dx)).sum(axis=0)
        d[2, s:e] = (dsig * 0.5 * dx * dx).sum(axis=0)
        d[3, s:e] = (dsig * dx * dy).sum(axis=0)
        d[4, s:e] = (dsig * 0.5 * dy * dy).sum(axis=0)
        # kernel row: -s1/op with s1 = sum_p dsig (raster.py:460)
        d[5, s:e] = np.where(op[0] > 0,
                             -dsig.sum(axis=0) / np.maximum(op[0], 1e-30),
                             0.0)
        d[6:9, s:e] = (g_rgb.T[:, :, None] * vis[None, :, :]).sum(axis=1)
        # ledger: per-pixel terms for every entry in this tile
        term_dx = dsig * (c0 * dx + c1 * dy)
        for ci in range(e - s):
            nz = np.nonzero(okm[:, ci])[0]
            if nz.size:
                ledger[s + ci] = [
                    (int(p_), float(op[0, ci] * np.exp(-sig[p_, ci])),
                     float(excl[p_, ci]), float(term_dx[p_, ci]))
                    for p_ in nz[np.argsort(-np.abs(term_dx[nz, ci]))][:8]]
    return d, ledger


if __name__ == "__main__":
    main()
