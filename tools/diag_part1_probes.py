"""Follow-up probes for the part-1 Pallas gradient deviation (round 4).

Round-4 localization so far (tools/diag_part1.py + scratch experiments):
  * an independent f64 oracle agrees with the NAIVE path to 1e-6 — the
    Pallas path is objectively wrong on ~0.1% of entries (p99.9 ~ 0.5 rel);
  * the same kernel + same data is CORRECT on the CPU backend (interpret),
    and the same algebra as plain eager jnp is CORRECT on the TPU backend;
  * only {TPU backend} x {inside one jit program} (compiled Mosaic AND
    interpret, identical to 2e-10) deviates.

Probe A jit-wraps the plain-jnp emulation of the backward on the TPU: if
the jitted emulation flips to the kernel's wrong value, this is an XLA-TPU
compilation effect on the graph (not Pallas); bisect from there.
Probe B splits the cotangent (g_rgb-only vs gT-only) through the real
kernel to localize which linear path carries the deviation.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_part1_probes.py
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


ENTRY = 246          # worst deviating entry (gaussian 1967, tile 0)
EXPECT_OK = 5.9097e-05   # f64 / CPU-kernel / TPU-eager value of row 0
EXPECT_BAD = 1.5208e-04  # TPU-kernel value of row 0


def main():
    import jax
    import jax.numpy as jnp
    from tools.diag_part1 import build_inputs
    from splatformer_tpu.ops.binning import bin_gaussians
    from splatformer_tpu.ops.pallas.raster import (
        _chunk_quantities, _dot, _pixel_bases, _tri_inclusive,
        composite_packed, gather_entries_segsum, pack_entries_t)

    proj, colors, opac, bg, target = build_inputs()
    jbg, jtarget = jnp.asarray(bg), jnp.asarray(target)
    bins = jax.jit(lambda p: bin_gaussians(p, 32, 32, 16, 2 ** 13, 16))(proj)
    pg = pack_entries_t(jnp.asarray(proj.xys), jnp.asarray(proj.conics),
                        jnp.asarray(colors), jnp.asarray(opac))
    entry_valid = bins.tile_ids < 4
    sortkey = jnp.where(entry_valid, bins.gauss_idx, pg.shape[1])
    packed = jnp.asarray(np.asarray(gather_entries_segsum(
        pg, bins.gauss_idx, sortkey, bins.gauss_starts)))
    tstart = np.asarray(bins.tile_start)

    athr, amax, eps = 1.0 / 255.0, 0.999, 1e-4
    ts, tiles_x, chunk, p = 16, 2, 128, 256
    t = 0
    start, end = int(tstart[t]), int(tstart[t + 1])
    base0 = (start // chunk) * chunk
    nch = (end - 1) // chunk + 1 - start // chunk
    A, AT, ox, oy = _pixel_bases(ts, tiles_x, jnp.int32(t))
    tri = _tri_inclusive(chunk)

    def tile0_row0(packed_t, g_rgb, gT, acc_rgb, acc_T):
        """Plain-jnp emulation of the backward for tile 0; returns the
        row-0 (d xys.x) gradient of ENTRY."""
        s_total = jnp.sum(g_rgb * acc_rgb, axis=1, keepdims=True)
        gt_term = gT * acc_T
        t_in = jnp.ones((p, 1))
        done = jnp.zeros((p, 1), bool)
        s_rem = s_total
        out_val = jnp.zeros(())
        for k in range(nch):
            lo = base0 + k * chunk
            e = jax.lax.dynamic_slice(packed_t, (0, lo), (16, chunk))
            lane = jnp.arange(lo, lo + chunk)[None, :]
            lv = (lane >= start) & (lane < end)
            q = _chunk_quantities(e, A, ox, oy, t_in, done, athr, amax, eps,
                                  tri, lv)
            gc = _dot(g_rgb, e[6:9, :])
            terms = jnp.where(q["contrib"], gc * q["vis"], 0.0)
            pre_incl = _dot(terms, tri)
            s_after = s_rem - pre_incl
            da = q["excl"] * gc - (s_after + gt_term) / q["om"]
            active = q["contrib"] & (q["raw"] < amax)
            dsig = jnp.where(active, -q["raw"] * da, 0.0)
            M = _dot(AT, dsig)
            s1, sx = M[0:1], M[1:2]
            sdx = q["x"] * s1 - sx
            sdy = q["y"] * M[0:1] - M[2:3]
            r0 = q["c0"] * sdx + q["c1"] * sdy
            if (ENTRY - base0) // chunk == k:
                out_val = r0[0, (ENTRY - base0) % chunk]
            s_rem = s_rem - pre_incl[:, -1:]
            t_in, done = q["t_out"], q["done_out"]
        return out_val

    # forward state for tile 0 (eager, known-correct)
    t_in = jnp.ones((p, 1))
    done = jnp.zeros((p, 1), bool)
    rgb = jnp.zeros((p, 3))
    for k in range(nch):
        lo = base0 + k * chunk
        e = packed[:, lo:lo + chunk]
        lane = jnp.arange(lo, lo + chunk)[None, :]
        lv = (lane >= start) & (lane < end)
        q = _chunk_quantities(e, A, ox, oy, t_in, done, athr, amax, eps,
                              tri, lv)
        rgb = rgb + _dot(q["vis"], jnp.transpose(e[6:9, :]))
        t_in, done = q["t_out"], q["done_out"]
    acc_rgb, acc_T = rgb, t_in

    npix = 1024
    tg = np.asarray(target)[0:16, 0:16, :].reshape(p, 3)
    out_full = np.asarray(acc_rgb) + np.asarray(acc_T) * np.asarray(bg)[None]
    g_rgb = 2.0 * (np.minimum(out_full, 1.0) - tg) / (npix * 3)
    g_rgb = np.where(out_full <= 1.0, g_rgb, 0.0).astype(np.float32)
    gT = (-0.1 / npix + g_rgb @ np.asarray(bg)).astype(np.float32)[:, None]
    g_rgb = jnp.asarray(g_rgb)
    gTj = jnp.asarray(gT)

    eager = float(tile0_row0(packed, g_rgb, gTj, acc_rgb, acc_T))
    jitted = float(jax.jit(tile0_row0)(packed, g_rgb, gTj, acc_rgb, acc_T))
    print(f"probe A: eager={eager:.6e} jit={jitted:.6e} "
          f"(ok~{EXPECT_OK:.4e}, bad~{EXPECT_BAD:.4e})")

    # probe B: cotangent split through the REAL kernel
    def grad_with(grgb_on, gt_on):
        def loss(pk):
            rgb, alpha = composite_packed(pk, jnp.asarray(tstart), 32, 32,
                                          16, jbg)
            rgb = jnp.clip(rgb[0], max=1.0)
            alpha = alpha[0]
            L = 0.0
            if grgb_on:
                L = L + jnp.mean(jnp.square(rgb - jtarget))
            if gt_on:
                L = L + 0.1 * jnp.mean(alpha)
            return L
        return float(np.asarray(
            jax.jit(jax.grad(loss))(packed))[0, ENTRY])

    both = grad_with(True, True)
    rgb_only = grad_with(True, False)
    gt_only = grad_with(False, True)
    print(f"probe B (kernel row0 of entry {ENTRY}): both={both:.6e} "
          f"rgb_only={rgb_only:.6e} gT_only={gt_only:.6e} "
          f"sum={rgb_only + gt_only:.6e}")


if __name__ == "__main__":
    main()
