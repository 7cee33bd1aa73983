"""Part-1 gradient flip diagnosis (VALIDATE r3/r4): compare the naive
oracle, the Pallas formulation, and an f64 ground truth on the SAME part-1
inputs, per entry, and characterize the worst deviations.

The f64 reference runs the naive per-pixel formulation on CPU in float64 —
bitwise-deterministic and rounding-free at f32 scales, so it arbitrates
which f32 implementation deviates (both non-Pallas f32 paths agreeing on
the chip does not make them RIGHT).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_part1.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_inputs():
    import jax
    import jax.numpy as jnp
    from splatformer_tpu.data.synthetic import orbit_cameras, random_scene, \
        single_camera
    from splatformer_tpu.ops.camera import opengl_c2w_to_opencv_w2c
    from splatformer_tpu.ops.render import activate_gaussians, compute_colors
    from splatformer_tpu.ops.projection import project_gaussians

    rng = np.random.default_rng(3)
    scene = random_scene(rng, 2048, sh_degree=1, n_valid=2000)
    scene = scene.replace(opacities=scene.opacities - 4.0)
    cam = single_camera(orbit_cameras(1, 32, 32), 0)
    bg = np.array([0.3, 0.1, 0.2], np.float32)
    target = np.asarray(rng.uniform(size=(32, 32, 3)), np.float32)

    @jax.jit
    def make_proj(s):
        act = activate_gaussians(s)
        mask = s.valid_mask()
        opac = jnp.where(mask, act["opacities"], 0.0)
        viewmat = opengl_c2w_to_opencv_w2c(cam.c2w)
        colors = compute_colors(s, cam.c2w[:3, 3])
        proj = project_gaussians(
            act["means"], act["scales"], act["quats"], viewmat,
            cam.fx, cam.fy, cam.cx, cam.cy, cam.height, cam.width,
            tile_size=16, clip_thresh=0.01, mask=mask)
        return proj, colors, opac

    import jax.numpy as jnp2
    proj, colors, opac = jax.tree.map(
        lambda x: jnp2.asarray(np.asarray(x)), make_proj(scene))
    return proj, colors, opac, bg, target


def numpy_f64_grads(proj, colors, opac, bg, target,
                    athr=1.0 / 255.0, amax=0.999, eps=1e-4):
    """Naive compositing + analytic backward in float64 numpy.

    Mirrors ops/naive.py semantics: per-pixel depth-ordered walk over ALL
    gaussians (sorted by depth, ties by index), sigma = direct quadratic
    clamped at 0, alpha = min(amax, op * exp(-sigma)) gated at athr,
    early termination when T <= eps BEFORE compositing the crossing entry.
    Loss: mean((clip(rgb + T*bg, max=1) - target)^2) + 0.1 * mean(alpha).
    """
    proj = proj._replace(**{f: np.asarray(getattr(proj, f))
                            for f in proj._fields})
    n = proj.xys.shape[0]
    order = np.lexsort((np.arange(n), proj.depths.astype(np.float64)))
    alive = proj.radii > 0
    xys = proj.xys.astype(np.float64)
    con = proj.conics.astype(np.float64)
    col = np.asarray(colors).astype(np.float64)
    op = np.asarray(opac).astype(np.float64)
    H = W = 32
    g_xys = np.zeros_like(xys)
    g_con = np.zeros_like(con)
    g_col = np.zeros_like(col)
    g_op = np.zeros_like(op)
    rgb_img = np.zeros((H, W, 3))
    # per-(entry, pixel) contribution ledger for the worst-entry dump
    npix = H * W
    for py in range(H):
        for px in range(W):
            # forward walk
            T = 1.0
            rgb = np.zeros(3)
            walked = []
            for gi in order:
                if not alive[gi]:
                    continue
                dx = xys[gi, 0] - px
                dy = xys[gi, 1] - py
                sig = 0.5 * (con[gi, 0] * dx * dx + con[gi, 2] * dy * dy) \
                    + con[gi, 1] * dx * dy
                sig = max(sig, 0.0)
                a = min(amax, op[gi] * np.exp(-sig))
                if a < athr:
                    continue
                nT = T * (1.0 - a)
                if nT <= eps:
                    break
                rgb += col[gi] * (a * T)
                walked.append((gi, a, T, sig, dx, dy))
                T = nT
            out = rgb + T * bg
            clipped = np.minimum(out, 1.0)
            g_out = 2.0 * (clipped - target[py, px]) / (npix * 3)
            g_out = np.where(out <= 1.0, g_out, 0.0)
            g_alpha = 0.1 / npix
            gT = -g_alpha + float(g_out @ bg)
            rgb_img[py, px] = out
            # backward (reverse walk, suffix accumulators)
            S = np.zeros(3)   # suffix of g-weighted contributions
            for gi, a, Tk, sig, dx, dy in reversed(walked):
                da = float(g_out @ col[gi]) * Tk \
                    - float(S @ np.ones(1)) if False else 0.0
                suffix = S  # sum over later entries of g_out . (c_j a_j T_j)
                da = float(g_out @ col[gi]) * Tk \
                    - (float(np.sum(suffix)) + gT * (T / (1.0 - a)) * (1.0 - a)) / (1.0 - a)
                # NOTE: T here is the FINAL transmittance after the walk
                g_col[gi] += g_out * (a * Tk)
                # accumulate suffix scalar: contributions of this entry
                S = S + g_out * (col[gi] * (a * Tk))
                # d a / d sigma = -a (for the unclamped branch)
                dsig = -a * da if a < amax else 0.0
                if sig <= 0.0:
                    dsig = dsig  # clamp active only via rounding; keep full
                g_xys[gi, 0] += dsig * (con[gi, 0] * dx + con[gi, 1] * dy)
                g_xys[gi, 1] += dsig * (con[gi, 2] * dy + con[gi, 1] * dx)
                g_con[gi, 0] += dsig * 0.5 * dx * dx
                g_con[gi, 1] += dsig * dx * dy
                g_con[gi, 2] += dsig * 0.5 * dy * dy
                g_op[gi] += (a / op[gi]) * da if op[gi] > 0 else 0.0
    return dict(xys=g_xys, conics=g_con, colors=g_col, opac=g_op,
                rgb=rgb_img)


def main():
    import jax
    import jax.numpy as jnp

    proj, colors, opac, bg, target = build_inputs()
    jbg = jnp.asarray(bg)
    jtarget = jnp.asarray(target)

    from splatformer_tpu.ops.binning import bin_gaussians
    from splatformer_tpu.ops.naive import composite_pixels_naive
    from splatformer_tpu.ops.pallas.raster import (composite_packed,
                                                   gather_entries_segsum,
                                                   pack_entries_t)
    ts, budget = 16, 2 ** 13

    def naive_fwd(xys, conics, colors, opac):
        p = proj._replace(xys=xys, conics=conics)
        rgb, alpha = composite_pixels_naive(p, colors, opac, 32, 32, jbg)
        return jnp.clip(rgb, max=1.0), alpha

    def pallas_fwd(xys, conics, colors, opac):
        p = proj._replace(xys=xys, conics=conics)
        bins = bin_gaussians(p, 32, 32, ts, budget, 16)
        pg = pack_entries_t(xys, conics, colors, opac)
        entry_valid = bins.tile_ids < 4
        sortkey = jnp.where(entry_valid, bins.gauss_idx, pg.shape[1])
        packed = gather_entries_segsum(pg, bins.gauss_idx, sortkey,
                                       bins.gauss_starts)
        rgb, alpha = composite_packed(packed, bins.tile_start, 32, 32, ts,
                                      jbg)
        return jnp.clip(rgb[0], max=1.0), alpha[0]

    def make_loss(fwd):
        def loss(a):
            rgb, alpha = fwd(a["xys"], a["conics"], a["colors"], a["opac"])
            return (jnp.mean(jnp.square(rgb - jtarget))
                    + 0.1 * jnp.mean(alpha))
        return loss

    adict = {"xys": jnp.asarray(proj.xys), "conics": jnp.asarray(proj.conics),
             "colors": jnp.asarray(colors), "opac": jnp.asarray(opac)}
    g_n = jax.tree.map(np.asarray, jax.jit(jax.grad(make_loss(naive_fwd)))(adict))
    g_p = jax.tree.map(np.asarray, jax.jit(jax.grad(make_loss(pallas_fwd)))(adict))

    print("computing f64 numpy ground truth (may take ~minutes)...",
          flush=True)
    g_64 = numpy_f64_grads(proj, colors, opac, bg, target)

    for k in ("xys", "conics", "opac", "colors"):
        ref = g_64[k].reshape(g_64[k].shape[0], -1)
        en = np.abs(g_n[k].reshape(ref.shape) - ref).max(axis=1)
        ep = np.abs(g_p[k].reshape(ref.shape) - ref).max(axis=1)
        scale = np.abs(ref).max() + 1e-30
        print(f"{k}: naive-vs-f64 p99.9={np.quantile(en, 0.999)/scale:.2e} "
              f"max={en.max()/scale:.2e} | pallas-vs-f64 "
              f"p99.9={np.quantile(ep, 0.999)/scale:.2e} "
              f"max={ep.max()/scale:.2e}")

    # worst entries for xys under the pallas path
    ref = g_64["xys"]
    ep = np.abs(g_p["xys"] - ref).max(axis=1)
    en = np.abs(g_n["xys"] - ref).max(axis=1)
    worst = np.argsort(-ep)[:10]
    print("\nworst-10 pallas xys entries (gi, pallas_err, naive_err, "
          "|ref|, depth_rank, radius, xy):")
    n = proj.xys.shape[0]
    order = np.lexsort((np.arange(n), proj.depths.astype(np.float64)))
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    for gi in worst:
        print(f"  g{gi}: ep={ep[gi]:.3e} en={en[gi]:.3e} "
              f"ref={np.abs(ref[gi]).max():.3e} rank={rank[gi]} "
              f"r={int(proj.radii[gi])} xy=({float(proj.xys[gi,0]):.2f},"
              f"{float(proj.xys[gi,1]):.2f})")


if __name__ == "__main__":
    main()
