"""Input witness for the part-1 deviation: both f64 oracles are right for
their own inputs, so a chip-derived input (packed / tile_start / g_tile)
must differ semantically from its CPU recomputation. Fetch both versions
of every input and diff them; then print the worst gaussian's oracle value
under each input set.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_part1_witness.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from diag_part1 import build_inputs  # noqa: E402
import diag_part1_terms as terms  # noqa: E402

H = W = 32
TS, BUDGET = 16, 2 ** 13
GI = 1967


def derive(proj, colors, opac, bg, target):
    """packed / tile_start / g_tile on the CURRENT backend."""
    import jax
    import jax.numpy as jnp
    from splatformer_tpu.ops.binning import bin_gaussians
    from splatformer_tpu.ops.pallas import raster

    jbg = jnp.asarray(bg)
    jtarget = jnp.asarray(target)
    bins = jax.jit(lambda p: bin_gaussians(p, H, W, TS, BUDGET, 16))(proj)
    gidx = np.asarray(bins.gauss_idx)
    tids = np.asarray(bins.tile_ids)
    tstart = np.asarray(bins.tile_start).astype(np.int32)
    pg = raster.pack_entries_t(jnp.asarray(proj.xys),
                               jnp.asarray(proj.conics),
                               jnp.asarray(colors), jnp.asarray(opac))
    packed = np.asarray(pg)[:, gidx]

    composite, (tiles_x, tiles_y, num_tiles, p) = raster._cached_calls(
        H, W, TS, float(terms.ATHR), float(terms.AMAX), float(terms.EPS),
        BUDGET, jax.default_backend() == "cpu", 1)
    out_c = np.asarray(jax.jit(composite)(jnp.asarray(packed),
                                          jnp.asarray(tstart)))

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
        rgb2 = jnp.clip(rgb2[0], max=1.0)
        return (jnp.mean(jnp.square(rgb2 - jtarget))
                + 0.1 * jnp.mean(alpha[0]))

    import jax as _jax
    g_tile = np.asarray(_jax.jit(_jax.grad(postprocess))(
        jnp.asarray(out_c)))
    return dict(gidx=gidx, tids=tids, tstart=tstart, packed=packed,
                out=out_c, g_tile=g_tile)


def main():
    import jax

    proj, colors, opac, bg, target = build_inputs()
    backend = jax.default_backend()
    print(f"backend: {backend}")
    chip = derive(proj, colors, opac, bg, target)
    np.savez(f"/root/repo/output/witness_{backend}.npz", **chip)

    other_path = f"/root/repo/output/witness_{'cpu' if backend != 'cpu' else 'axon'}.npz"
    if not os.path.exists(other_path):
        print(f"run once on the other backend to produce {other_path}")
        # still print this backend's oracle value for GI
        dO, _ = terms.oracle(chip["packed"].astype(np.float64),
                             chip["tstart"],
                             chip["g_tile"].astype(np.float64))
        s = np.where(chip["tids"] < 4, dO[0], 0.0)
        print(f"g{GI} oracle d-xys.x on {backend} inputs: "
              f"{s[chip['gidx'] == GI].sum():.6e}")
        return

    other = dict(np.load(other_path))
    for k in ("gidx", "tids", "tstart"):
        same = np.array_equal(chip[k], other[k])
        print(f"{k}: identical={same}"
              + ("" if same else f"  ndiff={int((chip[k] != other[k]).sum())}"))
    for k in ("packed", "out", "g_tile"):
        d = np.abs(chip[k] - other[k])
        print(f"{k}: max abs diff {d.max():.3e}")

    for tag, src in (("this-backend", chip), ("other-backend", other)):
        dO, _ = terms.oracle(src["packed"].astype(np.float64),
                             src["tstart"],
                             src["g_tile"].astype(np.float64))
        s = np.where(src["tids"] < 4, dO[0], 0.0)
        print(f"g{GI} oracle d-xys.x on {tag} inputs: "
              f"{s[src['gidx'] == GI].sum():.6e}")

    # cross: chip packed with other g_tile and vice versa
    dO, _ = terms.oracle(chip["packed"].astype(np.float64), chip["tstart"],
                         other["g_tile"].astype(np.float64))
    s = np.where(chip["tids"] < 4, dO[0], 0.0)
    print(f"g{GI} oracle: this packed + other g_tile: "
          f"{s[chip['gidx'] == GI].sum():.6e}")
    dO, _ = terms.oracle(other["packed"].astype(np.float64),
                         other["tstart"],
                         chip["g_tile"].astype(np.float64))
    s = np.where(other["tids"] < 4, dO[0], 0.0)
    print(f"g{GI} oracle: other packed + this g_tile: "
          f"{s[other['gidx'] == GI].sum():.6e}")


if __name__ == "__main__":
    main()
