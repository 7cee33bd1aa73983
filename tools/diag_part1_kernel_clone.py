import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tools.diag_part1 import build_inputs
from splatformer_tpu.ops.binning import bin_gaussians
from splatformer_tpu.ops.pallas.raster import (
    _chunk_quantities, _dot, _pixel_bases, _tri_inclusive,
    gather_entries_segsum, pack_entries_t, PACK_W, CHUNK)

proj, colors, opac, bg, target = build_inputs()
bins = jax.jit(lambda p: bin_gaussians(p, 32, 32, 16, 2**13, 16))(proj)
pg = pack_entries_t(jnp.asarray(proj.xys), jnp.asarray(proj.conics),
                    jnp.asarray(colors), jnp.asarray(opac))
entry_valid = bins.tile_ids < 4
sortkey = jnp.where(entry_valid, bins.gauss_idx, pg.shape[1])
packed = jnp.asarray(np.asarray(gather_entries_segsum(
    pg, bins.gauss_idx, sortkey, bins.gauss_starts)))
tstart = np.asarray(bins.tile_start)
budget = packed.shape[1]

athr, amax, eps = 1.0/255.0, 0.999, 1e-4
ts, tiles_x, tiles_y = 16, 2, 2
tiles_img = 4; num_tiles = 4
chunk, p = CHUNK, 256
PIX = 5*16 + 8   # pixel (8,5) — the largest dsig contributor of entry 246

# ---- forward with the real fwd kernel machinery is unnecessary: emulate
# (known-correct eagerly) to produce out_saved and g_out exactly like
# composite_bwd receives them.
A_all = {}
out_saved = np.zeros((num_tiles, p, 4), np.float32)
for t in range(num_tiles):
    start, end = int(tstart[t]), int(tstart[t+1])
    base0 = (start // chunk) * chunk
    nch = (end - 1)//chunk + 1 - start//chunk if end > start else 0
    A, AT, ox, oy = _pixel_bases(ts, tiles_x, jnp.int32(t))
    A_all[t] = (A, AT, ox, oy, start, end, base0, nch)
    t_in = jnp.ones((p,1)); done = jnp.zeros((p,1), bool); rgb = jnp.zeros((p,3))
    tri = _tri_inclusive(chunk)
    for k in range(nch):
        lo = base0 + k*chunk
        e = packed[:, lo:lo+chunk]
        lane = jnp.arange(lo, lo+chunk)[None, :]
        lv = (lane >= start) & (lane < end)
        q = _chunk_quantities(e, A, ox, oy, t_in, done, athr, amax, eps, tri, lv)
        rgb = rgb + _dot(q["vis"], jnp.transpose(e[6:9, :]))
        t_in, done = q["t_out"], q["done_out"]
    out_saved[t, :, 0:3] = np.asarray(rgb)
    out_saved[t, :, 3] = np.asarray(t_in)[:, 0]

npix = 1024
g_out = np.zeros((num_tiles, p, 4), np.float32)
bgn = np.asarray(bg)
for t in range(num_tiles):
    ty, tx = t // tiles_x, t % tiles_x
    tg = np.asarray(target)[ty*16:(ty+1)*16, tx*16:(tx+1)*16, :].reshape(p, 3)
    out_full = out_saved[t, :, 0:3] + out_saved[t, :, 3:4] * bgn[None]
    gr = 2.0*(np.minimum(out_full, 1.0) - tg)/(npix*3)
    gr = np.where(out_full <= 1.0, gr, 0.0)
    g_out[t, :, 0:3] = gr
    g_out[t, :, 3] = -0.1/npix + gr @ bgn

# ---- diagnostic backward kernel (copy of bwd_kernel, rows 9-15 = probes)
def bwd_kernel(meta_ref, packed_ref, g_out_ref, out_saved_ref, zeros_ref,
               dout_ref, ebuf, rbuf, obuf, sbuf, sem_in, sem_rd, sem_out):
    t = pl.program_id(0)
    start = meta_ref[t]; end = meta_ref[t + 1]
    first = start // chunk
    base0 = first * chunk
    nchunks = jnp.where(end > start, (end - 1) // chunk + 1 - first, 0)
    nchunks = jnp.minimum(nchunks, meta_ref[num_tiles + 1 + t])
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    A, AT, ox, oy = _pixel_bases(ts, tiles_x, jax.lax.rem(t, tiles_img))
    tri = _tri_inclusive(chunk)
    g_rgb = g_out_ref[0][:, 0:3]
    gT = g_out_ref[0][:, 3:4]
    acc = out_saved_ref[0]
    s_total = jnp.sum(g_rgb * acc[:, 0:3], axis=1, keepdims=True)
    gt_term = gT * acc[:, 3:4]
    sbuf[:, :] = jnp.concatenate(
        [jnp.ones((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32),
         s_total, jnp.zeros((p, 5), jnp.float32)], axis=1)

    def chunk_dma(slot, k):
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(pl.multiple_of(base0 + k * chunk, chunk),
                                   chunk)], ebuf.at[slot], sem_in.at[slot])

    def read_dma():
        return pltpu.make_async_copy(
            dout_ref.at[:, pl.ds(pl.multiple_of(base0, chunk), chunk)],
            rbuf, sem_rd)

    @pl.when(nchunks > 0)
    def _():
        chunk_dma(0, 0).start()
        read_dma().start()

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        @pl.when(k + 1 < nchunks)
        def _():
            chunk_dma(jax.lax.rem(k + 1, 2), k + 1).start()
        chunk_dma(slot, k).wait()
        e = ebuf[slot]
        t_in = sbuf[:, 0:1]
        done = sbuf[:, 1:2] > 0.5
        s_rem = sbuf[:, 2:3]
        gpos = base0 + k * chunk + lane
        lane_valid = (gpos >= start) & (gpos < end)
        q = _chunk_quantities(e, A, ox, oy, t_in, done, athr, amax, eps,
                              tri, lane_valid)
        gc = jax.lax.dot_general(
            g_rgb, e[6:9, :], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        terms = jnp.where(q["contrib"], gc * q["vis"], 0.0)
        pre_incl = _dot(terms, tri)
        s_after = s_rem - pre_incl
        da = q["excl"] * gc - (s_after + gt_term) / q["om"]
        active = q["contrib"] & (q["raw"] < amax)
        dsig = jnp.where(active, -q["raw"] * da, 0.0)
        M = _dot(AT, dsig)
        s1, sx, sy = M[0:1], M[1:2], M[2:3]
        x, y = q["x"], q["y"]
        sdx = x * s1 - sx
        sdy = y * s1 - sy
        crows = _dot(jnp.transpose(g_rgb), q["vis"])
        rows = [
            q["c0"] * sdx + q["c1"] * sdy,
            q["c1"] * sdx + q["c2"] * sdy,
            jnp.zeros((3, chunk), jnp.float32),
            jnp.zeros((1, chunk), jnp.float32),
            crows[0:1],
            jnp.zeros((2, chunk), jnp.float32),
            # diagnostics:
            e[0:1, :],                    # row 9: DMA echo of x coords
            s1,                           # row 10: moment s1
            dsig[PIX:PIX+1, :],           # row 11: dsig at pixel (8,5)
            da[PIX:PIX+1, :],             # row 12
            q["excl"][PIX:PIX+1, :],      # row 13
            s_after[PIX:PIX+1, :],        # row 14
            gc[PIX:PIX+1, :],             # row 15
        ]
        @pl.when(k >= 2)
        def _():
            pltpu.make_async_copy(
                obuf.at[slot],
                dout_ref.at[:, pl.ds(pl.multiple_of(
                    (base0 + (k - 2) * chunk), chunk), chunk)],
                sem_out.at[slot]).wait()
        block = jnp.concatenate(rows, axis=0)
        @pl.when(k == 0)
        def _():
            read_dma().wait()
            obuf[slot] = rbuf[:, :] + block
        @pl.when(k > 0)
        def _():
            obuf[slot] = block
        pltpu.make_async_copy(
            obuf.at[slot],
            dout_ref.at[:, pl.ds(pl.multiple_of(base0 + k * chunk, chunk),
                                 chunk)], sem_out.at[slot]).start()
        sbuf[:, :] = jnp.concatenate(
            [q["t_out"], q["done_out"].astype(jnp.float32),
             s_rem - pre_incl[:, -1:], jnp.zeros((p, 5), jnp.float32)],
            axis=1)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    def drain(k, _):
        slot = jax.lax.rem(k, 2)
        pltpu.make_async_copy(
            obuf.at[slot],
            dout_ref.at[:, pl.ds(pl.multiple_of(base0 + k * chunk, chunk),
                                 chunk)], sem_out.at[slot]).wait()
        return 0
    jax.lax.fori_loop(jnp.maximum(nchunks - 2, 0), nchunks, drain, 0)

grid = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(num_tiles,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
              pl.BlockSpec((1, p, 4), lambda t, s: (t, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((1, p, 4), lambda t, s: (t, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.HBM)],
    out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
    scratch_shapes=[pltpu.VMEM((2, PACK_W, chunk), jnp.float32),
                    pltpu.VMEM((PACK_W, chunk), jnp.float32),
                    pltpu.VMEM((2, PACK_W, chunk), jnp.float32),
                    pltpu.VMEM((p, 8), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA((2,))])
kstop = np.array([A_all[t][7] for t in range(num_tiles)], np.int32)
meta = jnp.asarray(np.concatenate([tstart.astype(np.int32), kstop]))
zeros = jnp.zeros((PACK_W, budget), jnp.float32)
call = pl.pallas_call(bwd_kernel, grid_spec=grid,
                      out_shape=[jax.ShapeDtypeStruct((PACK_W, budget),
                                                      jnp.float32)],
                      input_output_aliases={4: 0}, interpret=True)
(dout,) = jax.jit(lambda m, pk, g, o, z: call(m, pk, g, o, z))(
    meta, packed, jnp.asarray(g_out), jnp.asarray(out_saved), zeros)
dout = np.asarray(dout)
E = 246
print("kernel-diag entry 246: dx=%.6e dy=%.6e" % (dout[0, E], dout[1, E]))
print("  echo x row9=%.6f (true %.6f)" % (dout[9, E], float(packed[0, E])))
print("  s1=%.6e dsig@88=%.6e da@88=%.6e excl@88=%.6f s_after@88=%.6e gc@88=%.6e"
      % tuple(dout[i, E] for i in (10, 11, 12, 13, 14, 15)))
