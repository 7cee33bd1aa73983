"""Pallas TPU kernels for tile-based alpha compositing — forward + analytic
backward (custom_vjp), gsplat v0.1.11 semantics.

Design (vs the chunked pure-JAX walker in ops/compositing.py):
  * grid = one program per 16x16 tile, walking the UNPADDED depth-sorted
    entry list directly: tile t owns entries [tile_start[t], tile_start[t+1])
    and DMAs the 128-aligned chunk windows covering that range, masking
    out-of-range lanes. Adjacent tiles may share a boundary chunk — safe for
    reads, and safe for the backward's writes because the TPU grid executes
    sequentially (one core): seam chunks are merged read-add-write, and each
    program drains its store DMAs before returning, so the next program
    always observes them. This removes the padded-entry repack of earlier
    designs (two budget-sized descriptor-rate gathers, ~14 ms/iter at bench
    scale on v5e);
  * entry data lives transposed in HBM as (16, budget) f32 — rows are
    attributes [x, y, conic0, conic1, conic2, opacity, r, g, b, pad...],
    columns are entries — so a chunk is a (16, 128) lane-aligned DMA;
  * all compute is laid out (P=256 pixels on sublanes, C=128 entries on
    lanes): entry attributes broadcast as (1, C) rows, pixel coordinates as
    (P, 1) columns — zero transposes, full VPU tiles;
  * the front-to-back recurrence is closed into vector form with log2(C)
    shift-multiply scans along lanes (Hillis-Steele);
  * forward early-exits a tile once every pixel crosses the 1e-4
    transmittance cutoff and records HOW MANY chunks it walked (kstop, an
    SMEM output). The backward walks only those kstop chunks — on
    high-overdraw scenes this skips most of the entry list (everything
    behind the last contributing splat has zero gradient). Skipped chunks
    stay zero because the gradient output buffer is input_output_aliased to
    a zeros array;
  * backward reuses the saved per-tile output: gsplat's back-to-front suffix
    accumulators are recovered front-to-back from S_total = g_rgb . acc, so a
    single forward-order walk emits per-entry gradients for
    xy/conic/color/opacity. Per-Gaussian reduction is a sort-based
    segment-sum outside the kernel (gather_entries_segsum).

References: compositing semantics mirror /root/reference/utils/gs_utils.py:96-109
and SURVEY.md C14; kernel structure follows the Pallas TPU guide (DMA +
PrefetchScalarGridSpec patterns).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK_W = 16   # packed attribute rows (9 used)
CHUNK = 128   # entries per DMA chunk (lane width)


def pack_entries_t(xy, conic, color, opac) -> jnp.ndarray:
    """-> (PACK_W, budget) transposed packed entries (budget padded to 128)."""
    n = xy.shape[0]
    n_pad = ((n + CHUNK - 1) // CHUNK) * CHUNK
    rows = [xy[:, 0], xy[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
            opac, color[:, 0], color[:, 1], color[:, 2]]
    out = jnp.stack(rows, axis=0)  # (9, n)
    out = jnp.concatenate(
        [out, jnp.zeros((PACK_W - 9, n), jnp.float32)], axis=0)
    return jnp.pad(out, ((0, 0), (0, n_pad - n)))


def gather_packed_entries(pgauss_t: jnp.ndarray, gidx: jnp.ndarray
                          ) -> jnp.ndarray:
    """Per-gaussian packed attributes (PACK_W, N) -> per-entry (PACK_W,
    budget) via ONE gather along lanes (padding slots resolve to gaussian 0
    and are masked in-kernel by the true per-tile counts)."""
    return pgauss_t[:, gidx]


@jax.custom_vjp
def gather_entries_segsum(pgauss_t, gidx, sortkey, gauss_starts):
    """`pgauss_t[:, gidx]` with a sort-based backward.

    The autodiff transpose of the entry gather is a scatter-add of
    (PACK_W, budget) gradients into (PACK_W, N) — XLA's TPU scatter emitter
    runs it at ~78 ns/row (23 ms/view at bench scale). This backward instead
    sorts the gradient columns by Gaussian id (multi-payload `lax.sort`,
    ~0.3 ms), takes a lane cumsum and differences it at the per-Gaussian
    boundaries `gauss_starts` (exact counts from the binning's key-threshold
    truncation, binning.py) — ~2 ms/view total on v5e.

    sortkey: (budget,) int32, = gidx for real entries, >= N for padding.
    gauss_starts: (N + 1,) int32 exclusive-cumsum entry counts per Gaussian.
    """
    return pgauss_t[:, gidx]


def _gather_segsum_fwd(pgauss_t, gidx, sortkey, gauss_starts):
    return pgauss_t[:, gidx], (pgauss_t.shape, sortkey, gauss_starts)


def _cumsum_lanes_blocked(x: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """Inclusive cumsum along the last axis of a 2-D f32 array.

    XLA lowers a long-axis cumsum to ~log2(n) full-array shifted adds
    (2.8 ms for (9, 1M) on v5e); blocking to 128 lanes + a tiny block-offset
    pass is ~3x less traffic."""
    rows, n = x.shape
    nb = (n + block - 1) // block
    x3 = jnp.pad(x, ((0, 0), (0, nb * block - n))).reshape(rows, nb, block)
    cs = jnp.cumsum(x3, axis=-1)
    totals = cs[:, :, -1]
    off = jnp.cumsum(totals, axis=-1) - totals             # exclusive
    return (cs + off[:, :, None]).reshape(rows, nb * block)[:, :n]


def _gather_segsum_bwd(res, ct):
    (w, n_pad), sortkey, gauss_starts = res
    # only the 9 real attribute rows carry gradient; rows 9..PACK_W are the
    # pack padding and stay zero (halves the sort payload)
    used = 9
    ops = (sortkey,) + tuple(ct[i] for i in range(used))
    sorted_ = jax.lax.sort(ops, dimension=sortkey.ndim - 1, num_keys=1)
    dsort = jnp.stack(sorted_[1:], axis=0)                 # (used, budget)
    c = _cumsum_lanes_blocked(dsort)
    c = jnp.concatenate([jnp.zeros(c.shape[:-1] + (1,), c.dtype), c],
                        axis=-1)
    # ONE boundary gather at all N+1 starts, then diff along the gathered
    # axis (gather cost on TPU is per-index, so two gathers at starts[1:]
    # and starts[:-1] would double it)
    cb = c[:, gauss_starts]                                  # (used, N + 1)
    d_pg = cb[:, 1:] - cb[:, :-1]                            # (used, N)
    n = d_pg.shape[-1]
    d_pg = jnp.pad(d_pg, ((0, w - used), (0, n_pad - n)))
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return d_pg, f0(sortkey), f0(sortkey), f0(gauss_starts)


gather_entries_segsum.defvjp(_gather_segsum_fwd, _gather_segsum_bwd)


def _shift_right(v, s, identity):
    """Shift along lanes: out[:, i] = v[:, i-s], first s columns = identity."""
    pad = jnp.full(v.shape[:-1] + (s,), identity, v.dtype)
    return jnp.concatenate([pad, v[..., :-s]], axis=-1)


def _tri_inclusive(c: int) -> jnp.ndarray:
    """(C, C) f32 with [i, j] = 1 where i <= j: `v @ tri` is an inclusive
    cumsum along lanes as ONE MXU matmul — replaces the log2(C)-step
    shift-multiply Hillis-Steele scan (14 full-width VPU ops for C=128,
    the largest single block of per-chunk vector work in these kernels).
    bf16x6 matmul passes keep it exact to ~2^-45 relative."""
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (row <= col).astype(jnp.float32)


_HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b):
    """f32-exact matmul on the MXU (bf16x6 passes; operands are tiny)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=_HIGHEST,
                               preferred_element_type=jnp.float32)


def _pixel_bases(ts: int, tiles_x: int, t):
    """Per-tile pixel polynomial bases in TILE-CENTERED coordinates.

    Returns (A (P,6), AT (6,P), ox, oy): A rows are
    [1, px, py, px^2, py^2, px*py] for the P=ts*ts pixels of tile ``t``
    with px/py measured from the tile center (|px| < ts), so the bilinear
    sigma/moment matmuls below stay cancellation-free; ox/oy recenters the
    entry coordinates. Centered-coordinate magnitudes keep the expanded
    quadratic exact to ~2^-45 relative under bf16x6.
    """
    half = (ts - 1) * 0.5
    p = ts * ts

    def basis(shape, dim):
        row = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
        lx = (row % ts).astype(jnp.float32) - half
        ly = (row // ts).astype(jnp.float32) - half
        one = jnp.ones(shape, jnp.float32)
        return [one, lx, ly, lx * lx, ly * ly, lx * ly]

    A = jnp.concatenate(basis((p, 1), 0), axis=1)    # (P, 6)
    AT = jnp.concatenate(basis((1, p), 1), axis=0)   # (6, P)
    ox = (t % tiles_x).astype(jnp.float32) * ts + half
    oy = (t // tiles_x).astype(jnp.float32) * ts + half
    return A, AT, ox, oy


def _chunk_quantities(e, A, ox, oy, t_in, done_in, athr, amax, eps, tri,
                      lane_valid=None):
    """Shared fwd/bwd math for one (P, C) block.

    e: (PACK_W, C) attribute rows; A: (P, 6) centered pixel basis;
    ox/oy: tile-center pixel coordinates (scalars); t_in/done_in: (P, 1);
    tri: (C, C) inclusive-cumsum matrix (_tri_inclusive);
    lane_valid: (1, C) mask of real (non-padding) entries in this chunk.

    sigma is evaluated as ONE MXU matmul A @ B of the expanded quadratic
    (B built from per-entry conics in centered coordinates) instead of
    ~10 (P, C) VPU ops; the transmittance cumprod runs in log domain so
    the lane scan is one MXU matmul (`log(om) @ tri` then exp). The
    compositing recurrence exploits that the running transmittance
    ``incl`` is monotone non-increasing along lanes, so gsplat's
    early-termination masks are plain comparisons and t_out is a lane
    min-reduce.
    """
    x = e[0:1, :] - ox                     # (1, C) centered entry coords
    y = e[1:2, :] - oy
    c0, c1, c2 = e[2:3, :], e[3:4, :], e[4:5, :]
    op = e[5:6, :]
    if lane_valid is not None:
        op = jnp.where(lane_valid, op, 0.0)
    b0 = 0.5 * (c0 * x * x + c2 * y * y) + c1 * x * y
    b1 = -(c0 * x + c1 * y)
    b2 = -(c2 * y + c1 * x)
    b3 = jnp.broadcast_to(0.5 * c0, x.shape)
    b4 = jnp.broadcast_to(0.5 * c2, x.shape)
    b5 = jnp.broadcast_to(c1, x.shape)
    B = jnp.concatenate([b0, b1, b2, b3, b4, b5], axis=0)   # (6, C)
    # sigma clamped, not sign-masked: see naive.py (PSD conics). The clamp
    # also kills the expanded quadratic's rounding noise at splat centers.
    sig_raw = _dot(A, B)                                    # (P, C)
    sigma = jnp.maximum(sig_raw, 0.0)
    # NOTE the clamp gets NO derivative gate in the backward: conics are PSD
    # so true sigma >= 0 everywhere and sig_raw < 0 is pure rounding noise
    # of the expanded quadratic (|error| ~ |b0| * 2^-24, largest for splats
    # far from the tile center). Gating on `sig_raw >= 0` made the gradient
    # depend on that rounding's SIGN at splat-center pixels — the backend-
    # specific single-term gradient flips of VALIDATE_r03 part 1 (the
    # oracle's direct quadratic is cancellation-free, so its clamp never
    # trips and it always takes the full derivative).
    raw = op * jnp.exp(-sigma)
    a = jnp.minimum(amax, raw)
    okm = a >= athr
    a = jnp.where(okm, a, 0.0)
    om = 1.0 - a
    # om in [1 - amax, 1]: log is finite; skipped lanes have om = 1 -> 0
    incl = jnp.exp(_dot(jnp.log(om), tri)) * t_in
    excl = _shift_right(incl, 1, 1.0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, excl.shape, 1) == 0
    excl = jnp.where(col0, t_in, excl)
    # incl is monotone non-increasing: a pixel composites a lane iff its
    # post-lane transmittance is still above the cutoff (gsplat breaks
    # BEFORE compositing the crossing Gaussian), and t_out is the last
    # still-above-cutoff value.
    contrib = okm & jnp.logical_not(done_in) & (incl > eps)
    vis = jnp.where(contrib, a * excl, 0.0)
    t_out = jnp.min(jnp.where(incl > eps, incl, t_in), axis=-1,
                    keepdims=True)
    t_out = jnp.where(done_in, t_in, t_out)
    done_out = done_in | (incl[:, -1:] <= eps)
    return dict(x=x, y=y, sigma=sigma, raw=raw,
                a=a, om=om, excl=excl, vis=vis, contrib=contrib,
                t_out=t_out, done_out=done_out, c0=c0, c1=c1, c2=c2, op=op)


def _make_calls(img_height: int, img_width: int, tile_size: int,
                athr: float, amax: float, eps: float, budget: int,
                interpret: bool, num_images: int = 1):
    ts = tile_size
    tiles_x = (img_width + ts - 1) // ts
    tiles_y = (img_height + ts - 1) // ts
    tiles_img = tiles_x * tiles_y          # tiles per image
    num_tiles = tiles_img * num_images     # total grid (V views flattened)
    p = ts * ts
    chunk = CHUNK
    assert budget % chunk == 0, (budget, chunk)

    # ------------------------------------------------------------- forward
    def fwd_kernel(meta_ref, packed_ref, out_ref, kstop_ref, ebuf, sbuf, sem):
        t = pl.program_id(0)
        start = meta_ref[t]
        end = meta_ref[t + 1]
        first = start // chunk
        base0 = first * chunk
        nchunks = jnp.where(end > start, (end - 1) // chunk + 1 - first, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        A, _, ox, oy = _pixel_bases(ts, tiles_x, jax.lax.rem(t, tiles_img))
        tri = _tri_inclusive(chunk)
        # per-tile state in VMEM columns: [r, g, b, T, done, 0, 0, 0]
        init_cols = jnp.concatenate(
            [jnp.zeros((p, 3), jnp.float32), jnp.ones((p, 1), jnp.float32),
             jnp.zeros((p, 4), jnp.float32)], axis=1)
        sbuf[:, :] = init_cols

        def chunk_dma(slot, k):
            return pltpu.make_async_copy(
                packed_ref.at[:, pl.ds(pl.multiple_of(base0 + k * chunk,
                                                      chunk), chunk)],
                ebuf.at[slot], sem.at[slot])

        @pl.when(nchunks > 0)
        def _():
            chunk_dma(0, 0).start()

        def cond(carry):
            k, all_done = carry
            return (k < nchunks) & jnp.logical_not(all_done)

        def body(carry):
            k, _ = carry
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < nchunks)
            def _():
                chunk_dma(jax.lax.rem(k + 1, 2), k + 1).start()

            chunk_dma(slot, k).wait()
            e = ebuf[slot]
            t_in = sbuf[:, 3:4]
            done = sbuf[:, 4:5] > 0.5
            gpos = base0 + k * chunk + lane
            lane_valid = (gpos >= start) & (gpos < end)
            q = _chunk_quantities(e, A, ox, oy, t_in, done, athr, amax, eps,
                                  tri, lane_valid)
            # (P, C) @ (C, 3) on the MXU instead of 3 lane reductions
            rgb_new = sbuf[:, 0:3] + jax.lax.dot_general(
                q["vis"], e[6:9, :], (((1,), (1,)), ((), ())),
                precision=_HIGHEST, preferred_element_type=jnp.float32)
            done_new = q["done_out"].astype(jnp.float32)
            sbuf[:, :] = jnp.concatenate(
                [rgb_new, q["t_out"], done_new,
                 jnp.zeros((p, 3), jnp.float32)], axis=1)
            return k + 1, jnp.all(done_new > 0.5)

        k_final, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(False)))

        # early transmittance exit leaves the k_final prefetch in flight —
        # drain it or the device aborts on an outstanding DMA
        @pl.when(k_final < nchunks)
        def _():
            chunk_dma(jax.lax.rem(k_final, 2), k_final).wait()

        out_ref[0] = sbuf[:, 0:4]
        kstop_ref[t] = k_final

    grid_fwd = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec((1, p, 4), lambda t, s: (t, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.VMEM((2, PACK_W, chunk), jnp.float32),
                        pltpu.VMEM((p, 8), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    fwd_call = pl.pallas_call(
        fwd_kernel,
        grid_spec=grid_fwd,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, p, 4), jnp.float32),
                   jax.ShapeDtypeStruct((num_tiles,), jnp.int32)],
        interpret=interpret)

    # ------------------------------------------------------------ backward
    # meta = concat(tile_start (T+1), kstop (T)). Walks only the kstop
    # chunks the forward composited; untouched chunks keep the zeros of the
    # aliased output buffer. Only a tile's FIRST window chunk can have been
    # written before it runs (tile entry ranges are monotone, so every
    # earlier tile's window ends at or before this tile's first chunk) — so
    # k == 0 is merged read-add-write and all later chunks are plain writes,
    # removing a per-chunk read DMA stream. Out-of-range lanes produce
    # exactly-zero gradient rows, and the sequential TPU grid plus the
    # end-of-program store drain order the seam writes.
    def bwd_kernel(meta_ref, packed_ref, g_out_ref, out_saved_ref, zeros_ref,
                   dout_ref, ebuf, rbuf, obuf, gbuf, abuf, sbuf,
                   sem_in, sem_rd, sem_go, sem_out):
        t = pl.program_id(0)
        start = meta_ref[t]
        end = meta_ref[t + 1]
        first = start // chunk
        base0 = first * chunk
        nchunks = jnp.where(end > start, (end - 1) // chunk + 1 - first, 0)
        nchunks = jnp.minimum(nchunks, meta_ref[num_tiles + 1 + t])
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        A, AT, ox, oy = _pixel_bases(ts, tiles_x, jax.lax.rem(t, tiles_img))
        tri = _tri_inclusive(chunk)
        # g_out / out arrive as WHOLE HBM operands, transposed to
        # (4, num_tiles * p) so the per-tile window is a 128-aligned lane
        # slice, and are DMA'd per tile. The (1, p, 4) VMEM-blocked
        # BlockSpec slicing used through round 4 delivered wrong data to
        # this kernel when the cotangent arrived fused through the image
        # transpose chain (VALIDATE_r04: bit-identical values, wrong
        # gradient — a layout inconsistency at the custom-call boundary).
        # HBM operands are materialized and passed whole, bypassing the
        # blocked slicing entirely.
        cp_g = pltpu.make_async_copy(
            g_out_ref.at[:, pl.ds(pl.multiple_of(t * p, chunk), p)],
            gbuf, sem_go.at[0])
        cp_a = pltpu.make_async_copy(
            out_saved_ref.at[:, pl.ds(pl.multiple_of(t * p, chunk), p)],
            abuf, sem_go.at[1])
        cp_g.start()
        cp_a.start()
        cp_g.wait()
        cp_a.wait()
        g_rgb_t = gbuf[0:3, :]                         # (3, p)
        prod = gbuf[:, :] * abuf[:, :]                 # (4, p) g . acc
        sg = jnp.concatenate(
            [jnp.sum(prod[0:3], axis=0, keepdims=True), prod[3:4]], axis=0)
        cols = jnp.transpose(sg)                       # (p, 2)
        s_total = cols[:, 0:1]
        gt_term = cols[:, 1:2]
        # state columns: [T, done, s_rem, ...]
        sbuf[:, :] = jnp.concatenate(
            [jnp.ones((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32),
             s_total, jnp.zeros((p, 5), jnp.float32)], axis=1)

        def chunk_dma(slot, k):
            return pltpu.make_async_copy(
                packed_ref.at[:, pl.ds(pl.multiple_of(base0 + k * chunk,
                                                      chunk), chunk)],
                ebuf.at[slot], sem_in.at[slot])

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
            # gc(p, c) = sum_ch g_ch(p) color_ch(c): one MXU matmul
            gc = jax.lax.dot_general(
                g_rgb_t, e[6:9, :], (((0,), (0,)), ((), ())),
                precision=_HIGHEST, preferred_element_type=jnp.float32)
            terms = jnp.where(q["contrib"], gc * q["vis"], 0.0)
            pre_incl = _dot(terms, tri)   # inclusive lane cumsum on the MXU
            s_after = s_rem - pre_incl
            da = q["excl"] * gc - (s_after + gt_term) / q["om"]
            # alpha-clamp derivative: zero where the amax clamp was active.
            # No sig_raw-sign gate here (see _chunk_quantities NOTE): the
            # sigma clamp only ever absorbs rounding noise, so the full
            # derivative is the correct one and gating on the noise's sign
            # caused backend-dependent term flips (VALIDATE_r03 part 1).
            active = q["contrib"] & (q["raw"] < amax)
            dsig = jnp.where(active, -q["raw"] * da, 0.0)

            # All pixel reductions as TWO moment matmuls: with dx = x - px
            # expanded about the tile center, every per-entry gradient row
            # is a polynomial in the dsig-moments M = AT @ dsig of the pixel
            # basis [1, px, py, px^2, py^2, px*py] (and the color rows are
            # g^T @ vis); d/d-opacity is -S1/op since dsig = -raw * da and
            # raw = op * exp(-sigma).
            M = _dot(AT, dsig)                         # (6, C)
            s1, sx, sy = M[0:1], M[1:2], M[2:3]
            sxx, syy, sxy = M[3:4], M[4:5], M[5:6]
            x, y = q["x"], q["y"]
            sdx = x * s1 - sx
            sdy = y * s1 - sy
            sdxx = x * x * s1 - 2.0 * x * sx + sxx
            sdyy = y * y * s1 - 2.0 * y * sy + syy
            sdxy = x * y * s1 - x * sy - y * sx + sxy
            crows = _dot(g_rgb_t, q["vis"])            # (3, C)
            rows = [
                q["c0"] * sdx + q["c1"] * sdy,
                q["c1"] * sdx + q["c2"] * sdy,
                0.5 * sdxx,
                sdxy,
                0.5 * sdyy,
                jnp.where(q["op"] > 0.0, -s1 / jnp.maximum(q["op"], 1e-30),
                          0.0),
                crows[0:1],
                crows[1:2],
                crows[2:3],
                jnp.zeros((PACK_W - 9, chunk), jnp.float32),
            ]
            # alternate output buffers so the store DMA overlaps the next
            # chunk's compute; wait for this slot's previous store first
            @pl.when(k >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot],
                    dout_ref.at[:, pl.ds(pl.multiple_of(
                        (base0 + (k - 2) * chunk), chunk), chunk)],
                    sem_out.at[slot]).wait()

            # merge only the first chunk: out-of-range lanes carry zero
            # rows, in-range lanes of rbuf are zero (aliased zeros; only
            # earlier tiles wrote there)
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
                                     chunk)],
                sem_out.at[slot]).start()
            s_rem_new = s_rem - pre_incl[:, -1:]
            sbuf[:, :] = jnp.concatenate(
                [q["t_out"], q["done_out"].astype(jnp.float32), s_rem_new,
                 jnp.zeros((p, 5), jnp.float32)], axis=1)
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)
        # drain outstanding output stores (up to two in flight)
        def drain(k, _):
            slot = jax.lax.rem(k, 2)
            pltpu.make_async_copy(
                obuf.at[slot],
                dout_ref.at[:, pl.ds(pl.multiple_of(base0 + k * chunk, chunk),
                                     chunk)],
                sem_out.at[slot]).wait()
            return 0
        jax.lax.fori_loop(jnp.maximum(nchunks - 2, 0), nchunks, drain, 0)

    grid_bwd = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[pltpu.VMEM((2, PACK_W, chunk), jnp.float32),
                        pltpu.VMEM((PACK_W, chunk), jnp.float32),
                        pltpu.VMEM((2, PACK_W, chunk), jnp.float32),
                        pltpu.VMEM((4, p), jnp.float32),
                        pltpu.VMEM((4, p), jnp.float32),
                        pltpu.VMEM((p, 8), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))])
    bwd_call = pl.pallas_call(
        bwd_kernel,
        grid_spec=grid_bwd,
        out_shape=[jax.ShapeDtypeStruct((PACK_W, budget), jnp.float32)],
        # inputs: (meta, packed, g_out, out_saved, zeros) — alias the zeros
        # buffer to the gradient output so skipped chunks stay exactly zero
        input_output_aliases={4: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True))

    @jax.custom_vjp
    def composite(packed_t, tile_start):
        out, _ = fwd_call(tile_start, packed_t)
        return out

    def composite_fwd(packed_t, tile_start):
        out, kstop = fwd_call(tile_start, packed_t)
        return out, (packed_t, tile_start, out, kstop)

    def composite_bwd(res, g_out):
        packed_t, tile_start, out, kstop = res
        meta = jnp.concatenate([tile_start, kstop])
        zeros = jnp.zeros((PACK_W, budget), jnp.float32)
        # (T, p, 4) -> (4, T * p): lane-aligned per-tile windows for the
        # kernel's HBM DMA (see bwd_kernel comment)
        g2 = jnp.transpose(g_out.reshape(num_tiles * p, 4))
        o2 = jnp.transpose(out.reshape(num_tiles * p, 4))
        (d_packed,) = bwd_call(meta, packed_t, g2, o2, zeros)
        d_ts = np.zeros(tile_start.shape, jax.dtypes.float0)
        return d_packed, d_ts

    composite.defvjp(composite_fwd, composite_bwd)
    return composite, (tiles_x, tiles_y, num_tiles, p)


@functools.lru_cache(maxsize=64)
def _cached_calls(*args):
    return _make_calls(*args)


def composite_packed(
    packed_t: jnp.ndarray, tile_start: jnp.ndarray,
    img_height: int, img_width: int, tile_size: int, background,
    alpha_threshold: float = 1.0 / 255.0, max_alpha: float = 0.999,
    transmittance_eps: float = 1e-4, interpret: bool | None = None,
    num_images: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core entry point: pre-packed (PACK_W, budget) depth-sorted entries;
    tile t owns the UNPADDED range [tile_start[t], tile_start[t+1]) (the
    binning sort's per-tile offsets, no chunk alignment required).

    With ``num_images`` V > 1 the entry list covers V views flattened as one
    virtual image of V * tiles-per-image tiles (one kernel launch for the
    whole batch); returns (V, H, W, 3) rgb and (V, H, W) alpha."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    budget = packed_t.shape[1]
    composite, (tiles_x, tiles_y, num_tiles, p) = _cached_calls(
        img_height, img_width, tile_size, float(alpha_threshold),
        float(max_alpha), float(transmittance_eps), budget, bool(interpret),
        num_images)
    out = composite(packed_t, tile_start.astype(jnp.int32))
    ts = tile_size
    v = num_images
    # ONE untile transpose of the full 4-channel tensor, channels split at
    # the image level. Splitting FIRST (separate rgb and T transpose
    # chains whose cotangents concat back into the minor-dim-4 tensor)
    # triggered an XLA-TPU miscompile of the fused VJP on the axon stack:
    # the T-channel cotangent came back wrong for 957/1024 pixels while
    # rgb's was exact — the entire two-round part-1 "gradient flip"
    # (VALIDATE_r05.md; repro preserved in tools/diag_part1_witness.py).
    img = (out.reshape(v, tiles_y, tiles_x, ts, ts, 4)
           .transpose(0, 1, 3, 2, 4, 5)
           .reshape(v, tiles_y * ts, tiles_x * ts, 4))
    img = img[:, :img_height, :img_width]
    rgb = img[..., 0:3]
    t_img = img[..., 3]
    rgb = rgb + t_img[..., None] * background[None, None, None, :]
    return rgb, 1.0 - t_img


def composite_tiles_pallas(
    entry_xy, entry_conic, entry_color, entry_opac, tile_start,
    img_height: int, img_width: int, tile_size: int, background,
    alpha_threshold: float = 1.0 / 255.0, max_alpha: float = 0.999,
    transmittance_eps: float = 1e-4, chunk: int = CHUNK,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-entry-array single-image wrapper (compositing.composite_tiles
    contract): depth-sorted entries with unpadded per-tile ranges."""
    assert chunk == CHUNK, "pallas path uses 128-entry chunks"
    packed_t = pack_entries_t(entry_xy, entry_conic, entry_color, entry_opac)
    rgb, alpha = composite_packed(
        packed_t, tile_start, img_height, img_width, tile_size,
        background, alpha_threshold, max_alpha, transmittance_eps, interpret)
    return rgb[0], alpha[0]
