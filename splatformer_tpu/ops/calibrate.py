"""Scene-derived auto-sizing of rasterization budgets.

The binning pipeline (ops/binning.py) runs on static budgets — tier slot
caps, top-K tier membership, and the max_intersects truncation. Static
budgets are what make the sort/searchsorted pipeline one fixed-shape XLA
program, but a mis-sized budget silently truncates renders: the round-3
scale run dropped a mean 16.7k (gaussian, tile) entries per step because
the default tiers were tuned on the bench scene's splat statistics
(VERDICT r3 weak #2). This module closes that loop: measure the actual
per-Gaussian tile-count distribution of sample scenes/views with the
projection op, then size the tiers and budget so the measured workload fits
with margin. The result is still a static `RasterizeConfig` — calibration
is a host-side pre-pass, so the one compiled program per run is sized to
the dataset instead of to a hardcoded guess.

Budgets are rounded UP to coarse buckets so repeated runs over the same
dataset tier hit the persistent compile cache.

Reference counterpart: gsplat sizes its intersection buffers exactly per
view on device (cum_tiles_hit, /root/reference/utils/gs_utils.py:82-109);
a TPU program cannot, so measured-with-margin static sizing is the native
equivalent.
"""
from __future__ import annotations

from typing import Iterable, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from splatformer_tpu.ops.camera import opengl_c2w_to_opencv_w2c
from splatformer_tpu.ops.projection import project_gaussians
from splatformer_tpu.ops.render import activate_gaussians
from splatformer_tpu.ops.types import Camera, GaussianScene, RasterizeConfig


def _round_up(x: int, mult: int) -> int:
    return ((int(x) + mult - 1) // mult) * mult


@jax.jit
def _tile_counts(scene: GaussianScene, cameras: Camera) -> jnp.ndarray:
    """(V, N) int32 per-view tile-hit counts (0 = culled/masked)."""
    act = activate_gaussians(scene)
    mask = scene.valid_mask()
    ts = 16

    def per_view(c2w, fx, fy, cx, cy):
        viewmat = opengl_c2w_to_opencv_w2c(c2w)
        proj = project_gaussians(
            act["means"], act["scales"], act["quats"], viewmat,
            fx, fy, cx, cy, cameras.height, cameras.width,
            tile_size=ts, mask=mask)
        return proj.num_tiles_hit

    return jax.vmap(per_view)(cameras.c2w, cameras.fx, cameras.fy,
                              cameras.cx, cameras.cy)


def measure_tile_stats(samples: Iterable[Tuple[GaussianScene, Camera]]
                       ) -> dict:
    """Aggregate tile-count statistics over (scene, cameras) samples.

    Returns host-side stats: per-view hit totals, count quantiles over
    Gaussians that hit at least one tile, and exceedance counts used to size
    the tier top-Ks.
    """
    counts = []
    for scene, cameras in samples:
        c = np.asarray(_tile_counts(scene, cameras))
        counts.append(c)
    per_view_hits = np.concatenate(
        [c.sum(axis=1).reshape(-1) for c in counts])

    # quantiles/exceedance per SAMPLE, then worst case over samples: pooled
    # statistics let easy samples (e.g. unaugmented test scenes) dilute the
    # hardest one, and the budget must fit every sample
    def per_sample(f, default):
        vals = []
        for c in counts:
            alive = c[c > 0]
            if alive.size:
                vals.append(f(c, alive))
        return max(vals) if vals else default

    return {
        "max_count": int(per_sample(lambda c, a: a.max(), 1)),
        "q99": int(per_sample(lambda c, a: np.quantile(a, 0.99), 1)),
        "q999": int(per_sample(lambda c, a: np.quantile(a, 0.999), 1)),
        "alive_per_view": float(per_sample(
            lambda c, a: (c > 0).sum(axis=1).mean(), 1.0)),
        # per-view count of Gaussians whose tile count exceeds a threshold
        # (worst sample), queried when choosing tier slot splits
        "exceed_per_view": lambda thr: float(per_sample(
            lambda c, a: (c > thr).sum(axis=1).max(), 0.0)),
        "max_hits_per_view": int(per_view_hits.max()),
        "mean_hits_per_view": float(per_view_hits.mean()),
    }


def calibrate_raster_config(
    samples: Sequence[Tuple[GaussianScene, Camera]],
    base: RasterizeConfig = RasterizeConfig(),
    margin: float = 2.0,
) -> RasterizeConfig:
    """Return ``base`` with tiers/max_intersects/tiles_per_gauss sized so the
    measured workload fits with ``margin`` headroom (num_dropped ~ 0).

    margin 2.0 covers train-time perturbations the samples do not show:
    corruption-resampling augmentation (floater_scale grows splats) and the
    drift of refined scales during training (bounded above by the head's
    max-scale clamp, which keeps refined splats smaller than inputs).
    """
    stats = measure_tile_stats(samples)

    # every Gaussian gets slots for the 99th-percentile count; the top-K2
    # get the 99.9th percentile; the top-K3 get the max, with margin
    s1 = max(4, _round_up(stats["q99"], 2))
    s2 = max(s1 + 4, _round_up(int(stats["q999"] * margin), 4))
    s3 = max(s2 + 4, _round_up(int(stats["max_count"] * margin), 8))
    k2 = _round_up(max(stats["exceed_per_view"](s1) * margin, 256), 1024)
    k3 = _round_up(max(stats["exceed_per_view"](s2) * margin, 64), 512)

    budget = _round_up(int(stats["max_hits_per_view"] * margin), 65536)
    return base.replace(
        tiers=(int(s1), int(k2), int(s2), int(k3)),
        tiles_per_gauss=int(s3),
        max_intersects=int(budget),
    )


def calibration_summary(rcfg: RasterizeConfig) -> str:
    return (f"tiers={rcfg.tiers} tiles_per_gauss={rcfg.tiles_per_gauss} "
            f"max_intersects={rcfg.max_intersects}")
