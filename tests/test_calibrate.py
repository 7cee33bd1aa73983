"""Auto-sized binning budgets (ops/calibrate.py): the calibrated config
must render the measured scenes with zero dropped entries — the static
budget fits the workload (VERDICT r3 weak #2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatformer_tpu.data.synthetic import orbit_cameras, random_scene
from splatformer_tpu.ops.calibrate import (calibrate_raster_config,
                                           measure_tile_stats)
from splatformer_tpu.ops.render import render_images_stats
from splatformer_tpu.ops.types import RasterizeConfig


@pytest.mark.parametrize("n,hw", [(2048, 64), (8192, 128)])
def test_calibrated_budget_drops_nothing(n, hw):
    rng = np.random.default_rng(0)
    samples = [(random_scene(np.random.default_rng(i), n, sh_degree=1),
                orbit_cameras(3, hw, hw)) for i in range(2)]
    rc = calibrate_raster_config(samples, RasterizeConfig())
    for scene, cams in samples:
        _, _, stats = jax.jit(
            lambda s: render_images_stats(s, cams, jnp.zeros(3), rc))(scene)
        assert int(stats["num_dropped"]) == 0
    # and the budget is not absurdly oversized: <= 64x the true max hits
    st = measure_tile_stats(samples)
    assert rc.max_intersects <= max(64 * st["max_hits_per_view"], 2 ** 17)


def test_calibration_covers_bigger_splats():
    """Scenes with large splats (the scale-run failure mode: default tiers
    tuned on small-splat stats) must still calibrate to zero drops."""
    rng = np.random.default_rng(1)
    scene = random_scene(rng, 4096, sh_degree=1)
    scene = scene.replace(scales=scene.scales + 1.2)  # ~3.3x bigger splats
    cams = orbit_cameras(2, 128, 128)
    rc = calibrate_raster_config([(scene, cams)], RasterizeConfig())
    _, _, stats = jax.jit(
        lambda s: render_images_stats(s, cams, jnp.zeros(3), rc))(scene)
    assert int(stats["num_dropped"]) == 0
