"""Core pytree types for the rasterizer and point backbone.

Design: every array is static-shape; dynamic scene size is carried by an
explicit validity ``mask``/``num_valid``. This is what lets one XLA compilation
serve every scene in a size bucket (reference instead used dynamic CUDA
launches: /root/reference/utils/gs_utils.py:82-109).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Camera:
    """A pinhole camera in the reference's convention.

    ``c2w`` is camera-to-world in OpenGL/Blender convention (x right, y up,
    z backward), exactly what the nerfstudio/COLMAP loaders of the reference
    produce (/root/reference/dataset/GS.py:285-287). The rasterizer flips to
    OpenCV internally (/root/reference/utils/gs_utils.py:32-42).

    ``width``/``height`` are static python ints (image shapes must be static
    under jit); intrinsics are traced scalars so cameras can be vmapped.
    """

    c2w: jnp.ndarray  # (3, 4) or (4, 4)
    fx: jnp.ndarray  # ()
    fy: jnp.ndarray  # ()
    cx: jnp.ndarray  # ()
    cy: jnp.ndarray  # ()
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)


@struct.dataclass
class GaussianScene:
    """Raw (pre-activation) 3D Gaussian parameters, padded to a static size.

    Attribute semantics follow nerfstudio/splatfacto checkpoints as consumed
    by the reference (/root/reference/utils/gs_utils.py:44-62):
      means          (N, 3)  raw positions (normalized to [0,1]^3 upstream)
      scales         (N, 3)  log-scales (exp() applied at render time)
      quats          (N, 4)  wxyz quaternions, re-normalized at render time
      opacities      (N, 1)  logits (sigmoid applied at render time)
      features_dc    (N, 3)  SH degree-0 coefficients
      features_rest  (N, S, 3)  higher SH coefficients, S=(deg+1)^2-1
      mask           (N,)    validity of each slot (False = padding)
    """

    means: jnp.ndarray
    scales: jnp.ndarray
    quats: jnp.ndarray
    opacities: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: Optional[jnp.ndarray] = None
    mask: Optional[jnp.ndarray] = None

    @property
    def num_points(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        if self.features_rest is None or self.features_rest.shape[1] == 0:
            return 0
        num_bases = 1 + self.features_rest.shape[1]
        deg = int(round(num_bases**0.5)) - 1
        assert (deg + 1) ** 2 == num_bases, num_bases
        return deg

    def valid_mask(self) -> jnp.ndarray:
        if self.mask is None:
            return jnp.ones((self.num_points,), dtype=bool)
        return self.mask


@struct.dataclass
class RasterizeConfig:
    """Static rasterization configuration.

    ``tile_size`` 16 matches gsplat BLOCK_WIDTH
    (/root/reference/utils/gs_utils.py:12); the Pallas kernel may internally
    group tiles to fit the 8x128 VPU lanes.

    ``max_intersects`` caps the (gaussian, tile) pair list; ``tiles_per_gauss``
    caps how many tiles a single Gaussian may cover (pairs beyond the cap are
    dropped, which only affects Gaussians larger than
    ``tiles_per_gauss`` tiles on screen — extremely rare for the object-scan
    scenes this model targets; overflow is reported by the binning op).
    """

    tile_size: int = struct.field(pytree_node=False, default=16)
    max_intersects: int = struct.field(pytree_node=False, default=2**18)
    tiles_per_gauss: int = struct.field(pytree_node=False, default=64)
    # Per-tile compositing caps for the chunked JAX path: at most
    # ``max_per_tile`` front-most entries are composited per tile, walked in
    # ``chunk_size``-entry steps (front-to-back, so overflow only drops
    # content already behind ~max_per_tile splats).
    max_per_tile: int = struct.field(pytree_node=False, default=4096)
    chunk_size: int = struct.field(pytree_node=False, default=64)
    clip_thresh: float = struct.field(pytree_node=False, default=0.01)
    alpha_threshold: float = struct.field(pytree_node=False, default=1.0 / 255.0)
    transmittance_eps: float = struct.field(pytree_node=False, default=1e-4)
    max_alpha: float = struct.field(pytree_node=False, default=0.999)
    # None = auto: Pallas kernels on TPU, chunked-JAX path elsewhere
    use_pallas: bool | None = struct.field(pytree_node=False, default=None)
    # binning tier caps (tier1_slots, tier2_k, tier2_slots, tier3_k);
    # None = auto-size from image area (binning.auto_tiers). Dropped entries
    # are counted in the render stats (render_images_stats) — check
    # num_dropped when rendering above ~1 MPx with unusual splat statistics.
    tiers: tuple | None = struct.field(pytree_node=False, default=None)

    def resolved_use_pallas(self) -> bool:
        if self.use_pallas is None:
            import jax
            return jax.default_backend() == "tpu"
        return self.use_pallas
