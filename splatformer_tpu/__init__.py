"""splatformer_tpu — a TPU-native (JAX/XLA/Pallas) 3D Gaussian Splatting refinement
framework with the capabilities of SplatFormer (hchautran/SplatFormer).

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):

  ops/        differentiable Gaussian rasterizer (projection, tile binning,
              alpha compositing; pure-JAX oracle + Pallas kernels),
              space-filling-curve serialization, segment ops, sparse conv,
              patch attention, token merging, point-cloud downsampling.
  models/     PTv3 backbone, SpUNet backbone, FeaturePredictor, LPIPS (flax).
  data/       COLMAP parsing, nerfstudio checkpoint loading, scene dataset.
  training/   losses, metrics, optimizers, jitted train/eval loops.
  parallel/   device mesh + sharding helpers (DP over scenes, ICI collectives).
  utils/      viewer export, FLOPs via XLA cost analysis, logging.

The compute path is pure JAX (jit/pjit/Pallas); everything is static-shape with
explicit validity masks so a scene of any Gaussian count compiles once per
bucket size.
"""

__version__ = "0.1.0"
