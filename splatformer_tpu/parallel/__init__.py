"""Parallelism: device meshes, multi-host utilities, and the gauss-axis
sharded renderer (see SURVEY.md §2.5 / §5.8 for the reference's DP-only
baseline these extend)."""
from splatformer_tpu.parallel.distributed import (
    maybe_initialize_distributed, reduce_metric_sums, sync_processes)
from splatformer_tpu.parallel.gauss_shard import (
    GAUSS_AXIS, render_images_gauss_sharded)
from splatformer_tpu.parallel.mesh import (
    DATA_AXIS, data_sharding, make_mesh, replicated, shard_batch)

__all__ = [
    "DATA_AXIS", "GAUSS_AXIS", "data_sharding", "make_mesh",
    "maybe_initialize_distributed", "reduce_metric_sums", "replicated",
    "render_images_gauss_sharded", "shard_batch", "sync_processes",
]
