"""Device mesh + sharding helpers.

The reference's parallelism is scene-level DDP over NCCL (SURVEY.md §2.5,
§5.8). TPU-native equivalent: one `jax.sharding.Mesh` with a `data` axis;
scenes shard over it, parameters replicate, gradient reduction is a `pmean`
inside the jitted step (XLA overlaps it with backward over ICI).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None,
              n_devices: Optional[int] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_to_mesh(tree, mesh: Mesh):
    """Re-place a (possibly differently-committed) pytree replicated onto
    `mesh` — needed when eval runs on a 1-device mesh with params committed
    to the training mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def shard_batch(mesh: Mesh, batch):
    """Place a batch pytree (leading axis = device count) on the data axis."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
