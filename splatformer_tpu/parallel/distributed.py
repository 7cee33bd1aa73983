"""Multi-host utilities: initialization, barriers, cross-process metric
reduction — the pjit-native replacements for the reference's NCCL calls
(SURVEY.md §5.8: dist.init_process_group / dist.reduce / dist.barrier)."""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def maybe_initialize_distributed() -> None:
    """jax.distributed.initialize when launched under a multi-host runtime
    (env-configured); no-op single-host."""
    import os
    if jax.process_count() > 1:
        return
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def sync_processes(name: str = "barrier") -> None:
    """Barrier across processes (dist.barrier equivalent)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def reduce_metric_sums(sums: Dict[str, float], count: float
                       ) -> Dict[str, float]:
    """Sum per-process metric totals and counts across processes, return
    global per-item means (train.py:170-191 semantics: reduce sums + image
    counts, divide on the host)."""
    if jax.process_count() == 1:
        return {k: v / max(count, 1.0) for k, v in sums.items()}
    from jax.experimental import multihost_utils
    keys = sorted(sums.keys())
    local = np.asarray([sums[k] for k in keys] + [count], np.float64)
    total = multihost_utils.process_allgather(local).sum(axis=0)
    n = max(total[-1], 1.0)
    return {k: float(total[i] / n) for i, k in enumerate(keys)}
