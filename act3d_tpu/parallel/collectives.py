"""Cross-host metric aggregation.

The reference gathers per-rank eval-metric dicts by pickling them through a
padded NCCL all_gather (reference: engine.py:247-307).  Under JAX SPMD
there is one program: in-graph reductions happen automatically via the
sharded mean; what remains is multi-process (multi-host) aggregation of
host-side Python metric dicts, provided here over
``jax.experimental.multihost_utils``.

On a single process (this repo's test/bench environment) these are
identity operations — exactly like the reference's world_size == 1 path
(engine.py:256-258).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np

__all__ = ["all_gather_metrics", "synchronize_between_processes"]


def all_gather_metrics(metrics: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Gather a host-side metric dict from every process."""
    if jax.process_count() == 1:
        return [metrics]
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    stacked = {
        k: multihost_utils.process_allgather(np.asarray(metrics[k]))
        for k in keys
    }
    return [
        {k: stacked[k][p] for k in keys} for p in range(jax.process_count())
    ]


def synchronize_between_processes(
    values: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Concatenate per-process metric arrays (reference engine.py:232-244)."""
    gathered = all_gather_metrics(values)
    return {
        k: np.concatenate([np.atleast_1d(g[k]) for g in gathered])
        for k in gathered[0]
    }
