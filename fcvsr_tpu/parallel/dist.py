"""Multi-host init and distributed metric reduction.

TPU-native replacements for the reference NCCL plumbing (SURVEY.md §2.4):
``init_dist`` -> ``initialize_multihost`` (jax.distributed over the TPU
fabric); seed broadcast -> same seed derivation per host from the config;
``collect_results_cpu/gpu`` tmpdir-pickle / all_gather -> a ``shard_map``
``psum`` for on-device metric reduction and ``process_allgather`` for
host-side result collection — no tmpdir pickling.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["initialize_multihost", "psum_metrics", "gather_results"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Initialise jax.distributed when running multi-process; no-op for a
    single process.  Returns the process index."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def psum_metrics(metrics: Dict[str, jnp.ndarray], mesh: Mesh,
                 axis: str = "data") -> Dict[str, jnp.ndarray]:
    """Mean-reduce per-shard scalar metrics across the mesh with one psum
    (the DDP-era allreduce, but expressed in SPMD)."""
    names = sorted(metrics)
    vals = jnp.stack([jnp.asarray(metrics[k], jnp.float32) for k in names])

    def reduce_fn(v):
        return jax.lax.psum(v, axis) / mesh.shape[axis]

    reduced = jax.jit(
        jax.shard_map(reduce_fn, mesh=mesh, in_specs=P(), out_specs=P(),
                      check_vma=False)
    )(vals)
    return {k: reduced[i] for i, k in enumerate(names)}


def gather_results(local: np.ndarray):
    """Host-side allgather of per-process eval results (replaces
    collect_results_cpu's tmpdir pickling).  Single-process: identity."""
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(jnp.asarray(local)))
