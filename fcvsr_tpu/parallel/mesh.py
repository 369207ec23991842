"""Device mesh construction and sharded train/eval steps.

The reference scales with NCCL DDP (SURVEY.md §2.4); the TPU-native
equivalent is a 1-D ``data`` mesh over all chips with batch-sharded inputs and
replicated parameters — XLA inserts the gradient ``psum`` over ICI
automatically from the sharding annotations.  A ``data x model`` mesh hook is
provided for future tensor-parallel experiments, but FCVSR at 8.5M params is
firmly data-parallel territory.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_shardings"]


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over all local devices; default 1-D data-parallel."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def data_parallel_shardings(mesh: Mesh):
    """(batch_sharding, replicated_sharding) for a data mesh."""
    batch = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return batch, repl


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded along the leading axis.

    Multi-process: each host passes its *local* portion of the global batch
    (the per-host data sharding that replaces the reference's
    DistributedSampler) and a global array is assembled across processes.
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a host-local tree over the mesh (all hosts must hold the
    same values — seeds are derived identically per host)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, P())
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
