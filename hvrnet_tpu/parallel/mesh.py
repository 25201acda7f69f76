"""Device mesh + sharding helpers.

Replaces the reference's NCCL process-group machinery
(`/root/reference/mmdet/apis/env.py:13-51`,
`mmdet/core/utils/dist_utils.py:9-56` — coalesced-bucket gradient allreduce,
`MMDistributedDataParallel`) with the JAX SPMD model: one mesh, sharding
annotations, XLA-inserted collectives over ICI.  Gradient averaging is the
`jax.lax.pmean`/sharding-constraint that pjit lowers to a psum — there is no
explicit bucketing or process-group code to maintain.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """1-D data mesh by default — HVRNet training is pure data parallelism
    (SURVEY §2.4): the model (~70M params) is single-chip resident and the
    batch axis (videos / triplet groups) shards across chips."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (leading axis = per-device samples) on the mesh."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up (replaces init_dist pytorch/slurm launchers).

    Single-binary: `jax.distributed.initialize()` discovers peers from env
    (or explicit args).  On a single host this is a no-op.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
