"""Device mesh + sharding helpers.

The reference's distributed story is torch DDP over NCCL (one process per GPU,
gradient all-reduce in backward, SyncBatchNorm — ref train.py:176-179,
trainer_parallel.py:141-151). The TPU-native equivalent is single-program
jit over a `jax.sharding.Mesh`:
  * batch sharded over the "data" axis (DistributedSampler equivalent)
  * params/batch-stats replicated
  * gradient psum inserted automatically by XLA SPMD partitioning; over a
    single host the collective rides ICI
Multi-host would add `jax.distributed.initialize` + DCN, same program.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh, batch-dim sharded."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
