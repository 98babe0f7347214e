"""Device mesh + sharding helpers (single- and multi-host).

The reference's distributed story is torch DDP over NCCL (one process per GPU,
gradient all-reduce in backward, SyncBatchNorm — ref train.py:176-179,
trainer_parallel.py:141-151). The TPU-native equivalent is single-program
jit over a `jax.sharding.Mesh`:
  * batch sharded over the "data" axis (DistributedSampler equivalent)
  * params/batch-stats replicated
  * gradient psum inserted automatically by XLA SPMD partitioning; over a
    single host the collective rides ICI

Multi-host (v5e pods past one host / DCN): `initialize_multihost()` wires
`jax.distributed.initialize`, `make_mesh` then spans the GLOBAL device set,
and `shard_batch` assembles per-process local batches into one global
batch-sharded array (`jax.make_array_from_process_local_data`) — the same
train step runs unchanged, with gradient all-reduce riding ICI inside a host
and DCN across hosts. Exercised for real by tests/test_multihost.py: two
coordinated CPU processes x 4 virtual devices = one 8-device global mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join this process to a multi-host run (ref counterpart:
    torch.distributed.init_process_group("nccl"), train.py:179).

    On TPU pod slices all three arguments are auto-detected from the
    environment — call with no arguments. Off-pod (or in the multi-process
    CPU simulation the tests use) pass them explicitly. Idempotent."""
    kw = {}
    if coordinator_address is not None:
        kw = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:
        # idempotency: jax 0.9 raises "distributed.initialize should only
        # be called once" on a repeat call; older versions said "already
        # initialized"
        msg = str(e)
        if "only be called once" not in msg and "already initialized" not in msg:
            raise


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data mesh over the GLOBAL device set (all processes' devices
    under multi-host)."""
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
    """Place a host batch pytree onto the mesh, batch-dim sharded.

    Single-process: device_put with the batch sharding. Multi-host: each
    process holds only ITS batch slice (a per-host loader shard, the
    DistributedSampler equivalent); the local arrays are stitched into one
    global array whose leading dim is the global batch — staying on device
    (device_put slices to the local devices +
    make_array_from_single_device_arrays), because the local batch usually
    comes out of a jitted pipeline and a np.asarray round trip would pull
    the whole 480p batch D2H and back every step."""
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    # mesh device order groups processes contiguously (jax.devices() orders
    # by process), so this process's k-th local slice belongs on its k-th
    # mesh-local device
    local = [d for d in mesh.devices.flat
             if d.process_index == jax.process_index()]
    n_local = len(local)
    n_total = mesh.devices.size

    def place(x):
        x = jnp.asarray(x)
        b = x.shape[0]
        if b % n_local:
            raise ValueError(
                f"local batch {b} not divisible by local device count {n_local}"
            )
        per = b // n_local
        global_shape = (per * n_total,) + x.shape[1:]
        shards = [
            jax.device_put(x[i * per:(i + 1) * per], d)
            for i, d in enumerate(local)
        ]
        return jax.make_array_from_single_device_arrays(global_shape, sh, shards)

    return jax.tree_util.tree_map(place, batch)
