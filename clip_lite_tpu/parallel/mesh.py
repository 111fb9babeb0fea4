"""Device mesh construction and sharding utilities.

Replaces the reference's process-launch layer (utils/distributed.py:15-113,
one NCCL process per GPU spawned with mp.spawn) with single-controller
SPMD JAX: one process per host, a 1-D ``Mesh`` over all devices, batch
sharded on the data axis, parameters replicated.  Multi-host rendezvous is
``jax.distributed.initialize`` (DCN); in-program collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def donation_supported(mesh: Mesh) -> bool:
    """Whether jit buffer donation is safe on this backend.

    Broken in two environments we must run in:
      * CPU: donated-buffer reuse deadlocks XLA's in-process collectives;
      * axon-tunneled TPUs (which report platform=="tpu"!): execution of
        donated programs fails with INVALID_ARGUMENT.  The tunnel is only
        detectable via its environment variables.
    """
    import os

    if mesh.devices.flat[0].platform != "tpu":
        return False
    if os.environ.get("JAX_PLATFORMS") == "axon" or \
            os.environ.get("PALLAS_AXON_REMOTE_COMPILE"):
        return False
    return True


def create_mesh(
    num_devices: int = 0,
    data_axis: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 1-D data-parallel mesh.

    num_devices == 0 means "all local devices" (the common case).  The
    reference analog is world_size = machines x gpus_per_machine
    (utils/distributed.py:60).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=(data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Sharding for a batch pytree: leading dim split over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_stacked_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Device-put a stacked (K, B, ...) batch pytree: leading scan dim
    replicated, batch dim sharded."""
    sharding = NamedSharding(mesh, P(None, data_axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Device-put a host batch pytree with the leading dim sharded.

    This is the H2D boundary — the analog of the reference's per-rank
    ``batch.to(device)`` copies (utils/common.py:36), except a single
    controller places each device's shard directly.
    """
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
