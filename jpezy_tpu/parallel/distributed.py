"""Multi-host initialization and host-sharded batch placement.

On a pod slice, each host process calls initialize() once, builds the global
('data', 'tile') mesh over all devices, and feeds its local image shard with
make_global_batch().  Collectives (the DC-carry ppermute) ride ICI within
the slice; the 'data' axis carries no collectives so host-boundary (DCN)
traffic is zero during encode.

This module is exercised in CI only up to mesh construction (single
process); the multi-host path follows the standard jax.distributed contract.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var fallbacks (no-op if single)."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(data: int | None = None, tile: int | None = None) -> Mesh:
    """Global mesh over all devices of all processes.

    Default: 'data' spans hosts (process-major device order), 'tile' spans
    the devices within a host, so the carry ppermute stays on ICI.
    """
    devices = np.asarray(jax.devices())
    n = len(devices)
    if data is None:
        data = max(1, jax.process_count())
    if tile is None:
        tile = n // data
    return Mesh(devices[: data * tile].reshape(data, tile), ("data", "tile"))


def make_global_batch(mesh: Mesh, local_batch: np.ndarray) -> jax.Array:
    """Assemble a process-local [N_loc, H, W] shard into the global array.

    Uses jax.make_array_from_process_local_data so no image bytes cross DCN.
    """
    sharding = NamedSharding(mesh, P("data", "tile", None))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    global_shape = (
        local_batch.shape[0] * jax.process_count(),
        *local_batch.shape[1:],
    )
    return jax.make_array_from_process_local_data(
        sharding, local_batch, global_shape
    )
