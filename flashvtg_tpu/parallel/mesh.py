"""Device-mesh / sharding helpers (jax.sharding over ICI).

The reference is strictly single-GPU (SURVEY.md §2.4: no DDP/FSDP/TP/PP
anywhere). The TPU-native scaling story is XLA SPMD: a 1-D "data" mesh over
all chips, batches sharded along axis 0, parameters replicated; XLA inserts
the psum for the gradient all-reduce. The mesh also carries a (currently
size-1) "model" axis so tensor-parallel shardings stay expressible without
API changes.

Host-side metrics always gather to process 0.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """A (data, model) mesh; defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def data_axis_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict with the leading axis split over `data`."""
    sh = data_axis_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def put_replicated_global(value, sharding):
    """Replicated placement that also works when `sharding` spans processes.

    jax.device_put only targets addressable devices; on a multi-controller
    mesh every host holds the same full copy (callers guarantee value
    equality across hosts — same seed / same dataset), so the global array
    is assembled from each process's local copy instead."""
    if jax.process_count() > 1 and len(sharding.device_set) > len(
        sharding.addressable_devices
    ):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(value)
        )
    return jax.device_put(value, sharding)


def replicate_params(mesh: Mesh, params):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: put_replicated_global(x, rep), params)


def shard_rows_for_host(rows, process_index: Optional[int] = None,
                        process_count: Optional[int] = None):
    """Partition dataset rows across hosts (DCN level).

    Each host feeds only its slice to its local devices; the mesh's data
    axis then splits each host batch across that host's chips over ICI.
    Deterministic strided split so every host sees a class-balanced stream.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return rows[pi::pc]
