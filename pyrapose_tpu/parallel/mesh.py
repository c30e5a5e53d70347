"""Device mesh and sharding layout.

The reference has no working multi-device path (its multi_gpu_model branch is
dead code, bin/train.py:80-86, 355). The TPU design makes data parallelism
over ICI the first-class strategy (SURVEY.md section 2.3): a 1-D 'data' mesh
axis, batch-sharded inputs, replicated parameters, and gradient all-reduce
inserted automatically by XLA from the sharding annotations — no explicit
collectives in user code.

A second, optional 'spatial' axis is reserved for sharding the activation
grid of large imagery (the CNN analogue of sequence parallelism) — halo
exchange is handled by XLA's conv spatial partitioning when enabled.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def create_mesh(
    devices: list[Any] | None = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def create_mesh_2d(
    data: int,
    spatial: int,
    devices: list[Any] | None = None,
) -> Mesh:
    """2-D (data x spatial) mesh: batch DP on 'data', activation-grid
    sharding on 'spatial' (the CNN analogue of sequence/context parallelism,
    SURVEY §2.3). Image rows are split across the spatial axis; XLA's GSPMD
    partitioner inserts the halo exchanges every conv needs, so no manual
    collectives appear in user code."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < data * spatial:
        raise ValueError(
            f"need {data * spatial} devices for a {data}x{spatial} mesh, "
            f"have {len(devices)}"
        )
    arr = np.array(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (B, H, W, C) images: batch over 'data', rows over 'spatial'
    (when the mesh has a spatial axis)."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated across the mesh (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Place a pytree of host arrays batch-sharded onto the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
