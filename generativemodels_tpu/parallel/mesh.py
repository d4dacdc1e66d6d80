"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's DDP/NCCL setup
(tutorials/generative/distributed_training/ddpm_training_ddp.py:125,199 and
model-zoo train_multigpu.yaml:3-29): instead of one process per GPU with
gradient all-reduce, a `jax.sharding.Mesh` over ICI/DCN with NamedSharding
annotations lets XLA insert the collectives. The standard layout is a
("data", "space") mesh — batch parallel over "data", and (beyond reference
parity) spatial sharding of 3D volumes over "space", where GSPMD emits the
halo exchanges for convolutions automatically.
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def create_mesh(
    axis_shapes: Sequence[int] | dict[str, int] | None = None,
    axis_names: Sequence[str] = ("data", "space"),
    devices=None,
) -> Mesh:
    """Create a Mesh over the available devices.

    Args:
        axis_shapes: sizes per axis (dict name->size or sequence). Defaults
            to all devices on a 1D "data" axis.
        axis_names: names when axis_shapes is a sequence.
        devices: devices to use (default jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_shapes is None:
        return Mesh(np.array(devices), ("data",))
    if isinstance(axis_shapes, dict):
        axis_names = tuple(axis_shapes.keys())
        shape = tuple(axis_shapes.values())
    else:
        shape = tuple(axis_shapes)
        axis_names = tuple(axis_names)[: len(shape)]
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {int(np.prod(shape))} devices, have {len(devices)}"
        )
    return Mesh(np.array(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, ndim: int, data_axis: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; replicate the rest."""
    return NamedSharding(mesh, PartitionSpec(data_axis, *([None] * (ndim - 1))))


def spatial_sharding(
    mesh: Mesh,
    ndim: int,
    data_axis: str = "data",
    space_axis: str = "space",
    spatial_axis_index: int = 2,
) -> NamedSharding:
    """Shard batch over `data` and one spatial axis over `space`.

    For (B, C, H, W, D) volumes the default shards H — GSPMD inserts halo
    exchanges for convolutions across the cut.
    """
    spec = [None] * ndim
    spec[0] = data_axis
    spec[spatial_axis_index] = space_axis
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, scalars)."""
    return NamedSharding(mesh, PartitionSpec())


def shard_params(params, mesh: Mesh):
    """Replicate a params pytree across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda p: jax.device_put(p, sharding), params)


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Shard a batch pytree's leading axis over the data axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim, data_axis)), batch
    )
