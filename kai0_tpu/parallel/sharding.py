"""Device-mesh construction and FSDP parameter placement.

The distributed backend of the framework: a 2-axis ``(batch, fsdp)`` mesh over ICI,
with all cross-device collectives emitted by XLA GSPMD from jit in/out shardings and
in-graph activation constraints — no hand-written communication (parity: reference
``src/openpi/training/sharding.py``; the reference's "no multi-process" limitation is
lifted — the mesh spans ``jax.devices()``, which includes all processes after
``jax.distributed.initialize`` on multi-host pods, with a DCN axis possible via
``jax.make_mesh``'s device ordering).
"""

from __future__ import annotations

import contextlib
import logging

import jax
import numpy as np

BATCH_AXIS = "batch"
FSDP_AXIS = "fsdp"
# Data (batch dim) is sharded across both axes.
DATA_AXIS = (BATCH_AXIS, FSDP_AXIS)

logger = logging.getLogger("kai0_tpu")


class _MeshState:
    active_mesh: jax.sharding.Mesh | None = None


def make_mesh(num_fsdp_devices: int, *, devices=None) -> jax.sharding.Mesh:
    devices = jax.devices() if devices is None else devices
    if len(devices) % num_fsdp_devices != 0:
        raise ValueError(
            f"Number of devices {len(devices)} must be divisible by the number of FSDP devices "
            f"{num_fsdp_devices}."
        )
    mesh_shape = (len(devices) // num_fsdp_devices, num_fsdp_devices)
    return jax.sharding.Mesh(np.asarray(devices).reshape(mesh_shape), (BATCH_AXIS, FSDP_AXIS))


@contextlib.contextmanager
def set_mesh(mesh: jax.sharding.Mesh):
    """Install the ambient mesh used by ``activation_sharding_constraint``.

    The constraint is called deep inside model code; threading the mesh through every
    call would pollute the functional API, so (like the reference, sharding.py:26-37)
    the active mesh is a context-managed module global read at trace time.
    """
    if _MeshState.active_mesh is not None:
        raise ValueError("Cannot nest set_mesh context managers.")
    _MeshState.active_mesh = mesh
    try:
        yield
    finally:
        _MeshState.active_mesh = None


def active_mesh() -> jax.sharding.Mesh | None:
    """The ambient mesh installed by ``set_mesh`` (None outside a mesh context)."""
    return _MeshState.active_mesh


def activation_sharding_constraint(pytree):
    """Pin activations' batch dim to the data axes. No-op when no mesh is active."""
    if _MeshState.active_mesh is None:
        return pytree
    return jax.lax.with_sharding_constraint(
        pytree,
        jax.sharding.NamedSharding(_MeshState.active_mesh, jax.sharding.PartitionSpec(DATA_AXIS)),
    )


def data_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(DATA_AXIS))


def replicated(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())


def fsdp_sharding(
    pytree,
    mesh: jax.sharding.Mesh,
    *,
    min_size_mbytes: int = 4,
    log: bool = False,
):
    """FSDP placement policy: shard each large array's largest divisible axis.

    Replicates (a) when fsdp dim is 1, (b) scalars/vectors, (c) arrays under
    ``min_size_mbytes``; otherwise shards the largest axis divisible by the fsdp mesh
    dim. Parity: reference sharding.py:48-102.
    """
    min_size_bytes = min_size_mbytes * 2**20

    def _shard_arr(kp, array):
        if mesh.shape[FSDP_AXIS] == 1:
            return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        if not hasattr(array, "shape") or len(array.shape) < 2:
            return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        if (arr_size := np.prod(array.shape) * np.dtype(array.dtype).itemsize) < min_size_bytes:
            return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

        axes = np.argsort(array.shape)[::-1]
        spec = [None] * len(axes)
        for i in axes:
            if array.shape[i] % mesh.shape[FSDP_AXIS] == 0:
                if log:
                    logger.info(
                        f"Sharding {jax.tree_util.keystr(kp)} of shape {array.shape} "
                        f"({arr_size / 2**20:.2f} MiB) along axis {i}"
                    )
                spec[i] = FSDP_AXIS
                return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(*spec))

        if log:
            logger.warning(
                f"Could not find a valid sharding for {jax.tree_util.keystr(kp)} of shape "
                f"{array.shape} with mesh of shape {mesh.shape}"
            )
        return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    return jax.tree_util.tree_map_with_path(_shard_arr, pytree)
