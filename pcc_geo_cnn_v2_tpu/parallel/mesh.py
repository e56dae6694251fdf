"""Device mesh and sharding helpers.

The reference is single-GPU single-process (SURVEY §2.3); the only
parallelism is a host subprocess pool. Here, parallel scale is first-class:
octree blocks are embarrassingly parallel, so the primary axis is **dp**
(batch/blocks sharded over ICI); **sp** (spatial) is reserved for sharding
the voxel grid of oversized blocks with halo exchange.

All helpers work identically on real TPU slices and on the virtual CPU
mesh used in tests (``XLA_FLAGS=--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "pad_to_multiple"]


def make_mesh(n_devices=None, axes=("dp",), shape=None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    :param axes: axis names; default a 1-D data-parallel mesh.
    :param shape: explicit per-axis sizes (defaults to all devices on axes[0]).
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(devices)} device(s) "
                f"available ({jax.default_backend()}); a truncated mesh "
                "would make sharding checks vacuous"
            )
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, axis="dp") -> NamedSharding:
    """Shard the leading (block/batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr: np.ndarray, multiple: int, axis=0):
    """Pad ``arr`` along ``axis`` to a multiple (shardable batch)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad), n


def shard_batch(mesh: Mesh, arr, axis="dp"):
    """Pad the leading dim to the mesh size and device_put with sharding."""
    arr = np.asarray(arr)
    padded, n = pad_to_multiple(arr, mesh.shape[axis], axis=0)
    return jax.device_put(padded, batch_sharding(mesh, axis)), n
