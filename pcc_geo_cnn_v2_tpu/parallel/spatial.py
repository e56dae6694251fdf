"""Spatial (sp) sharding: 3D convolution over a depth-sharded voxel grid.

The reference never needs model/sequence parallelism (SURVEY §2.3); the
analogous scale axis here is *spatial*. Blocks ≤64³ fit one core easily,
but higher-resolution blocks (128³/256³, or whole low-level octree cells)
exceed a single core's VMEM budget for fused pipelines — the sp axis
shards the depth (D) dimension of NDHWC grids across devices, and
convolutions exchange halo slabs with neighbors over ICI
(``jax.lax.ppermute`` inside ``shard_map``), the conv analogue of
context-parallel ring attention.

This module provides the primitive (halo-exchanged conv) and a sharded
stride-2 conv; both are verified bit-equal to the unsharded op on the CPU
mesh in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

__all__ = ["conv3d_spatial_sharded"]


def _halo_exchange(x, halo_lo, halo_hi, axis_name):
    """Append neighbors' boundary slabs along the local D axis.

    :param x: local [N, D_local, H, W, C] shard.
    :return: [N, halo_lo + D_local + halo_hi, H, W, C]
    """
    n_dev = jax.lax.axis_size(axis_name)
    parts = []
    if halo_lo:
        # receive the last halo_lo planes of the previous shard
        src = x[:, -halo_lo:]
        prev = jax.lax.ppermute(
            src, axis_name,
            [(i, (i + 1) % n_dev) for i in range(n_dev)],
        )
        idx = jax.lax.axis_index(axis_name)
        prev = jnp.where(idx == 0, jnp.zeros_like(prev), prev)
        parts.append(prev)
    parts.append(x)
    if halo_hi:
        src = x[:, :halo_hi]
        nxt = jax.lax.ppermute(
            src, axis_name,
            [(i, (i - 1) % n_dev) for i in range(n_dev)],
        )
        idx = jax.lax.axis_index(axis_name)
        nxt = jnp.where(idx == n_dev - 1, jnp.zeros_like(nxt), nxt)
        parts.append(nxt)
    return jnp.concatenate(parts, axis=1)


def _same_pads(size, k, s):
    """XLA SAME padding split (lo, hi) for one dimension."""
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def conv3d_spatial_sharded(mesh: Mesh, x, kernel, stride=1, axis="sp"):
    """SAME-padded 3D conv with the D axis sharded over ``axis``.

    Bit-equal to ``lax.conv_general_dilated(x, kernel, strides,
    padding='SAME')`` on the unsharded array (asserted in tests). Kernel is
    replicated; only halo slabs (SAME-pad widths) cross ICI per conv.

    :param x: [N, D, H, W, C]; D divisible by mesh[axis]·stride.
    :param kernel: [kd, kh, kw, Cin, Cout].
    """
    kd, kh, kw = kernel.shape[:3]
    n_dev = mesh.shape[axis]
    D, H, W = x.shape[1:4]
    assert D % (n_dev * stride) == 0
    halo_lo, halo_hi = _same_pads(D, kd, stride)
    assert max(halo_lo, halo_hi) <= D // n_dev, "halo exceeds shard depth"
    pad_h = _same_pads(H, kh, stride)
    pad_w = _same_pads(W, kw, stride)

    def local(x_l, k):
        padded = _halo_exchange(x_l, halo_lo, halo_hi, axis)
        dn = jax.lax.conv_dimension_numbers(
            padded.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
        # D fully covered by halos (VALID); H/W get their SAME pads
        return jax.lax.conv_general_dilated(
            padded, k, (stride, stride, stride),
            [(0, 0), pad_h, pad_w],
            dimension_numbers=dn,
        )

    spec_x = P(None, axis, None, None, None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec_x, P()),
        out_specs=spec_x,
    )
    return fn(x, kernel)
