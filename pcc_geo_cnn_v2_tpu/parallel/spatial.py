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

__all__ = ["conv3d_spatial_sharded", "encode_syms_spatial"]


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


def encode_syms_spatial(model, params, x, mesh, axis="sp"):
    """``encode_syms`` on an oversized block, depth-sharded over ``axis``.

    The sp analogue of context parallelism for this model family
    (SURVEY §5 "long-context"): a block too large for one device's memory
    is sharded along D and every conv of the analysis (+hyper-analysis)
    stack runs as a halo-exchanged sharded conv — activations never
    materialize unsharded. Supports the V1 and (Progressive)V2 analysis
    stacks with 'add' residuals (every named config; 'concat' stacks
    would need the same replay with a concat skip).

    :param x: [N, D, H, W, 1] occupancy; D divisible by mesh[axis]·16.
    :return: dict like ``model.encode_syms`` ({y_sym[, z_sym]} int32),
        matching the unsharded executable up to conv accumulation order.
    """
    import jax.numpy as jnp

    p = params["params"]

    def conv(h, lp, stride=1, act=True):
        h = conv3d_spatial_sharded(mesh, h, jnp.asarray(lp["kernel"]),
                                   stride=stride, axis=axis)
        if "bias" in lp:
            h = h + jnp.asarray(lp["bias"])
        return jax.nn.relu(h) if act else h

    an = p["analysis_t"]
    aname = model.analysis
    if aname == "AnalysisTransformV1":
        y = conv(x, an["Conv_0"], 2)
        y = conv(y, an["Conv_1"], 2)
        y = conv(y, an["Conv_2"], 2, act=False)
    elif aname in ("AnalysisTransformV2", "AnalysisTransformProgressiveV2"):
        y = x
        for b in range(3):
            bp = an[f"AnalysisBlock_{b}"]
            h = conv(y, bp["Conv_0"], 2)
            t = conv(h, bp["Conv_1"])
            t = conv(t, bp["Conv_2"])
            y = h + t
        y = conv(y, an["Conv_0"], act=False)
    else:  # pragma: no cover - configs only use the stacks above
        raise NotImplementedError(aname)
    y = y.astype(jnp.float32)

    quantiles = jnp.asarray(p["entropy_bottleneck"]["quantiles"])
    medians = quantiles[:, 1]
    if getattr(model, "hyper_analysis", None) is None:  # v1
        return {"y_sym": jnp.round(y - medians).astype(jnp.int32)}
    hp = p["hyper_analysis_t"]
    z = conv(y, hp["Conv_0"])
    z = conv(z, hp["Conv_1"], 2)
    z = conv(z, hp["Conv_2"], act=False).astype(jnp.float32)
    return {
        "y_sym": jnp.round(y).astype(jnp.int32),
        "z_sym": jnp.round(z - medians).astype(jnp.int32),
    }
