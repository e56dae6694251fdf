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

__all__ = ["conv3d_spatial_sharded", "conv3d_transpose_spatial_sharded",
           "encode_syms_spatial", "decode_y_spatial"]


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


def _conv_transpose_padding(k, s):
    """lax.conv_transpose's SAME padding pair for one dimension."""
    pad_len = k + s - 2
    pad_a = k - 1 if s > k - 1 else -(-pad_len // 2)
    return pad_a, pad_len - pad_a


def conv3d_transpose_spatial_sharded(mesh: Mesh, x, kernel, stride=1,
                                     axis="sp"):
    """SAME-padded transposed 3D conv, D axis sharded over ``axis``.

    Matches ``lax.conv_transpose(x, kernel, (s,s,s), padding='SAME')``
    (= flax ``nn.ConvTranspose``) on the unsharded array, asserted in
    tests. Implementation: each shard extends its local input with
    neighbour halo samples (input space), then runs the fractionally
    strided conv (``lhs_dilation``) with edge padding chosen so its
    output is exactly the shard's slice of the global output.

    :param x: [N, D, H, W, C]; D divisible by mesh[axis].
    :param kernel: [kd, kh, kw, Cin, Cout]; output depth = D·stride.
    """
    kd, kh, kw = kernel.shape[:3]
    s = stride
    n_dev = mesh.shape[axis]
    D = x.shape[1]
    assert D % n_dev == 0
    d_local = D // n_dev
    pad_a, _pad_b = _conv_transpose_padding(kd, s)
    # input-space halo widths: the first local output's window reaches
    # floor(pad_a/s) samples into the previous shard; the last one
    # reaches floor((k-2-pad_a)/s)+1 into the next (see derivation in
    # tests/test_spatial_sharding.py)
    halo_lo = pad_a // s
    halo_hi = max((kd - 2 - pad_a) // s + 1, 0)
    assert max(halo_lo, halo_hi) <= d_local, "halo exceeds shard depth"
    # dilated-space edge zeros completing the local windows
    extra_lo = pad_a - halo_lo * s
    extra_hi = ((d_local + halo_lo) * s - pad_a + kd - 2
                - (halo_lo + d_local + halo_hi - 1) * s)
    pad_h = _conv_transpose_padding(kh, s)
    pad_w = _conv_transpose_padding(kw, s)

    def local(x_l, k):
        padded = _halo_exchange(x_l, halo_lo, halo_hi, axis)
        dn = jax.lax.conv_dimension_numbers(
            padded.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            padded, k, (1, 1, 1),
            [(extra_lo, extra_hi), pad_h, pad_w],
            lhs_dilation=(s, s, s),
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


def decode_y_spatial(model, params, y_sym, mesh, axis="sp"):
    """``decode_y`` (v2) / ``decode`` (v1) on an oversized block, D-sharded.

    The synthesis counterpart of :func:`encode_syms_spatial`, completing
    the oversized-block round-trip: every transposed conv of the
    synthesis stack runs as a halo-exchanged sharded deconv, so the
    activations never materialize unsharded. Bit-exactness contract:
    encoder and decoder both run THIS executable on the same symbols, so
    their x_hat (and any threshold mask over it) agree bit-for-bit —
    the same decoder-canonical argument the block codec uses
    (``codec.py``); symbols/x_hat may differ from the *unsharded*
    executable only in conv accumulation order (rate/metric effect, no
    correctness effect).

    :param y_sym: [N, D/8, H/8, W/8, C] int32 symbols.
    :return: x_hat [N, D, H, W, 1] float32 in [0, 1].
    """
    p = params["params"]

    def deconv(h, lp, stride=1, act=True):
        h = conv3d_transpose_spatial_sharded(
            mesh, h, jnp.asarray(lp["kernel"]), stride=stride, axis=axis)
        if "bias" in lp:
            h = h + jnp.asarray(lp["bias"])
        return jax.nn.relu(h) if act else h

    if getattr(model, "hyper_analysis", None) is None:  # v1: + medians
        quantiles = p["entropy_bottleneck"]["quantiles"]
        y_hat = y_sym.astype(jnp.float32) + jnp.asarray(quantiles)[:, 1]
    else:  # v2 GaussianConditional: identity dequantization
        y_hat = y_sym.astype(jnp.float32)

    sy = p["synthesis_t"]
    sname = model.synthesis
    if sname == "SynthesisTransformV1":
        x = deconv(y_hat, sy["ConvTranspose_0"], 2)
        x = deconv(x, sy["ConvTranspose_1"], 2)
        x = deconv(x, sy["ConvTranspose_2"], 2)  # ReLU final (ref :51-59)
    elif sname in ("SynthesisTransformV2",
                   "SynthesisTransformProgressiveV2"):
        x = y_hat
        for b in range(3):
            bp = sy[f"SynthesisBlock_{b}"]
            h = deconv(x, bp["ConvTranspose_0"], 2)
            t = deconv(h, bp["ConvTranspose_1"])
            t = deconv(t, bp["ConvTranspose_2"])
            x = h + t
        x = deconv(x, sy["ConvTranspose_0"])  # 1-channel ReLU deconv
    else:  # pragma: no cover - configs only use the stacks above
        raise NotImplementedError(sname)
    return jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
