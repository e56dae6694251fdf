"""Fused 3D-conv residual tails as a Pallas TPU kernel (lane-folded).

The north-star item (BASELINE.json: "model_transforms ... become fused
Pallas 3D-conv kernels"): the (Progressive)V2 transform stacks spend
~85% of their FLOPs in the stride-1 k3 residual tails of each
Analysis/Synthesis block (two convs + ReLUs + skip add — reference
``/root/reference/src/model_transforms.py:22-38,62-81``). XLA runs each
conv as a separate HBM-to-HBM op and, worse, the small channel counts
(16/32/64) fill only C/128 of the MXU lane axis in the natural NDHWC
lowering.

This kernel removes both limits:

- **Lane folding**: ``[D, H, W, C] → [D·H·W/G, G·C]`` with ``G = 128/C``
  is a pure row-major reshape (G consecutive W-voxels share a 128-lane
  row), so volumes enter and leave the kernel with zero relayout cost
  and every VMEM row is fully packed.
- **Block-diagonal taps**: a k3 conv is 27 shifted matmuls; in folded
  layout each tap is ONE dense ``[R,128]×[128,128]`` matmul against
  ``kron(I_G, W_tap)`` — the MXU runs at full lane utilization (the
  8/G redundancy is free: the systolic array multiplies the zero
  blocks anyway, and G·C = 128 beats a 12.5%-occupied 16-lane matmul).
- **Tap shifts as rolls**: ±1 voxel along W is a ±C lane roll with a
  cross-group borrow row, ±1 along H/D are sublane rolls by W/G and
  H·W/G rows; border zeroing is an iota mask. No im2col buffer exists.
- **Fusion**: conv₁ → bias → ReLU → conv₂ → bias → ReLU → (+x) all
  happen on one VMEM-resident block; the intermediate activation never
  touches HBM.

The same kernel serves SynthesisBlock tails unchanged: a stride-1 SAME
ConvTranspose is numerically identical to the plain conv
(lhs_dilation = 1), verified against flax in the parity tests.

Grid is one program per batch element; all stage shapes of the c3p/c3
families (32³×16, 16³×32, 8³×64 — and their V2 counterparts) fit VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_residual_tail",
    "fused_block_stack_apply",
    "pack_tail_weights",
    "fold_shape",
]

LANES = 128


def _roll(x, s, axis):
    """Static rotate that Mosaic can lower for every dtype.

    ``pltpu.roll`` lowers to ``tpu.dynamic_rotate``, which real Mosaic
    only implements for 32-bit element types ("Rotate with non-32-bit
    data" on bf16, observed on v5e). For narrower dtypes rebuild the
    rotation from two static slices + one concat — static offsets, so
    Mosaic lowers it as shifted copies.
    """
    n = x.shape[axis]
    s = s % n
    if s == 0:
        return x
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, s, axis)
    if axis == 0:
        return jnp.concatenate([x[n - s:, :], x[: n - s, :]], 0)
    return jnp.concatenate([x[:, n - s:], x[:, : n - s]], 1)


def fold_shape(spatial: int, channels: int):
    """(rows R, group G) of the folded [R, 128] layout for a cube."""
    assert LANES % channels == 0, channels
    g = LANES // channels
    vox = spatial ** 3
    assert spatial % g == 0, (spatial, g)
    return vox // g, g


def _block_diag(w_tap: np.ndarray | jax.Array, g: int) -> jax.Array:
    """[cin, cout] → [g·cin, g·cout] = kron(I_g, W)."""
    eye = jnp.eye(g, dtype=w_tap.dtype)
    return jnp.kron(eye, w_tap)


def pack_tail_weights(kernel, g: int, *,
                      dtype=jnp.bfloat16) -> jax.Array:
    """Flax conv kernel [3,3,3,cin,cout] → [27, 128, 128] block-diag taps.

    Tap order is (dz, dy, dx) row-major over {-1,0,1}³ matching the
    in-kernel shift loop. Serves ConvTranspose tails unchanged: a
    stride-1 SAME ConvTranspose is numerically identical to the plain
    conv (lhs_dilation=1 — verified against flax in
    tests/test_pallas_conv.py).
    """
    k = jnp.asarray(kernel)
    assert k.shape[:3] == (3, 3, 3), k.shape
    taps = [_block_diag(k[dz, dy, dx].astype(dtype), g)
            for dz in range(3) for dy in range(3) for dx in range(3)]
    return jnp.stack(taps)


def _fold_bias(b, g: int, dtype=jnp.float32) -> jax.Array:
    return jnp.tile(jnp.asarray(b, dtype), (g,))[None, :]


def _voxel_coords(rows: int, h: int, w: int, g: int, c: int):
    """Per-element voxel coords of the folded layout, [rows, LANES] each.

    Row r holds w-group ``wq = r % (w/g)`` of ``hh = (r // (w/g)) % h``,
    ``dd = r // (h·w/g)``; lane l holds group ``gg = l // c`` so the real
    w coordinate is ``wq·g + gg``.
    """
    wq = w // g
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    ww = (r % wq) * g + l // c
    hh = (r // wq) % h
    dd = r // (h * wq)
    return ww, hh, dd


def _make_tap_fn(d: int, h: int, w: int, g: int, c: int):
    """Returns shift(x, dz, dy, dx) → x shifted by the tap, zero-filled.

    Shift semantics: out[v] = x[v + (dz, dy, dx)] (correlation taps), so
    ``acc += shift(x, dz, dy, dx) @ W[dz+1, dy+1, dx+1]`` reproduces a
    SAME k3 s1 conv.
    """
    wq = w // g  # rows per h step; h·wq rows per d step
    coords_cache = {}

    def shift(x, dz, dy, dx):
        # hoisted across the 27 taps: the coord iotas are shape-only
        if x.shape[0] not in coords_cache:
            coords_cache[x.shape[0]] = _voxel_coords(x.shape[0], h, w, g, c)
        ww, hh, dd = coords_cache[x.shape[0]]
        # --- dx: lane roll by c, cross-group borrow from adjacent row
        if dx != 0:
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            rolled = _roll(x, (-dx * c) % LANES, 1)
            # element needing the neighbouring row's group: lane group
            # overflowed. dx=+1: last group reads next row's group 0;
            # dx=-1: group 0 reads previous row's last group.
            if dx > 0:
                borrow = _roll(rolled, x.shape[0] - 1, 0)  # row r+1
                x = jnp.where(lane >= LANES - c, borrow, rolled)
            else:
                borrow = _roll(rolled, 1, 0)  # row r-1
                x = jnp.where(lane < c, borrow, rolled)
            x = jnp.where((ww + dx >= 0) & (ww + dx < w), x, 0)
        # --- dy/dz: pure row shifts
        roff = dy * wq + dz * h * wq
        if roff != 0:
            x = _roll(x, (-roff) % x.shape[0], 0)
            mask = ((hh + dy >= 0) & (hh + dy < h)
                    & (dd + dz >= 0) & (dd + dz < d))
            x = jnp.where(mask, x, 0)
        return x

    return shift


def _tail_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, t_ref,
                 *, d, h, w, g, c, residual):
    shift = _make_tap_fn(d, h, w, g, c)
    x = x_ref[0]

    def conv(src, w_ref, b_ref):
        acc = jnp.zeros(src.shape, jnp.float32)
        t = 0
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    acc = acc + jnp.dot(shift(src, dz, dy, dx), w_ref[t],
                                        preferred_element_type=jnp.float32)
                    t += 1
        return jnp.maximum(acc + b_ref[...], 0.0)

    t_ref[...] = conv(x, w1_ref, b1_ref).astype(t_ref.dtype)
    y = conv(t_ref[...], w2_ref, b2_ref)
    if residual:
        y = y + x.astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def fused_residual_tail(x, w1, b1, w2, b2, *, spatial: int, channels: int,
                        residual: bool = True,
                        interpret: bool = False, dtype=jnp.bfloat16):
    """relu(conv2(relu(conv1(x)))) [+ x] on a cube, fully fused in VMEM.

    x: [N, D, H, W, C] (D=H=W=spatial, C=channels) or pre-folded
    [N, R, 128]. w1/w2: flax kernels [3,3,3,C,C]; b1/b2: [C]. Serves
    both Analysis and Synthesis block tails (stride-1 SAME ConvTranspose
    ≡ conv). Returns the same layout it was given.
    """
    rows, g = fold_shape(spatial, channels)
    folded_in = x.ndim == 3
    n = x.shape[0]
    xf = x.reshape(n, rows, LANES).astype(dtype)

    w1p = pack_tail_weights(w1, g, dtype=dtype)
    w2p = pack_tail_weights(w2, g, dtype=dtype)
    b1p = _fold_bias(b1, g)
    b2p = _fold_bias(b2, g)

    kern = functools.partial(_tail_kernel, d=spatial, h=spatial, w=spatial,
                             g=g, c=channels, residual=residual)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, LANES, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, LANES, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, rows, LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), dtype),  # intermediate activation
        ],
        # the unrolled 27-tap conv body's temporaries (shift masks, coord
        # iotas, f32 accumulators) exceed Mosaic's 16 MB default scoped-
        # vmem budget at 32³ volumes; v5e VMEM is 128 MB — raise the cap
        # (same fix as the slab variant)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xf, w1p, b1p, w2p, b2p)
    if folded_in:
        return out
    return out.reshape(x.shape[0], spatial, spatial, spatial, channels)


# ---------------------------------------------------------------------------
# Full-stack appliers: run a (Progressive)V2 transform stack from its flax
# param tree with XLA strided convs + fused Pallas tails. Consumes the
# exact checkpoint layout (AnalysisBlock_i/Conv_j, SynthesisBlock_i/
# ConvTranspose_j) so any trained model can switch backends.
# ---------------------------------------------------------------------------

_DN = ("NDHWC", "DHWIO", "NDHWC")

# Above this folded-row count the three VMEM-resident buffers of the tail
# kernel (~4 x rows x 128 x 2B) no longer fit comfortably in ~16 MB VMEM;
# such stages (the 64³x16 synthesis tail) fall back to XLA convs.
MAX_FUSED_ROWS = 8192


def _xla_conv(x, kern, bias, strides=1, dtype=jnp.bfloat16):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(kern, dtype), (strides,) * 3, "SAME",
        dimension_numbers=_DN)
    if bias is not None:
        y = y + jnp.asarray(bias, dtype)
    return y


def _xla_deconv(x, kern, bias, strides=1, dtype=jnp.bfloat16):
    y = jax.lax.conv_transpose(
        x.astype(dtype), jnp.asarray(kern, dtype), (strides,) * 3, "SAME",
        dimension_numbers=_DN)
    if bias is not None:
        y = y + jnp.asarray(bias, dtype)
    return y


def _tail(x, p1, p2, spatial, channels, dtype, interpret):
    rows, _ = fold_shape(spatial, channels)
    if rows <= MAX_FUSED_ROWS:
        return fused_residual_tail(
            x, p1["kernel"], p1["bias"], p2["kernel"], p2["bias"],
            spatial=spatial, channels=channels, interpret=interpret,
            dtype=dtype)
    # VMEM-oversized stage (the 64³×16 synthesis tail): slab-DMA variant
    return fused_residual_tail_slab(
        x, p1["kernel"], p1["bias"], p2["kernel"], p2["bias"],
        spatial=spatial, channels=channels, interpret=interpret,
        dtype=dtype)


def fused_block_stack_apply(params, x, *, filters, widths, synthesis,
                            dtype=jnp.bfloat16, interpret=None):
    """Apply a _BlockStack (V2/ProgressiveV2 family) from its param tree.

    ``params``: the transform's own subtree (e.g.
    ``variables["params"]["analysis_t"]``). Numerically equivalent to the
    flax module (same strided convs via XLA, tails via the fused Pallas
    kernel); 'add' residual mode only.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spatial = x.shape[1]
    if synthesis:
        for i, frac in enumerate(widths):
            c = int(filters * frac)
            p = params[f"SynthesisBlock_{i}"]
            h = jax.nn.relu(_xla_deconv(x, p["ConvTranspose_0"]["kernel"],
                                        p["ConvTranspose_0"]["bias"], 2,
                                        dtype=dtype))
            spatial *= 2
            x = _tail(h, p["ConvTranspose_1"], p["ConvTranspose_2"],
                      spatial, c, dtype, interpret)
        p = params["ConvTranspose_0"]
        return jax.nn.relu(_xla_deconv(x, p["kernel"], p["bias"],
                                       dtype=dtype))
    for i, frac in enumerate(widths):
        c = int(filters * frac)
        p = params[f"AnalysisBlock_{i}"]
        h = jax.nn.relu(_xla_conv(x, p["Conv_0"]["kernel"],
                                  p["Conv_0"]["bias"], 2, dtype=dtype))
        spatial //= 2
        x = _tail(h, p["Conv_1"], p["Conv_2"], spatial, c, dtype,
                  interpret)
    return _xla_conv(x, params["Conv_0"]["kernel"], None, dtype=dtype)


# ---------------------------------------------------------------------------
# Slab variant: stages too big for whole-volume VMEM residency (the
# 64³×16 synthesis tail = the single largest FLOPs chunk of the c3p
# stack) run the same fused tail over D-slabs. The caller zero-pads the
# folded volume by 2 slices on each D end; each grid step DMAs its
# haloed slab from HBM, computes conv₁ over the whole slab (the two
# halo slices of conv₁ output are wrap garbage but never read by
# conv₂), computes conv₂ + residual for the slab interior, and writes
# one non-overlapping output slab.
# ---------------------------------------------------------------------------


def _tail_slab_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                      xs_ref, sem, *, d, h, w, g, c, slab, residual):
    shift = _make_tap_fn(d, h, w, g, c)  # d only used for dz masks; the
    # zero-padded halo slices make the global-D mask unnecessary, but the
    # local mask must not kill interior taps — so pass a "d" larger than
    # any local index (slab + 4 slices ≤ d + 4).
    srows = (w // g) * h  # folded rows per D slice
    i = pl.program_id(0)
    s = pl.program_id(1)
    # conv₁ on the zero-padded halo is NOT zero (relu(bias)): zero any t
    # row whose global D slice lies outside the real volume, exactly as
    # the true conv's border taps would
    rows_slab = (slab + 4) * srows
    g_d = (s * slab - 2
           + jax.lax.broadcasted_iota(jnp.int32, (rows_slab, LANES), 0)
           // srows)
    t_valid = (g_d >= 0) & (g_d < w)  # cube: global D extent == w

    dma = pltpu.make_async_copy(
        x_ref.at[i, pl.ds(s * slab * srows, (slab + 4) * srows), :],
        xs_ref, sem)
    dma.start()
    dma.wait()

    def conv(src, w_ref, b_ref):
        acc = jnp.zeros(src.shape, jnp.float32)
        t = 0
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    acc = acc + jnp.dot(shift(src, dz, dy, dx), w_ref[t],
                                        preferred_element_type=jnp.float32)
                    t += 1
        return jnp.maximum(acc + b_ref[...], 0.0)

    t_full = conv(xs_ref[...], w1_ref, b1_ref)
    t_full = jnp.where(t_valid, t_full, 0.0).astype(xs_ref.dtype)
    y = conv(t_full, w2_ref, b2_ref)
    lo = 2 * srows  # static: interior slices [2, slab+2) of the slab
    hi = (slab + 2) * srows
    y = y[lo:hi, :]
    if residual:
        y = y + xs_ref[lo:hi, :].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def fused_residual_tail_slab(x, w1, b1, w2, b2, *, spatial: int,
                             channels: int, slab: int = 8,
                             residual: bool = True, interpret: bool = False,
                             dtype=jnp.bfloat16):
    """Slab-pipelined fused tail for volumes beyond whole-block VMEM."""
    rows, g = fold_shape(spatial, channels)
    assert spatial % slab == 0, (spatial, slab)
    folded_in = x.ndim == 3
    n = x.shape[0]
    srows = rows // spatial  # folded rows per D slice
    xf = x.reshape(n, rows, LANES).astype(dtype)
    xpad = jnp.pad(xf, ((0, 0), (2 * srows, 2 * srows), (0, 0)))

    w1p = pack_tail_weights(w1, g, dtype=dtype)
    w2p = pack_tail_weights(w2, g, dtype=dtype)
    b1p = _fold_bias(b1, g)
    b2p = _fold_bias(b2, g)

    # dz masks must pass for every local slab slice (global D borders are
    # provided by the zero padding): use the slab's own depth + halo.
    kern = functools.partial(_tail_slab_kernel, d=slab + 4, h=spatial,
                             w=spatial, g=g, c=channels, slab=slab,
                             residual=residual)
    out = pl.pallas_call(
        kern,
        grid=(n, spatial // slab),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((27, LANES, LANES), lambda i, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, LANES, LANES), lambda i, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, slab * srows, LANES),
                               lambda i, s: (i, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, rows, LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM(((slab + 4) * srows, LANES), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # the two conv working sets exceed Mosaic's 16 MB default scoped-
        # vmem budget at 64³×16; v5e VMEM is 128 MB — raise the cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xpad, w1p, b1p, w2p, b2p)
    if folded_in:
        return out
    return out.reshape(x.shape[0], spatial, spatial, spatial, channels)
