"""Pallas TPU kernel for the adaptive-threshold D1 sweep.

The XLA formulation in ``ops/threshold_sweep.py`` materializes the
min-plus broadcast ([..., L, L]) in HBM — ~50 GB of traffic per 64³ block
for a 256-threshold sweep. This kernel keeps the entire distance field in
VMEM: per (block, threshold-chunk) grid step it thresholds x_hat, runs the
three exact 1-D min-plus EDT passes as 64-iteration fori_loops over a
VMEM-resident [B³] value, and reduces the AB/BA sums in-register. HBM
traffic collapses to reading x_hat/occ/dt once per chunk and writing three
scalars per threshold.

Thresholds at or past a block's first empty candidate set are skipped via
``@pl.when`` (their metrics are ineligible by construction — the selection
masks them out exactly as the reference's early ``break`` does,
``model_opt.py:12-14``).

Mosaic notes: thresholds and per-block first-empty counts ride in SMEM via
scalar prefetch; the [N, T] outputs use full (1, T) row blocks revisited
across the threshold-chunk grid axis (the row stays in VMEM until the
block index advances); iotas are built 3-D (TPU forbids 1-D iota).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcc_geo_cnn_v2_tpu.ops.edt import INF, squared_edt

__all__ = ["d1_sweep_sums_pallas"]


def _edt_via_scratch(scratch, size, unroll=8):
    """Exact 3-D squared EDT of the field currently held in ``scratch``.

    Three min-plus passes, one per axis, each slicing the source ref along
    its own axis (no transposes — lane/sublane dynamic slices lower fine in
    Mosaic and a broadcast is far cheaper than a full-volume shuffle).
    Loops are unrolled to amortize loop/slice overhead. Result is left in
    ``scratch``.
    """

    def slice_pass(axis):
        shape = [1, 1, 1]
        shape[axis] = size
        i0 = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis).astype(
            jnp.float32
        )

        def body(jj, acc):
            for u in range(unroll):
                j = jj * unroll + u
                d2 = (i0 - j.astype(jnp.float32)) ** 2
                if axis == 0:
                    col = scratch[pl.ds(j, 1), :, :]
                else:
                    col = scratch[:, pl.ds(j, 1), :]
                acc = jnp.minimum(acc, col + d2)
            return acc

        acc = jax.lax.fori_loop(
            0, size // unroll, body,
            jnp.full((size, size, size), INF, jnp.float32),
        )
        scratch[...] = acc

    def lane_pass():
        # Mosaic cannot dynamic-slice the lane axis; lane *rotations* are a
        # native op, so min over shifts ±k with edge masking instead.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
        g = scratch[...]
        acc = g  # k = 0
        for k in range(1, size):
            k2 = jnp.float32(k * k)
            left = pltpu.roll(g, size - k, 2)  # left[i] = g[i+k] (wraps)
            acc = jnp.minimum(acc, jnp.where(lane < size - k,
                                             left + k2, INF))
            right = pltpu.roll(g, k, 2)  # right[i] = g[i-k]
            acc = jnp.minimum(acc, jnp.where(lane >= k, right + k2, INF))
        scratch[...] = acc

    slice_pass(0)
    slice_pass(1)
    lane_pass()


def _sweep_kernel(first_empty_ref, thr_ref, x_hat_ref, occ_ref, dt_ref,
                  ab_ref, ba_ref, cnt_ref, scratch, *, chunk, size):
    block_id = pl.program_id(0)
    chunk_id = pl.program_id(1)
    x_hat = x_hat_ref[0]
    occ = occ_ref[0]
    dt = dt_ref[0]
    occ_b = occ > 0.0
    first_empty = first_empty_ref[block_id]
    T = ab_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)  # int iota: ok

    def _store(ref, t_global, value):
        # Mosaic forbids scalar VMEM stores: masked full-row RMW instead.
        row = ref[pl.ds(block_id, 1), :]
        ref[pl.ds(block_id, 1), :] = jnp.where(lane == t_global, value, row)

    for t in range(chunk):
        t_global = chunk_id * chunk + t

        @pl.when(t_global < first_empty)
        def _(t=t, t_global=t_global):
            thr = thr_ref[t_global]
            mask = x_hat > thr
            _store(cnt_ref, t_global, jnp.sum(mask.astype(jnp.float32)))
            _store(ba_ref, t_global, jnp.sum(jnp.where(mask, dt, 0.0)))
            scratch[...] = jnp.where(mask, 0.0, INF).astype(jnp.float32)
            _edt_via_scratch(scratch, size)
            _store(ab_ref, t_global,
                   jnp.sum(jnp.where(occ_b, scratch[...], 0.0)))

        @pl.when(t_global >= first_empty)
        def _(t_global=t_global):
            _store(cnt_ref, t_global, 0.0)
            _store(ba_ref, t_global, 0.0)
            _store(ab_ref, t_global, INF)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def d1_sweep_sums_pallas(x_hat, occ, thresholds, chunk=8, interpret=False):
    """Batched sweep sums via the Pallas kernel.

    :param x_hat: [N, B, B, B] decoded probabilities.
    :param occ: [N, B, B, B] original occupancy.
    :param thresholds: [T] ascending (T % chunk == 0).
    :return: (ab_sum [N,T], ba_sum [N,T], count [N,T], dt_orig [N,B,B,B])
    """
    n, size = x_hat.shape[0], x_hat.shape[-1]
    T = thresholds.shape[0]
    assert T % chunk == 0
    dt_orig = squared_edt(occ > 0)

    # per-block first empty threshold: candidates are nested, so this is
    # the count of thresholds with a non-empty candidate set. Via sort +
    # searchsorted (exact same float comparisons as `x_hat > t`).
    xs = jnp.sort(x_hat.reshape(n, -1), axis=1)
    total = xs.shape[1]
    counts_all = total - jax.vmap(
        lambda row: jnp.searchsorted(row, thresholds, side="right")
    )(xs)  # [N, T]
    first_empty = jnp.sum((counts_all > 0).astype(jnp.int32), axis=1)

    grid = (n, T // chunk)
    kernel = functools.partial(_sweep_kernel, chunk=chunk, size=size)
    # index maps receive the scalar-prefetch refs as trailing arguments
    vol_spec = lambda: pl.BlockSpec((1, size, size, size),
                                    lambda i, j, *_: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    # whole-array output blocks (tiny: [N, T] f32), revisited by every grid
    # step so they live in VMEM for the entire sweep
    out_spec = pl.BlockSpec((n, T), lambda i, j, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, T), jnp.float32)
    ab, ba, cnt = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[vol_spec(), vol_spec(), vol_spec()],
            out_specs=(out_spec, out_spec, out_spec),
            scratch_shapes=[pltpu.VMEM((size, size, size), jnp.float32)],
        ),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(first_empty, thresholds, x_hat, occ, dt_orig)
    return ab, ba, cnt, dt_orig
