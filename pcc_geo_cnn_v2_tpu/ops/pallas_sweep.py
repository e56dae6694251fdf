"""Pallas TPU kernel for the adaptive-threshold D1 sweep.

The XLA formulation in ``ops/threshold_sweep.py`` materializes the
min-plus broadcast ([..., L, L]) in HBM — ~50 GB of traffic per 64³ block
for a 256-threshold sweep. This kernel keeps the entire distance field in
VMEM and, crucially, bounds the min-plus shift loops *dynamically*:

The sweep's AB sum only reads the candidate-set EDT at ORIGINAL occupied
voxels, which hug the decoded surface, so their true NN distances are tiny
(a few voxels) even though the full-volume EDT ranges to ~√3·B. Per
threshold the kernel computes an exact upper bound on every occupied
voxel's NN distance from axis-aligned rays (log-step doubling
propagation), takes kmax = max over occupied voxels, and runs the y/x
min-plus passes only for shifts ≤ kmax. Values elsewhere in the volume may
be overestimates — they are masked out of the AB sum. Proof of exactness
at occupied voxels: for p occupied with true NN c at distance² D ≤ kmax²,
the separable path (dz,dy,dx) from c to p has every |d·| ≤ √D ≤ kmax, so
each pass includes the needed shift; passes never underestimate.

Layout: volumes ride as [B, B²] (z, y·B+x). The lane axis is then B² = 4096
for 64³ blocks — fully populated 128-wide vregs, and both the x- and
y-axis passes become *lane rotations* (by k and by B·k) with iota masks
(``tpu.dynamic_rotate`` requires a 128-aligned lane dim; a [.., 64] lane
layout is both unaligned and half-wasted). The z pass is a forward+backward
linear-distance two-scan over sublanes (exact for the binary first pass).

Thresholds at or past a block's first empty candidate set are skipped via
``@pl.when`` (their metrics are ineligible by construction — the selection
masks them out exactly as the reference's early ``break`` does,
``model_opt.py:12-14``).

Mosaic notes: thresholds and per-block first-empty counts ride in SMEM via
scalar prefetch; the [N, T] outputs use full (1, T) row blocks revisited
across the threshold-chunk grid axis (the row stays in VMEM until the
block index advances); iotas are built ≥2-D (TPU forbids 1-D iota).
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

BIG = 1e9  # linear-distance infinity (BIG² stays finite in f32)


def _axis_ray_dist(mask, size, stride, pos):
    """Exact 1-D L1 distance to the nearest ``mask`` voxel along one lane
    axis (x: stride=1, y: stride=B) via log-step doubling propagation:
    any gap k ≤ B-1 decomposes into binary jumps, min keeps the best."""
    flat = mask.shape[-1]
    d = jnp.where(mask, 0.0, BIG)
    s = 1
    while s < size:
        fs = jnp.float32(s)
        fwd = pltpu.roll(d, flat - s * stride, 1)  # fwd[i] = d[i + s·stride]
        d = jnp.minimum(d, jnp.where(pos < size - s, fwd + fs, BIG))
        bwd = pltpu.roll(d, s * stride, 1)  # bwd[i] = d[i - s·stride]
        d = jnp.minimum(d, jnp.where(pos >= s, bwd + fs, BIG))
        s *= 2
    return d


def _z_linear_scan(scratch, mask, size, unroll=None):
    """Exact 1-D L1 distance along the sublane (z) axis: forward +
    backward running-distance scans through the scratch ref (Mosaic can
    dynamic-slice refs, not value sublanes). Leaves the result in scratch
    and returns it. Row updates are sequential; unrolling only amortizes
    loop overhead; it must divide size - 1 (63 = 9·7)."""
    if unroll is None:
        unroll = max(d for d in range(1, 9) if (size - 1) % d == 0)
    assert (size - 1) % unroll == 0, (size, unroll)
    scratch[...] = jnp.where(mask, 0.0, BIG)

    def fwd(jj, carry):
        for u in range(unroll):
            j = jj * unroll + u + 1
            scratch[pl.ds(j, 1), :] = jnp.minimum(
                scratch[pl.ds(j, 1), :], scratch[pl.ds(j - 1, 1), :] + 1.0
            )
        return carry

    def bwd(jj, carry):
        for u in range(unroll):
            j = size - 2 - (jj * unroll + u)
            scratch[pl.ds(j, 1), :] = jnp.minimum(
                scratch[pl.ds(j, 1), :], scratch[pl.ds(j + 1, 1), :] + 1.0
            )
        return carry

    jax.lax.fori_loop(0, (size - 1) // unroll, fwd, 0)
    jax.lax.fori_loop(0, (size - 1) // unroll, bwd, 0)
    return scratch[...]


def _min_plus_rolls(scratch, size, stride, pos, kmax, unroll=4):
    """Min-plus pass along a lane axis (x: stride=1, y: stride=B) for
    shifts 1..kmax (dynamic). Exact wherever the true best shift ≤ kmax."""
    flat = size * size
    g = scratch[...]

    def body(kk, acc):
        for u in range(unroll):
            k = kk * unroll + u + 1
            k2 = (k * k).astype(jnp.float32)
            left = pltpu.roll(g, flat - k * stride, 1)  # [i] = g[i + k·s]
            acc = jnp.minimum(acc, jnp.where(pos < size - k, left + k2, INF))
            right = pltpu.roll(g, k * stride, 1)  # [i] = g[i - k·s]
            acc = jnp.minimum(acc, jnp.where(pos >= k, right + k2, INF))
        return acc

    n_iter = jnp.minimum((kmax + unroll - 1) // unroll,
                         (size + unroll - 2) // unroll)
    scratch[...] = jax.lax.fori_loop(0, n_iter, body, g)


def _sweep_kernel(first_empty_ref, t_small_ref, thr_ref, topk_val_ref,
                  topk_pos_ref, x_hat_ref, occ_ref, dt_ref,
                  ab_ref, ba_ref, cnt_ref, scratch, *, chunk, size, topk):
    block_id = pl.program_id(0)
    chunk_id = pl.program_id(1)
    x_hat = x_hat_ref[0]
    occ = occ_ref[0]
    dt = dt_ref[0]
    occ_b = occ > 0.0
    first_empty = first_empty_ref[block_id]
    t_small = t_small_ref[block_id]  # thresholds ≥ t_small have count ≤ topk
    T = ab_ref.shape[1]
    flat = size * size
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)  # int iota: ok
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, flat), 1)
    x_pos = lane % size
    y_pos = lane // size
    z_pos = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)

    def _store(ref, t_global, value):
        # Mosaic forbids scalar VMEM stores: masked full-row RMW instead.
        row = ref[pl.ds(block_id, 1), :]
        ref[pl.ds(block_id, 1), :] = jnp.where(lane_t == t_global, value, row)

    # Chunk-level shift bound: candidate sets are nested, so one ray bound
    # computed on the chunk's SMALLEST set still on the EDT path (largest
    # t < t_small in the chunk) upper-bounds every occupied voxel's NN
    # distance for all EDT thresholds in the chunk. Amortizes the doubling
    # passes 1/chunk. Thresholds ≥ t_small take the top-k branch instead,
    # which keeps the sparse-set tail (huge NN distances) out of the bound.
    t_last = jnp.clip(
        jnp.minimum(chunk_id * chunk + chunk - 1,
                    jnp.minimum(first_empty, t_small) - 1), 0, T - 1
    )
    mask_last = x_hat > thr_ref[t_last]
    ray = _z_linear_scan(scratch, mask_last, size)
    ray = jnp.minimum(ray, _axis_ray_dist(mask_last, size, size, y_pos))
    ray = jnp.minimum(ray, _axis_ray_dist(mask_last, size, 1, x_pos))
    kmax_f = jnp.max(jnp.where(occ_b, ray, 0.0))
    kmax = jnp.minimum(kmax_f, jnp.float32(size - 1)).astype(jnp.int32)

    for t in range(chunk):
        t_global = chunk_id * chunk + t

        @pl.when(t_global < first_empty)
        def _(t=t, t_global=t_global):
            thr = thr_ref[t_global]
            mask = x_hat > thr
            _store(cnt_ref, t_global, jnp.sum(mask.astype(jnp.float32)))
            _store(ba_ref, t_global, jnp.sum(jnp.where(mask, dt, 0.0)))

            @pl.when(t_global < t_small)
            def _(t_global=t_global, thr=thr, mask=mask):
                # exact squared-EDT at occupied voxels: z two-scan (exact
                # 1-D) squared, then bounded y/x min-plus passes
                lin_z = _z_linear_scan(scratch, mask, size)
                scratch[...] = jnp.minimum(lin_z * lin_z, INF)
                _min_plus_rolls(scratch, size, size, y_pos, kmax)
                _min_plus_rolls(scratch, size, 1, x_pos, kmax)
                _store(ab_ref, t_global,
                       jnp.sum(jnp.where(occ_b, scratch[...], 0.0)))

            @pl.when(t_global >= t_small)
            def _(t_global=t_global, thr=thr):
                # count ≤ topk ⇒ the candidate set is exactly the top-k
                # voxels with value > thr: AB from k point-distance planes
                # built from iotas — no EDT, immune to the sparse-set
                # distance blow-up.
                acc = jnp.full((size, flat), INF, jnp.float32)
                for k in range(topk):
                    valid = topk_val_ref[block_id, k] > thr
                    zk = topk_pos_ref[block_id, k, 0]
                    yk = topk_pos_ref[block_id, k, 1]
                    xk = topk_pos_ref[block_id, k, 2]
                    dz = (z_pos - zk).astype(jnp.float32)
                    dy = (y_pos - yk).astype(jnp.float32)
                    dx = (x_pos - xk).astype(jnp.float32)
                    d2 = dz * dz + dy * dy + dx * dx
                    acc = jnp.minimum(
                        acc, jnp.where(valid, d2, INF)
                    )
                _store(ab_ref, t_global,
                       jnp.sum(jnp.where(occ_b, acc, 0.0)))

        @pl.when(t_global >= first_empty)
        def _(t_global=t_global):
            _store(cnt_ref, t_global, 0.0)
            _store(ba_ref, t_global, 0.0)
            _store(ab_ref, t_global, INF)


@functools.partial(jax.jit, static_argnames=("chunk", "topk", "interpret"))
def d1_sweep_sums_pallas(x_hat, occ, thresholds, chunk=8, topk=16,
                         interpret=False):
    """Batched sweep sums via the Pallas kernel.

    :param x_hat: [N, B, B, B] decoded probabilities.
    :param occ: [N, B, B, B] original occupancy.
    :param thresholds: [T] ascending (T % chunk == 0).
    :param topk: thresholds whose candidate set has ≤ topk voxels take the
        brute-force point-distance branch (any |S_t| ≤ k set is contained
        in the top-k-by-value voxels — see kernel).
    :return: (ab_sum [N,T], ba_sum [N,T], count [N,T], dt_orig [N,B,B,B])
    """
    n, size = x_hat.shape[0], x_hat.shape[-1]
    T = thresholds.shape[0]
    assert T % chunk == 0
    dt_orig = squared_edt(occ > 0)

    # per-block first empty threshold: candidates are nested, so this is
    # the count of thresholds with a non-empty candidate set — i.e. the
    # count of thresholds below the block max (same float comparisons as
    # `x_hat > t`).
    x_max = jnp.max(x_hat.reshape(n, -1), axis=1)  # [N]
    first_empty = jnp.sum(
        (x_max[:, None] > thresholds[None, :]).astype(jnp.int32), axis=1
    )
    # top-(k+1) values/positions: count(t) > topk ⟺ the (topk+1)-th largest
    # value > t, so t_small = #thresholds below that value
    flat_vals = x_hat.reshape(n, -1).astype(jnp.float32)
    topk_val, topk_idx = jax.lax.top_k(flat_vals, topk + 1)
    t_small = jnp.sum(
        (topk_val[:, topk:topk + 1] > thresholds[None, :]).astype(jnp.int32),
        axis=1,
    )
    zk = topk_idx[:, :topk] // (size * size)
    rem = topk_idx[:, :topk] % (size * size)
    topk_pos = jnp.stack([zk, rem // size, rem % size], axis=-1).astype(
        jnp.int32
    )  # [N, topk, 3]

    # [B, B²] layout: fully-populated, 128-aligned lane axis (see module doc)
    flatten = lambda a: a.reshape(n, size, size * size)
    x_hat_f = flatten(x_hat.astype(jnp.float32))
    occ_f = flatten(jnp.asarray(occ, jnp.float32))
    dt_f = flatten(dt_orig)

    grid = (n, T // chunk)
    kernel = functools.partial(_sweep_kernel, chunk=chunk, size=size,
                               topk=topk)
    # index maps receive the scalar-prefetch refs as trailing arguments
    vol_spec = lambda: pl.BlockSpec((1, size, size * size),
                                    lambda i, j, *_: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    # whole-array output blocks (tiny: [N, T] f32), revisited by every grid
    # step so they live in VMEM for the entire sweep
    out_spec = pl.BlockSpec((n, T), lambda i, j, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, T), jnp.float32)
    ab, ba, cnt = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=[vol_spec(), vol_spec(), vol_spec()],
            out_specs=(out_spec, out_spec, out_spec),
            scratch_shapes=[pltpu.VMEM((size, size * size), jnp.float32)],
        ),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(first_empty, t_small, thresholds, topk_val[:, :topk], topk_pos,
      x_hat_f, occ_f, dt_f)
    return ab, ba, cnt, dt_orig
