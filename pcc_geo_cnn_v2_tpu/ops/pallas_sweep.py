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
layout is both unaligned and half-wasted). The z pass is a log-step
doubling min-plus over sublane rotations (exact for the binary first pass).

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
# int16 arithmetic domain: 2x VPU throughput over f32. Linear distances
# self-cap at 127 (B-1 ≤ 127 for every block size the int16 path accepts),
# so 127² = 16129 acts as squared-distance infinity and every add in the
# min-plus passes stays ≤ 16129 + (B-1)² < 2^15.
BIG_I16 = 127
INF_I16 = 127 * 127


def _consts(dtype):
    if dtype == jnp.int16:
        return jnp.int16(BIG_I16), jnp.int16(INF_I16)
    return jnp.float32(BIG), jnp.float32(INF)


def _axis_ray_dist(mask, size, stride, pos, kmax=None, dtype=jnp.float32):
    """1-D L1 distance to the nearest ``mask`` voxel along one lane
    axis (x: stride=1, y: stride=B) via log-step doubling propagation:
    any gap k ≤ B-1 decomposes into binary jumps, min keeps the best.
    With ``kmax``, steps with s > kmax are skipped — exact ≤ kmax,
    overestimates beyond (valid for upper-bound uses)."""
    flat = mask.shape[-1]
    big, _ = _consts(dtype)
    d = jnp.where(mask, jnp.zeros((), dtype), big)
    s = 1
    while s < size:
        def step(d, s=s):
            fs = jnp.asarray(s, dtype)
            fwd = pltpu.roll(d, flat - s * stride, 1)  # [i] = d[i + s·str]
            d = jnp.minimum(d, jnp.where(pos < size - s, fwd + fs, big))
            bwd = pltpu.roll(d, s * stride, 1)  # [i] = d[i - s·stride]
            return jnp.minimum(d, jnp.where(pos >= s, bwd + fs, big))

        if kmax is None:
            d = step(d)
        else:
            d = jax.lax.cond(s <= kmax, step, lambda d: d, d)
        s *= 2
    return d


def _z_doubling_dist(mask, size, z_pos, kmax=None, dtype=jnp.float32):
    """1-D L1 distance to the nearest ``mask`` voxel along the sublane (z)
    axis via log-step doubling sublane rotations, exact for all true
    distances ≤ ``kmax`` (everywhere if kmax is None). Exactness: linear
    costs decompose into binary jumps (any gap k = Σ 2^i applied in
    increasing step order, same sign), so min-plus doubling reaches every
    offset ≤ 2^m - 1 after the step s = 2^(m-1); steps with s > kmax are
    skipped (``lax.cond`` on the traced bound) — values beyond kmax may be
    overestimates, which callers mask out exactly as with the bounded
    min-plus passes. ~2·log₂(min(kmax,size)) full-volume VPU ops —
    replaces a 126-step sequential single-sublane scan that left the VPU
    8× idle."""
    big, _ = _consts(dtype)
    d = jnp.where(mask, jnp.zeros((), dtype), big)
    s = 1
    while s < size:
        def step(d, s=s):
            fs = jnp.asarray(s, dtype)
            fwd = pltpu.roll(d, size - s, 0)  # fwd[i] = d[i + s]
            d = jnp.minimum(d, jnp.where(z_pos < size - s, fwd + fs, big))
            bwd = pltpu.roll(d, s, 0)  # bwd[i] = d[i - s]
            return jnp.minimum(d, jnp.where(z_pos >= s, bwd + fs, big))

        if kmax is None:
            d = step(d)
        else:
            # after steps 1..s all offsets ≤ 2s-1 are reached, so the
            # first skipped step (s > kmax) certifies offsets ≤ kmax
            d = jax.lax.cond(s <= kmax, step, lambda d: d, d)
        s *= 2
    return d


def _min_plus_rolls(scratch, size, stride, pos, kmax, unroll=4):
    """Min-plus pass along a lane axis (x: stride=1, y: stride=B) for
    shifts 1..kmax (dynamic). Exact wherever the true best shift ≤ kmax.
    Works in the scratch ref's dtype (f32, or int16 when the squared-
    distance domain fits — see BIG_I16/INF_I16).

    (A statically-unrolled variant with lax.cond-guarded static roll
    amounts measured ~8% SLOWER end-to-end than this dynamically-bounded
    loop — the per-step branches cost what the static rotations saved.)"""
    flat = size * size
    g = scratch[...]
    dtype = g.dtype
    _, inf = _consts(dtype)

    def body(kk, acc):
        for u in range(unroll):
            k = kk * unroll + u + 1
            k2 = (k * k).astype(dtype)
            left = pltpu.roll(g, flat - k * stride, 1)  # [i] = g[i + k·s]
            acc = jnp.minimum(acc, jnp.where(pos < size - k, left + k2,
                                             inf))
            right = pltpu.roll(g, k * stride, 1)  # [i] = g[i - k·s]
            acc = jnp.minimum(acc, jnp.where(pos >= k, right + k2, inf))
        return acc

    n_iter = jnp.minimum((kmax + unroll - 1) // unroll,
                         (size + unroll - 2) // unroll)
    scratch[...] = jax.lax.fori_loop(0, n_iter, body, g)


def _sweep_kernel(first_empty_ref, t_small_ref, thr_ref, topk_val_ref,
                  topk_pos_ref, kmax_coarse_ref, x_hat_ref, occ_ref, dt_ref,
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

    # Chunk-level shift bound: candidate sets are nested, so one bound
    # computed on the chunk's SMALLEST set still on the EDT path (largest
    # t < t_small in the chunk) upper-bounds every occupied voxel's NN
    # distance for all EDT thresholds in the chunk. Two bounds are min'd:
    # (a) the coarse-grid EDT bound computed outside the kernel (robust —
    # finite for any non-empty set; axis rays MISS sparse 3D sets almost
    # surely, which used to collapse the bound to size-1 and made mid-
    # density thresholds run full-length min-plus passes), and (b) the
    # per-axis ray bound below (tighter on dense sets), itself run with
    # the coarse bound so its doubling stops early. Thresholds ≥ t_small
    # are computed outside the kernel (prefix-min) or by the top-k branch,
    # keeping the sparse-set tail (huge NN distances) out of the bound.
    kc = kmax_coarse_ref[block_id, chunk_id]
    t_last = jnp.clip(
        jnp.minimum(chunk_id * chunk + chunk - 1,
                    jnp.minimum(first_empty, t_small) - 1), 0, T - 1
    )
    mask_last = x_hat > thr_ref[t_last]
    ray = _z_doubling_dist(mask_last, size, z_pos, kmax=kc)
    ray = jnp.minimum(ray, _axis_ray_dist(mask_last, size, size, y_pos,
                                          kmax=kc))
    ray = jnp.minimum(ray, _axis_ray_dist(mask_last, size, 1, x_pos,
                                          kmax=kc))
    kmax_f = jnp.max(jnp.where(occ_b, ray, 0.0))
    kmax = jnp.minimum(kmax_f, jnp.float32(size - 1)).astype(jnp.int32)
    kmax = jnp.minimum(kmax, kc)

    for t in range(chunk):
        t_global = chunk_id * chunk + t

        @pl.when(t_global < first_empty)
        def _(t=t, t_global=t_global):
            thr = thr_ref[t_global]
            mask = x_hat > thr
            _store(cnt_ref, t_global, jnp.sum(mask.astype(jnp.float32)))
            _store(ba_ref, t_global,
                   jnp.sum(jnp.where(mask, dt, jnp.zeros((), dt.dtype))
                           .astype(jnp.float32)))

            @pl.when(t_global < t_small)
            def _(t_global=t_global, thr=thr, mask=mask):
                # exact squared-EDT at occupied voxels: bounded z doubling
                # pass (any true NN at D ≤ kmax² has |dz| ≤ kmax) squared,
                # then bounded y/x min-plus passes — in the scratch dtype
                # (int16 when the distance domain fits: 2x VPU throughput)
                sdt = scratch.dtype
                _, s_inf = _consts(sdt)
                lin_z = _z_doubling_dist(mask, size, z_pos, kmax=kmax,
                                         dtype=sdt)
                scratch[...] = jnp.minimum(lin_z * lin_z, s_inf)
                _min_plus_rolls(scratch, size, size, y_pos, kmax)
                _min_plus_rolls(scratch, size, 1, x_pos, kmax)
                _store(ab_ref, t_global,
                       jnp.sum(jnp.where(occ_b, scratch[...],
                                         jnp.zeros((), sdt))
                               .astype(jnp.float32)))

            @pl.when(t_global >= t_small)
            def _(t_global=t_global, thr=thr):
                if topk == 0:
                    # sparse thresholds are computed outside the kernel by
                    # the points×candidates prefix-min path (see wrapper);
                    # store a placeholder the wrapper overwrites.
                    _store(ab_ref, t_global, INF)
                    return
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


@functools.partial(jax.jit,
                   static_argnames=("chunk", "topk", "interpret", "sparse_k"))
def d1_sweep_sums_pallas(x_hat, occ, thresholds, chunk=8, topk=16,
                         interpret=False, pts=None, sparse_k=256):
    """Batched sweep sums via the Pallas kernel.

    :param x_hat: [N, B, B, B] decoded probabilities.
    :param occ: [N, B, B, B] original occupancy.
    :param thresholds: [T] ascending (T % chunk == 0).
    :param topk: thresholds whose candidate set has ≤ topk voxels take the
        brute-force point-distance branch (any |S_t| ≤ k set is contained
        in the top-k-by-value voxels — see kernel). Ignored when ``pts``
        is given.
    :param pts: optional [N, P, 3] int occupied-voxel coordinates (rows of
        -1 are padding; must cover exactly the occupied voxels of ``occ``).
        When given, every threshold whose candidate set has ≤ ``sparse_k``
        voxels is computed OUTSIDE the kernel by an MXU-friendly
        points×candidates prefix-min (exact, independent of how far the
        sparse candidates sit from the surface), and the kernel runs its
        ray-bounded EDT only on dense sets — whose NN distances, and hence
        min-plus trip counts, stay small. This removes the sweep's
        dominant cost: sparse tail thresholds with kmax → B-1.
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
    # top-(k+1) values/positions: count(t) > k ⟺ the (k+1)-th largest
    # value > t, so t_small = #thresholds below that value
    k_eff = sparse_k if pts is not None else topk
    kernel_topk = 0 if pts is not None else topk
    flat_vals = x_hat.reshape(n, -1).astype(jnp.float32)
    topk_val, topk_idx = jax.lax.top_k(flat_vals, k_eff + 1)
    t_small = jnp.sum(
        (topk_val[:, k_eff:k_eff + 1] > thresholds[None, :]).astype(jnp.int32),
        axis=1,
    )
    n_pos = max(kernel_topk, 1)  # prefetch arrays must be non-empty
    zk = topk_idx[:, :n_pos] // (size * size)
    rem = topk_idx[:, :n_pos] % (size * size)
    topk_pos = jnp.stack([zk, rem // size, rem % size], axis=-1).astype(
        jnp.int32
    )  # [N, n_pos, 3]

    # [B, B²] layout: fully-populated, 128-aligned lane axis (see module doc)
    flatten = lambda a: a.reshape(n, size, size * size)
    x_hat_f = flatten(x_hat.astype(jnp.float32))
    occ_f = flatten(jnp.asarray(occ, jnp.float32))
    # int16 EDT domain when every true squared distance fits under the
    # 127² cap (B ≤ 64) would halve VPU work and the dt input stream —
    # but Mosaic's tpu.dynamic_rotate only implements 32-bit data
    # ("Rotate with non-32-bit data: not implemented", 2026-08), so the
    # int16 kernel path stays disabled until that lands. The kernel and
    # helpers are dtype-generic and interpret-tested for the day it does.
    use_i16 = False and 3 * (size - 1) ** 2 < INF_I16
    edt_dtype = jnp.int16 if use_i16 else jnp.float32
    dt_f = flatten(dt_orig.astype(edt_dtype))

    # Coarse-grid shift bound per (block, threshold chunk): a g³-cell max-
    # pool of x_hat turns "cell contains a candidate at threshold t" into
    # one comparison, a tiny coarse EDT gives each occupied cell's coarse
    # NN distance D, and any voxel pair across cells at index distance D
    # is within g·D + (g-1)·√3. Axis rays (the kernel's other bound) miss
    # sparse 3D sets almost surely; this bound is finite for every
    # non-empty candidate set and costs ~nothing outside the kernel.
    g = max(size // 32, 1)
    cs = size // g
    cell_max = jnp.max(
        x_hat.astype(jnp.float32).reshape(n, cs, g, cs, g, cs, g),
        axis=(2, 4, 6),
    )  # [n, cs³]
    occ_cell = jnp.max(
        jnp.asarray(occ, jnp.float32).reshape(n, cs, g, cs, g, cs, g),
        axis=(2, 4, 6),
    ) > 0
    n_chunks = T // chunk
    c_idx = jnp.arange(n_chunks, dtype=jnp.int32)
    te = jnp.minimum(first_empty, t_small)[:, None]
    t_last = jnp.clip(
        jnp.minimum(c_idx[None, :] * chunk + chunk - 1, te - 1), 0, T - 1
    )  # [n, n_chunks]
    thr_last = thresholds[t_last]

    def _chunk_bound(thr_c):
        cmask = cell_max > thr_c[:, None, None, None]
        # banded: coarse distances beyond `band` cells yield overestimated
        # bounds (clipped to size-1), which only cost extra min-plus
        # iterations on the rare blocks whose dense candidate sets sit far
        # from the occupied voxels — never wrong values
        from pcc_geo_cnn_v2_tpu.ops.edt import banded_squared_edt

        edt2 = banded_squared_edt(cmask, min(8, cs - 1))
        return jnp.max(
            jnp.where(occ_cell, edt2, 0.0), axis=(1, 2, 3)
        )  # [n]

    dmax2 = jax.lax.map(_chunk_bound, jnp.moveaxis(thr_last, 1, 0))
    kmax_coarse = jnp.clip(
        jnp.ceil(g * jnp.sqrt(dmax2) + (g - 1) * np.sqrt(3.0)),
        0, size - 1,
    ).astype(jnp.int32).T  # [n, n_chunks]

    grid = (n, n_chunks)
    kernel = functools.partial(_sweep_kernel, chunk=chunk, size=size,
                               topk=kernel_topk)
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
            num_scalar_prefetch=6,
            grid=grid,
            in_specs=[vol_spec(), vol_spec(), vol_spec()],
            out_specs=(out_spec, out_spec, out_spec),
            scratch_shapes=[pltpu.VMEM((size, size * size), edt_dtype)],
        ),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(first_empty, t_small, thresholds, topk_val[:, :n_pos], topk_pos,
      kmax_coarse, x_hat_f, occ_f, dt_f)
    if pts is not None:
        ab_sparse = _sparse_ab_sums(pts, topk_idx[:, :k_eff], cnt, size)
        tidx = jnp.arange(T, dtype=jnp.int32)[None, :]
        use_sparse = (tidx >= t_small[:, None]) & (tidx < first_empty[:, None])
        ab = jnp.where(use_sparse, ab_sparse, ab)
    return ab, ba, cnt, dt_orig


def _sparse_ab_sums(pts, cand_idx, cnt, size):
    """AB sums for sparse thresholds via points×candidates prefix-min.

    For a threshold with count c ≤ K the candidate set is exactly the
    first c entries of the top-K-by-value list (``lax.top_k`` returns
    descending order; count uses the same strict ``>`` comparisons), so
    d_t(p) = prefix-min over the first c candidates of dist²(p, ·) — one
    [P, K] distance matrix + one prefix-min scan per block serves all
    sparse thresholds via a gather at index c-1. Exact, and the cost is
    independent of how far candidates sit from the original points (the
    EDT formulation degrades as kmax → B-1 exactly on these thresholds).

    :param pts: [N, P, 3] int occupied voxels, -1 rows = padding.
    :param cand_idx: [N, K] flat indexes of the top-K voxels (descending
        by value).
    :param cnt: [N, T] per-threshold candidate counts (from the kernel).
    :return: [N, T] AB sums, valid wherever 0 < count ≤ K.
    """
    rem = cand_idx % (size * size)
    cand = jnp.stack(
        [cand_idx // (size * size), rem // size, rem % size], axis=-1
    ).astype(jnp.float32)  # [N, K, 3]
    K = cand.shape[1]
    idx = jnp.clip(cnt.astype(jnp.int32) - 1, 0, K - 1)  # [N, T]

    # chunk the point axis: dense blocks can pack thousands of points and
    # [N, P, K] would not fit; each chunk is independent along P
    P = pts.shape[1]
    pc = min(P, 512)
    pad = (-P) % pc
    pts_p = jnp.pad(pts, ((0, 0), (0, pad), (0, 0)), constant_values=-1)
    chunks = jnp.moveaxis(
        pts_p.reshape(pts.shape[0], -1, pc, 3), 1, 0
    )  # [P/pc, N, pc, 3]

    def one(p_chunk):
        valid_p = jnp.all(p_chunk >= 0, axis=-1)  # [N, pc]
        ptsf = p_chunk.astype(jnp.float32)
        # exact integer-valued f32 distances: elementwise squared
        # differences (an MXU cross-term at bf16 would lose exactness;
        # coords ≤ B-1 keep every term exactly representable in f32)
        d2 = jnp.sum(
            (ptsf[:, :, None, :] - cand[:, None, :, :]) ** 2, axis=-1
        )  # [N, pc, K]
        # prefix-min via log-doubling shifts (lax.associative_scan lowers
        # ~25x slower than these 8 shifted-min passes on TPU)
        pm = d2
        s = 1
        while s < K:
            shifted = jnp.pad(
                pm[:, :, : K - s], ((0, 0), (0, 0), (s, 0)),
                constant_values=INF,
            )
            pm = jnp.minimum(pm, shifted)
            s *= 2
        picked = jnp.take_along_axis(pm, idx[:, None, :], axis=2)
        return jnp.sum(
            jnp.where(valid_p[:, :, None], picked, 0.0), axis=1
        )  # [N, T]

    return jnp.sum(jax.lax.map(one, chunks), axis=0)
