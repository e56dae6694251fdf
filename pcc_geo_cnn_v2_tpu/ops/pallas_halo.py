"""Pallas TPU kernel for the halo-block full-cloud D1 sums.

``ops/cloud_metrics.blockwise_d1_sums`` needs, per octree block, the
squared EDT of the 27-neighborhood halo volume evaluated at the block's
core query voxels (exact ≤ halo², flagged beyond). The XLA formulation
(``ops/edt.banded_squared_edt``) runs 2·halo+1 shifted adds per axis over
the full [H³] halo volumes in HBM; this kernel keeps one halo volume in
VMEM and runs the same dynamically-bounded passes as the sweep kernel
(``ops/pallas_sweep.py``): a log-doubling z pass and per-axis min-plus
rolls, bounded per block by a coarse-grid EDT bound computed in XLA.

Bound validity: with kmax = min(bound, halo) where ``bound`` dominates
every core query voxel's true in-halo NN distance, queries with true
distance ≤ halo are exact (their separable path has per-axis offsets
≤ kmax) and queries beyond halo can only be overestimated — which flags
them as outliers, exactly as required.

Layout: halo volumes ride as [Hp, Hp²] (z, y·Hp+x) with Hp = H rounded up
to a multiple of 16, so the lane axis is a multiple of 128 (full vregs,
rotations legal). Padding voxels are empty in the target (never chosen as
NN within bounds… they only ever overestimate) and excluded from queries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcc_geo_cnn_v2_tpu.ops.edt import INF, banded_squared_edt
from pcc_geo_cnn_v2_tpu.ops.pallas_sweep import (
    _min_plus_rolls,
    _z_doubling_dist,
)

__all__ = ["halo_d1_dir_pallas"]


def _halo_kernel(kmax_ref, qry_ref, tgt_ref, out_ref, unres_ref, scratch,
                 *, hsize, halo):
    b = pl.program_id(0)
    flat = hsize * hsize
    tgt = tgt_ref[0]
    qry_b = qry_ref[0] > 0.0
    kmax = kmax_ref[b]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, flat), 1)
    x_pos = lane % hsize
    y_pos = lane // hsize
    z_pos = jax.lax.broadcasted_iota(jnp.int32, (hsize, 1), 0)

    lin_z = _z_doubling_dist(tgt > 0.0, hsize, z_pos, kmax=kmax)
    scratch[...] = jnp.minimum(lin_z * lin_z, INF)
    _min_plus_rolls(scratch, hsize, hsize, y_pos, kmax)
    _min_plus_rolls(scratch, hsize, 1, x_pos, kmax)
    dt = scratch[...]

    cap = jnp.float32(halo * halo)
    ok = dt <= cap
    unres = qry_b & ~ok
    unres_ref[0] = unres.astype(jnp.int8)
    d1_sum = jnp.sum(jnp.where(qry_b & ok, dt, 0.0))
    n = jnp.sum(qry_b.astype(jnp.float32))
    cnt = jnp.sum(unres.astype(jnp.float32))
    # whole-array output block (revisited, stays in VMEM): masked row RMW —
    # per-block (1, 128) output blocks violate the (8, 128) tile minimum
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (out_ref.shape[0], 1), 0)
    vals = jnp.where(
        lane128 == 0, d1_sum,
        jnp.where(lane128 == 1, n, jnp.where(lane128 == 2, cnt, 0.0))
    )
    out_ref[...] = jnp.where(sub == b, vals, out_ref[...])


@functools.partial(jax.jit, static_argnames=("size", "halo", "interpret"))
def halo_d1_dir_pallas(qry_vol, tgt_vol, *, size, halo, interpret=False):
    """One-direction D1 partial sums over assembled halo volumes.

    :param qry_vol: [bs, H, H, H] {0,1} query occupancy (core window only
        populated), H = size + 2·halo.
    :param tgt_vol: [bs, H, H, H] {0,1} target occupancy (full halo).
    :return: dict(sum [bs], n [bs], unres_cnt [bs], unres [bs, size³/8]
        packed core outlier masks) — semantics of
        ``cloud_metrics._halo_dir_chunk``.
    """
    bs, H = qry_vol.shape[0], qry_vol.shape[1]
    Hp = -(-H // 16) * 16  # lane axis Hp² ≡ 0 (mod 128)
    pad = [(0, 0), (0, Hp - H), (0, Hp - H), (0, Hp - H)]
    # int8 volumes: the occupancy in/out streams are the kernel's HBM
    # traffic (the EDT itself lives in VMEM) — 4x less than f32
    qry_p = jnp.pad(qry_vol.astype(jnp.int8), pad)
    tgt_p = jnp.pad(tgt_vol.astype(jnp.int8), pad)

    # per-block shift bound from a coarse-grid EDT (see pallas_sweep):
    # cells of g³ voxels, nearest target cell at index distance D ⇒ any
    # query in the cell is within g·D + (g-1)·√3. 32³ cells, not 16³: the
    # (g-1)·√3 margin at g=6 (≈8.7) swamps the bound and forces near-full
    # min-plus trip counts; g=3 halves it
    # largest divisor of Hp with cells no finer than ~32³ (Hp need not be
    # a multiple of 32: e.g. halo 20 → H 104 → Hp 112 → g 2)
    g = next(d for d in range(max(Hp // 32, 1), 0, -1) if Hp % d == 0)
    cs = Hp // g
    cell = lambda v: jnp.max(
        v.reshape(bs, cs, g, cs, g, cs, g), axis=(2, 4, 6)
    ) > 0
    tgt_cell = cell(tgt_p)
    qry_cell = cell(qry_p)
    # banded: coarse distances beyond ceil(halo/g)+1 cells only produce
    # bounds that clip to halo anyway
    edt2c = banded_squared_edt(tgt_cell, min(-(-halo // g) + 1, cs - 1))
    d2max = jnp.max(jnp.where(qry_cell, edt2c, 0.0), axis=(1, 2, 3))
    kmax = jnp.clip(
        jnp.ceil(g * jnp.sqrt(d2max) + (g - 1) * np.sqrt(3.0)), 0, halo
    ).astype(jnp.int32)  # [bs]

    flatten = lambda v: v.reshape(bs, Hp, Hp * Hp)
    vol_spec = pl.BlockSpec((1, Hp, Hp * Hp), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bs, 128), lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_halo_kernel, hsize=Hp, halo=halo)
    scalars, unres = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bs,),
            in_specs=[vol_spec, vol_spec],
            out_specs=(out_spec, vol_spec),
            scratch_shapes=[pltpu.VMEM((Hp, Hp * Hp), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bs, 128), jnp.float32),
            jax.ShapeDtypeStruct((bs, Hp, Hp * Hp), jnp.int8),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kmax, flatten(qry_p), flatten(tgt_p))

    core = slice(halo, halo + size)
    unres_core = unres.reshape(bs, Hp, Hp, Hp)[:, core, core, core] > 0
    return {
        "sum": scalars[:, 0],
        "n": scalars[:, 1].astype(jnp.int32),
        "unres_cnt": scalars[:, 2].astype(jnp.int32),
        "unres": jnp.packbits(unres_core.reshape(bs, -1), axis=-1,
                              bitorder="big"),
    }
