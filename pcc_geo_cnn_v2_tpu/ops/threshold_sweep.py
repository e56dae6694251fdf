"""Fused on-device adaptive-threshold search (D1 metrics).

Replaces the reference's per-block host loop — up to 256 KD-tree metric
evaluations per block (``/root/reference/src/model_opt.py:21-77``) — with a
single jitted computation per block batch:

- one EDT of the original occupancy gives all candidate→original distances
  (summed per threshold via masking);
- a chunked batch of EDTs over the nested candidate sets gives
  original→candidate distances for every threshold at once;
- selection replicates ``compute_optimal_thresholds`` semantics: candidate
  lists stop at the first empty threshold, max_delta ratio filters fall
  back to unfiltered, first-minimum argmin, and the centroid failure guard
  (``model_opt.py:59-72``).

Covers the d1_* opt metrics (the defaults); d2_* requires normals and runs
on the host path (``utils/threshold.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pcc_geo_cnn_v2_tpu.ops.edt import INF, squared_edt

__all__ = ["d1_sweep", "d2_sweep", "d2_sweep_pts", "select_thresholds_d1",
           "select_thresholds_device_pts", "D1_METRICS", "D2_METRICS"]

D1_METRICS = ("d1_sum_AB", "d1_sum_BA", "d1_sum_max", "d1_sum_mean",
              "d1_mse_AB", "d1_mse_BA", "d1_mse")
D2_METRICS = ("d2_sum_AB", "d2_sum_BA", "d2_sum_max", "d2_sum_mean",
              "d2_mse_AB", "d2_mse_BA", "d2_mse")


def _metrics_from_sums(ab_sum, ba_sum, n_orig, n_cand, prefix="d1"):
    """All 7 {prefix}_* metrics from directional sums and counts."""
    safe_cand = jnp.maximum(n_cand, 1)
    mse_ab = ab_sum / n_orig
    mse_ba = jnp.where(n_cand > 0, ba_sum / safe_cand, INF)
    return {
        f"{prefix}_sum_AB": ab_sum,
        f"{prefix}_sum_BA": ba_sum,
        f"{prefix}_sum_max": jnp.maximum(ab_sum, ba_sum),
        f"{prefix}_sum_mean": (ab_sum + ba_sum) / 2,
        f"{prefix}_mse_AB": mse_ab,
        f"{prefix}_mse_BA": mse_ba,
        f"{prefix}_mse": jnp.maximum(mse_ab, mse_ba),
    }


def d1_sweep(occ, x_hat, thresholds, chunk=16):
    """Per-threshold D1 metrics for one block.

    :param occ: [B,B,B] original occupancy ({0,1}).
    :param x_hat: [B,B,B] decoded probabilities.
    :param thresholds: [T] ascending.
    :return: dict of [T] metric arrays + 'count' [T].
    """
    occ_b = jnp.asarray(occ, bool)
    n_orig = jnp.sum(occ)
    dt_orig = squared_edt(occ_b)  # candidate→original distances

    def per_chunk(ts):
        masks = x_hat[None] > ts[:, None, None, None]  # [K,B,B,B]
        counts = jnp.sum(masks, axis=(1, 2, 3))
        ba = jnp.sum(jnp.where(masks, dt_orig[None], 0.0), axis=(1, 2, 3))
        dt_cand = squared_edt(masks)
        ab = jnp.sum(jnp.where(occ_b[None], dt_cand, 0.0), axis=(1, 2, 3))
        # empty candidate set → AB distance is INF-dominated; clamp later
        return ab, ba, counts

    T = thresholds.shape[0]
    assert T % chunk == 0, f"T={T} must be divisible by chunk={chunk}"
    ab, ba, counts = jax.lax.map(
        per_chunk, thresholds.reshape(T // chunk, chunk)
    )
    ab, ba, counts = ab.ravel(), ba.ravel(), counts.ravel()
    out = _metrics_from_sums(ab, ba, n_orig, counts)
    out["count"] = counts
    return out


def d2_sweep(occ, normals, x_hat, thresholds, chunk=4):
    """Per-threshold D2 (point-to-plane) metrics for one block.

    Reproduces the reference's normal-transfer semantics
    (``pc_metric.py:109-124`` with ``assign_attr`` :8-25): candidate
    normals are the mean of the original normals voting for them (via the
    original→candidate NN), orphans falling back to their own original-NN
    normal. NN identities come from argmin-carrying EDTs; equal-distance
    ties may pick different neighbors than a KD-tree, a deviation the
    reference itself documents for D2 (``pc_metric.py:114``).

    :param occ: [B,B,B] original occupancy.
    :param normals: [B,B,B,3] normals at occupied voxels.
    :param x_hat: [B,B,B] decoded probabilities.
    :return: dict of [T] metric arrays + 'count'.
    """
    from pcc_geo_cnn_v2_tpu.ops.edt import squared_edt_argmin

    B = occ.shape[-1]
    occ_b = jnp.asarray(occ, bool)
    occ_f = jnp.asarray(occ, jnp.float32)
    n_orig = jnp.sum(occ_f)
    coords = jnp.stack(
        [jax.lax.broadcasted_iota(jnp.float32, occ_b.shape, k)
         for k in range(3)], axis=-1)

    # original-side EDT once: candidate→original NN field
    _, nn_o = squared_edt_argmin(occ_b)
    n_at = lambda idx: normals[idx[..., 0], idx[..., 1], idx[..., 2]]
    n_o = n_at(nn_o)  # normal of each voxel's nearest original point
    ba_field = jnp.sum((coords - nn_o) * n_o, axis=-1) ** 2  # [B³]

    flat = lambda idx: (idx[..., 0] * B + idx[..., 1]) * B + idx[..., 2]

    def per_chunk(ts):
        masks = x_hat[None] > ts[:, None, None, None]  # [K,B,B,B]
        counts = jnp.sum(masks, axis=(1, 2, 3))
        ba = jnp.sum(jnp.where(masks, ba_field[None], 0.0), axis=(1, 2, 3))

        _, nn_c = squared_edt_argmin(masks)  # [K,B,B,B,3] orig→cand NN

        def one(mask, nn_ct):
            # transfer normals onto candidates: vote-mean + orphan fallback
            tgt = flat(nn_ct).reshape(-1)
            w = occ_f.reshape(-1)
            cnt = jnp.zeros(B ** 3).at[tgt].add(w)
            sums = jnp.zeros((B ** 3, 3)).at[tgt].add(
                normals.reshape(-1, 3) * w[:, None])
            p2n = jnp.where(
                (cnt > 0)[:, None],
                sums / jnp.maximum(cnt, 1)[:, None],
                n_o.reshape(-1, 3),
            )
            # AB: for each original point, plane distance to its cand NN
            n_eff = p2n[tgt].reshape(B, B, B, 3)
            ab_field = jnp.sum((coords - nn_ct) * n_eff, axis=-1) ** 2
            return jnp.sum(jnp.where(occ_b, ab_field, 0.0))

        ab = jax.vmap(one)(masks, nn_c)
        return ab, ba, counts

    T = thresholds.shape[0]
    assert T % chunk == 0
    ab, ba, counts = jax.lax.map(
        per_chunk, thresholds.reshape(T // chunk, chunk)
    )
    ab, ba, counts = ab.ravel(), ba.ravel(), counts.ravel()
    out = _metrics_from_sums(ab, ba, n_orig, counts, prefix="d2")
    out["count"] = counts
    return out


def _d2_pts_fields(occ_b, ngrid):
    """Per-block original-side D2 fields from ONE carry-EDT.

    Returns (dt_orig, ba_field, of, n_o): the plain squared EDT of the
    original occupancy, the per-voxel candidate→original plane-distance
    field, the carried flat index of each voxel's nearest original, and
    that original's normal. Normals and indices travel THROUGH the
    min-plus passes (``squared_edt_carry``) instead of being gathered
    from a grid at the data-dependent NN indices afterwards — the
    EDT→grid-gather combination kernel-faults real TPUs under nested
    ``lax.map`` (r4 `sweep_bucket` worker crash, bisected in r5; see
    ROUND5_NOTES)."""
    from pcc_geo_cnn_v2_tpu.ops.edt import squared_edt_carry

    B = occ_b.shape[-1]
    shape = occ_b.shape[-3:]
    flat_iota = (
        jax.lax.broadcasted_iota(jnp.float32, shape, 0) * (B * B)
        + jax.lax.broadcasted_iota(jnp.float32, shape, 1) * B
        + jax.lax.broadcasted_iota(jnp.float32, shape, 2)
    )
    dt_orig, (of, onx, ony, onz) = squared_edt_carry(
        occ_b, [flat_iota, ngrid[..., 0], ngrid[..., 1], ngrid[..., 2]]
    )
    n_o = jnp.stack([onx, ony, onz], axis=-1)
    ofi = of.astype(jnp.int32)
    nn_o = jnp.stack(
        [ofi // (B * B), (ofi // B) % B, ofi % B], axis=-1
    ).astype(jnp.float32)
    coords = jnp.stack(
        [jax.lax.broadcasted_iota(jnp.float32, shape, k) for k in range(3)],
        axis=-1)
    ba_field = jnp.sum((coords - nn_o) * n_o, axis=-1) ** 2
    return dt_orig, ba_field, of, n_o


def d2_sweep_pts(occ, pts, nrm, x_hat, thresholds, ngrid=None, band=None,
                 chunk=4, _fields=None):
    """Point-based per-threshold D2 metrics for one block.

    Selection-equivalent to :func:`d2_sweep` but restructured for real
    TPUs: the normal-vote transfer (``pc_metric.assign_attr`` semantics,
    ``/root/reference/src/utils/pc_metric.py:8-25,109-124``) runs over
    the ≤P original-point lists instead of the B³ grid, and original-side
    normals ride the EDT carries (see :func:`_d2_pts_fields`). Dropping
    the reference's orphan fallback is metric-invisible: AB only ever
    queries the normal of a candidate that is some original's NN, and
    every such candidate receives ≥1 vote by construction.

    :param pts: [P, 3] int32 occupied coordinates, rows of -1 padding.
    :param nrm: [P, 3] float32 per-point normals (padding rows ignored).
    :param ngrid: optional [B,B,B,3] voxelized normals (built from
        pts/nrm when absent).
    :param band: None = exact full-grid argmin EDT per threshold
        (pick-identical to :func:`d2_sweep`); an int k = banded EDT,
        exact whenever every original is within k voxels of the
        candidate set (the overwhelming case for trained models);
        unresolved points fall back to their banded point-distance upper
        bound, which can only deflate thresholds that were far from
        optimal anyway.
    :return: dict of [T] d2_* metric arrays + 'count'.
    """
    from pcc_geo_cnn_v2_tpu.ops.edt import (
        banded_squared_edt_argmin,
        squared_edt_argmin,
    )
    from pcc_geo_cnn_v2_tpu.ops.voxel import voxelize_attrs

    B = occ.shape[-1]
    occ_b = jnp.asarray(occ, bool)
    valid = pts[:, 0] >= 0
    vf = valid.astype(jnp.float32)
    n_orig = jnp.sum(vf)
    pts_c = jnp.where(valid[:, None], pts, 0).astype(jnp.int32)
    flat_p = (pts_c[:, 0] * B + pts_c[:, 1]) * B + pts_c[:, 2]
    pts_f = pts_c.astype(jnp.float32)
    if ngrid is None:
        ngrid = voxelize_attrs(pts[None].astype(jnp.int32),
                               nrm[None], B)[0]
    if _fields is None:
        _fields = _d2_pts_fields(occ_b, ngrid)
    _, ba_field, _, _ = _fields

    def per_chunk(ts):
        masks = x_hat[None] > ts[:, None, None, None]  # [K,B,B,B]
        counts = jnp.sum(masks, axis=(1, 2, 3))
        ba = jnp.sum(jnp.where(masks, ba_field[None], 0.0), axis=(1, 2, 3))
        if band is None:
            _, nn = squared_edt_argmin(masks)  # [K,B,B,B,3]
            nnf = ((nn[..., 0] * B + nn[..., 1]) * B + nn[..., 2])
            d_p = None
        else:
            dist, nnf = banded_squared_edt_argmin(masks, band)
            d_p = jnp.take(dist.reshape(len(ts), -1), flat_p, axis=1)
        c_p = jnp.take(nnf.reshape(len(ts), -1), flat_p, axis=1)  # [K,P]

        def one(c_row):
            # vote-mean normal transfer over the point list: original p
            # votes its normal onto its NN candidate; AB then reads the
            # mean at that same candidate (cnt ≥ 1 wherever read)
            cnt = jnp.zeros(B ** 3).at[c_row].add(vf)
            ns = jnp.zeros((B ** 3, 3)).at[c_row].add(vf[:, None] * nrm)
            return (jnp.take(cnt, c_row),
                    jnp.take(ns, c_row, axis=0))

        cnt_at, ns_at = jax.vmap(one)(c_p)  # [K,P], [K,P,3]
        n_eff = ns_at / jnp.maximum(cnt_at, 1.0)[..., None]
        cc = jnp.stack(
            [c_p // (B * B), (c_p // B) % B, c_p % B], axis=-1
        ).astype(jnp.float32)  # [K,P,3] candidate NN coords
        ab_p = jnp.sum((pts_f[None] - cc) * n_eff, axis=-1) ** 2
        if band is not None:
            # beyond the band the NN identity is unresolved: charge the
            # banded point-distance upper bound instead (≥ band², so it
            # can only hurt thresholds that were already far off)
            ab_p = jnp.where(d_p <= float(band * band), ab_p, d_p)
        ab = jnp.sum(ab_p * vf[None], axis=1)
        return ab, ba, counts

    T = thresholds.shape[0]
    assert T % chunk == 0
    ab, ba, counts = jax.lax.map(
        per_chunk, thresholds.reshape(T // chunk, chunk)
    )
    ab, ba, counts = ab.ravel(), ba.ravel(), counts.ravel()
    out = _metrics_from_sums(ab, ba, n_orig, counts, prefix="d2")
    out["count"] = counts
    return out


def _centroid_guard_metric_d2_pts(pts_f, vf, nrm, n_orig, of, n_o, metric):
    """Point-based twin of :func:`_centroid_guard_metric_d2` (same
    values: occupied voxels ≡ valid points)."""
    B = of.shape[-1]
    c = jnp.round(jnp.sum(pts_f * vf[:, None], axis=0) / n_orig)
    n_bar = jnp.sum(nrm * vf[:, None], axis=0) / n_orig
    ab_sum = jnp.sum(vf * jnp.sum((pts_f - c) * n_bar, axis=-1) ** 2)
    ci = jnp.clip(c.astype(jnp.int32), 0, B - 1)
    cflat = (ci[0] * B + ci[1]) * B + ci[2]
    ofi = of.reshape(-1)[cflat].astype(jnp.int32)
    nn_at_c = jnp.stack(
        [ofi // (B * B), (ofi // B) % B, ofi % B]).astype(jnp.float32)
    n_at_c = n_o.reshape(-1, 3)[cflat]
    ba_sum = jnp.sum((c - nn_at_c) * n_at_c) ** 2
    m = _metrics_from_sums(ab_sum, ba_sum, n_orig, jnp.asarray(1),
                           prefix="d2")
    return m[metric]


def _centroid_guard_metric_d2(occ, normals, dt_args, metric):
    """D2 metric of the single centroid point (reference guard with
    normals): all originals vote for the centroid, so its transferred
    normal is the mean original normal."""
    occ_f = jnp.asarray(occ, jnp.float32)
    n = jnp.sum(occ_f)
    B = occ.shape[-1]
    coords = jnp.stack(
        [jax.lax.broadcasted_iota(jnp.float32, occ_f.shape, k)
         for k in range(3)], axis=-1)
    c = jnp.round(jnp.sum(coords * occ_f[..., None], (0, 1, 2)) / n)
    n_bar = jnp.sum(normals * occ_f[..., None], (0, 1, 2)) / n
    ab_sum = jnp.sum(
        jnp.where(occ_f > 0,
                  jnp.sum((coords - c) * n_bar, axis=-1) ** 2, 0.0)
    )
    nn_o, n_o = dt_args  # original-NN field + its normals
    ci = jnp.clip(c.astype(jnp.int32), 0, B - 1)
    nn_at_c = nn_o[ci[0], ci[1], ci[2]].astype(jnp.float32)
    n_at_c = n_o[ci[0], ci[1], ci[2]]
    ba_sum = jnp.sum((c - nn_at_c) * n_at_c) ** 2
    m = _metrics_from_sums(ab_sum, ba_sum, n, jnp.asarray(1), prefix="d2")
    return m[metric]


def _centroid_guard_metric(occ, dt_orig_at, metric):
    """D1 metric of the single centroid point (model_opt.py:60-62)."""
    occ_f = jnp.asarray(occ, jnp.float32)
    n = jnp.sum(occ_f)
    B = occ.shape[-1]
    ii = jnp.arange(B, dtype=jnp.float32)
    coords = jnp.stack(
        jnp.meshgrid(ii, ii, ii, indexing="ij"), axis=-1
    )  # [B,B,B,3]
    s1 = jnp.sum(coords * occ_f[..., None], axis=(0, 1, 2))  # Σp
    s2 = jnp.sum((coords ** 2) * occ_f[..., None], axis=(0, 1, 2))  # Σp²
    c = jnp.round(s1 / n)
    # AB: mean over originals of ||p-c||² = (Σ||p||² - 2cΣp + n||c||²)/n
    ab_sum = jnp.sum(s2) - 2 * jnp.dot(c, s1) + n * jnp.dot(c, c)
    ci = jnp.clip(c.astype(jnp.int32), 0, B - 1)
    ba_sum = dt_orig_at[ci[0], ci[1], ci[2]]
    m = _metrics_from_sums(ab_sum, ba_sum, n, jnp.asarray(1))
    return m[metric]


def _select_from_sweep(sweep, occ, dt_orig, thresholds, opt_metrics,
                       max_deltas, guard_fn=None, n_orig=None):
    """Selection semantics shared by the XLA, Pallas and bucket backends.

    :param guard_fn: metric name → centroid-guard value; defaults to the
        D1 guard over ``dt_orig``.
    :param n_orig: original point count; derived from ``occ`` when absent
        (the bucket backend never materializes an occupancy volume, so it
        passes both ``guard_fn`` and ``n_orig`` and ``occ``/``dt_orig``
        may be None).
    """
    counts = sweep["count"]
    T = thresholds.shape[0]
    max_idx = T - 1
    if n_orig is None:
        n_orig = jnp.sum(jnp.asarray(occ, jnp.float32))

    # eligibility: reference stops at the first empty threshold
    empty = counts == 0
    first_empty = jnp.argmax(
        jnp.concatenate([empty, jnp.array([True])])
    )  # T if none empty
    tidx = jnp.arange(T)
    base_elig = tidx < first_empty
    any_base = jnp.any(base_elig)

    picks = []
    for max_delta in max_deltas:
        if max_delta is None or not np.isfinite(max_delta):
            elig = base_elig
        else:
            ratio = counts / jnp.maximum(n_orig, 1)
            filt = base_elig & (ratio > 1 / max_delta) & (ratio < max_delta)
            elig = jnp.where(jnp.any(filt), filt, base_elig)
        for metric in opt_metrics:
            vals = jnp.where(elig, sweep[metric], INF)
            k = jnp.argmin(vals)  # first minimum, as np.argmin
            best_val = vals[k]
            if guard_fn is not None:
                guard = guard_fn(metric)
            else:
                guard = _centroid_guard_metric(occ, dt_orig, metric)
            pick = jnp.where(best_val > guard, max_idx, k)
            # no eligible threshold at all → max_idx (empty block)
            pick = jnp.where(any_base, pick, max_idx)
            picks.append(pick.astype(jnp.int32))
    return jnp.stack(picks)


def select_thresholds_d1(occ, x_hat, thresholds, opt_metrics=("d1_mse",),
                         max_deltas=(np.inf,), chunk=16):
    """Best threshold index per (max_delta × opt_metric); one block, jittable.

    Exactly mirrors ``utils/threshold.compute_optimal_thresholds`` for
    d1 metrics: returns int32 [len(max_deltas) * len(opt_metrics)].
    """
    for m in opt_metrics:
        assert m in D1_METRICS, f"{m} not supported on device"
    sweep = d1_sweep(occ, x_hat, thresholds, chunk=chunk)
    dt_orig = squared_edt(jnp.asarray(occ, bool))
    return _select_from_sweep(sweep, occ, dt_orig, thresholds, opt_metrics,
                              max_deltas)


def select_thresholds_device(occ, x_hat, thresholds, normals=None,
                             opt_metrics=("d1_mse",), max_deltas=(np.inf,),
                             chunk_d1=16, chunk_d2=4):
    """Best threshold per (max_delta × opt_metric), d1 and/or d2 metrics.

    One block, jittable; d2_* metrics require ``normals`` [B,B,B,3].
    Selection order matches ``utils/threshold.compute_optimal_thresholds``.
    """
    need_d2 = [m for m in opt_metrics if m.startswith("d2")]
    for m in opt_metrics:
        assert m in D1_METRICS + D2_METRICS, m
    if need_d2:
        assert normals is not None, "d2 metrics need normals"
    sweep = d1_sweep(occ, x_hat, thresholds, chunk=chunk_d1)
    dt_orig = squared_edt(jnp.asarray(occ, bool))
    guard_args_d2 = None
    if need_d2:
        sweep.update(d2_sweep(occ, normals, x_hat, thresholds,
                              chunk=chunk_d2))
        from pcc_geo_cnn_v2_tpu.ops.edt import squared_edt_argmin

        _, nn_o = squared_edt_argmin(jnp.asarray(occ, bool))
        n_o = normals[nn_o[..., 0], nn_o[..., 1], nn_o[..., 2]]
        guard_args_d2 = (nn_o, n_o)

    def guard_fn(metric):
        if metric.startswith("d2"):
            return _centroid_guard_metric_d2(occ, normals, guard_args_d2,
                                             metric)
        return _centroid_guard_metric(occ, dt_orig, metric)

    return _select_from_sweep(sweep, occ, dt_orig, thresholds, opt_metrics,
                              max_deltas, guard_fn=guard_fn)


def select_thresholds_device_pts(occ, x_hat, thresholds, pts, nrm,
                                 opt_metrics=("d1_mse",),
                                 max_deltas=(np.inf,), band=None,
                                 chunk_d1=16, chunk_d2=4):
    """Best threshold per (max_delta × opt_metric), d1 and/or d2, from
    the per-point normal lists the encoder already holds.

    TPU-safe replacement for :func:`select_thresholds_device` with
    normals (see :func:`d2_sweep_pts`); with ``band=None`` the picks are
    identical up to float-summation order in the normal votes. One
    block, jittable.
    """
    need_d2 = [m for m in opt_metrics if m.startswith("d2")]
    for m in opt_metrics:
        assert m in D1_METRICS + D2_METRICS, m
    from pcc_geo_cnn_v2_tpu.ops.voxel import voxelize_attrs

    occ_b = jnp.asarray(occ, bool)
    B = occ.shape[-1]
    sweep = d1_sweep(occ, x_hat, thresholds, chunk=chunk_d1)
    valid = pts[:, 0] >= 0
    vf = valid.astype(jnp.float32)
    n_orig = jnp.sum(vf)
    pts_f = jnp.where(valid[:, None], pts, 0).astype(jnp.float32)
    ngrid = voxelize_attrs(pts[None].astype(jnp.int32), nrm[None], B)[0]
    fields = _d2_pts_fields(occ_b, ngrid)
    dt_orig, _, of, n_o = fields
    if need_d2:
        sweep.update(d2_sweep_pts(occ, pts, nrm, x_hat, thresholds,
                                  ngrid=ngrid, band=band, chunk=chunk_d2,
                                  _fields=fields))

    def guard_fn(metric):
        if metric.startswith("d2"):
            return _centroid_guard_metric_d2_pts(pts_f, vf, nrm, n_orig,
                                                 of, n_o, metric)
        return _centroid_guard_metric(occ, dt_orig, metric)

    return _select_from_sweep(sweep, occ, dt_orig, thresholds, opt_metrics,
                              max_deltas, guard_fn=guard_fn)


def select_thresholds_d1_pallas(occ_batch, x_hat_batch, thresholds,
                                opt_metrics=("d1_mse",),
                                max_deltas=(np.inf,), chunk=8,
                                interpret=False, pts=None):
    """Batched selection using the Pallas sweep kernel backend.

    Identical picks to :func:`select_thresholds_d1_batch`; far less HBM
    traffic (see ``ops/pallas_sweep.py``). Passing ``pts`` (the packed
    occupied-voxel lists the encoder already holds) moves sparse-tail
    thresholds onto the prefix-min path — much faster on real model
    output.
    """
    from pcc_geo_cnn_v2_tpu.ops.pallas_sweep import d1_sweep_sums_pallas

    for m in opt_metrics:
        assert m in D1_METRICS, f"{m} not supported on device"
    ab, ba, cnt, dt_orig = d1_sweep_sums_pallas(
        x_hat_batch, occ_batch, thresholds, chunk=chunk, interpret=interpret,
        pts=pts,
    )
    n_orig = jnp.sum(jnp.asarray(occ_batch, jnp.float32), axis=(1, 2, 3))

    def per_block(ab_b, ba_b, cnt_b, n_b, occ_b, dt_b):
        sweep = _metrics_from_sums(ab_b, ba_b, n_b, cnt_b)
        sweep["count"] = cnt_b
        return _select_from_sweep(sweep, occ_b, dt_b, thresholds,
                                  opt_metrics, max_deltas)

    return jax.vmap(per_block)(ab, ba, cnt, n_orig, occ_batch, dt_orig)


def select_thresholds_d1_batch(occ_batch, x_hat_batch, thresholds,
                               opt_metrics=("d1_mse",), max_deltas=(np.inf,),
                               chunk=16):
    """Sequential-over-blocks batch wrapper (each block's sweep is already
    a large batched computation; lax.map bounds peak memory)."""
    fn = functools.partial(
        select_thresholds_d1, thresholds=thresholds,
        opt_metrics=tuple(opt_metrics), max_deltas=tuple(max_deltas),
        chunk=chunk,
    )
    return jax.lax.map(lambda args: fn(args[0], args[1]),
                       (occ_batch, x_hat_batch))
