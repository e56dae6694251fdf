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

__all__ = ["d1_sweep", "d2_sweep", "select_thresholds_d1", "D1_METRICS",
           "D2_METRICS"]

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
