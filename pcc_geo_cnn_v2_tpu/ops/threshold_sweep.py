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

__all__ = ["d1_sweep", "select_thresholds_d1", "D1_METRICS"]

D1_METRICS = ("d1_sum_AB", "d1_sum_BA", "d1_sum_max", "d1_sum_mean",
              "d1_mse_AB", "d1_mse_BA", "d1_mse")


def _metrics_from_sums(ab_sum, ba_sum, n_orig, n_cand):
    """All 7 d1_* metrics from directional sums and counts (broadcasts)."""
    safe_cand = jnp.maximum(n_cand, 1)
    mse_ab = ab_sum / n_orig
    mse_ba = jnp.where(n_cand > 0, ba_sum / safe_cand, INF)
    return {
        "d1_sum_AB": ab_sum,
        "d1_sum_BA": ba_sum,
        "d1_sum_max": jnp.maximum(ab_sum, ba_sum),
        "d1_sum_mean": (ab_sum + ba_sum) / 2,
        "d1_mse_AB": mse_ab,
        "d1_mse_BA": mse_ba,
        "d1_mse": jnp.maximum(mse_ab, mse_ba),
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
                       max_deltas):
    """Selection semantics shared by the XLA and Pallas sweep backends."""
    counts = sweep["count"]
    T = thresholds.shape[0]
    max_idx = T - 1
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


def select_thresholds_d1_pallas(occ_batch, x_hat_batch, thresholds,
                                opt_metrics=("d1_mse",),
                                max_deltas=(np.inf,), chunk=8,
                                interpret=False):
    """Batched selection using the Pallas sweep kernel backend.

    Identical picks to :func:`select_thresholds_d1_batch`; far less HBM
    traffic (see ``ops/pallas_sweep.py``).
    """
    from pcc_geo_cnn_v2_tpu.ops.pallas_sweep import d1_sweep_sums_pallas

    for m in opt_metrics:
        assert m in D1_METRICS, f"{m} not supported on device"
    ab, ba, cnt, dt_orig = d1_sweep_sums_pallas(
        x_hat_batch, occ_batch, thresholds, chunk=chunk, interpret=interpret
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
