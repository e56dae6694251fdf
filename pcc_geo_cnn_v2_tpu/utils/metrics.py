"""Host-side D1 (point-to-point) / D2 (point-to-plane) geometry metrics.

Semantics mirror the reference's ``src/utils/pc_metric.py`` (symmetric
max/min convention matching mpeg-pcc-dmetric, PSNR peak energy 3r²,
NN-vote normal transfer) so threshold selection and reports are
RD-comparable. The numba ``assign_attr`` hot loop (``pc_metric.py:8-25``)
becomes a vectorized ``np.add.at`` scatter; KD-trees stay on host
(scipy) for full clouds — the in-loop per-block path has an on-device
EDT-based twin in ``ops/``.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

__all__ = [
    "assign_attr",
    "compute_metrics",
    "psnr",
    "avail_opt_metrics",
    "validate_opt_metrics",
]

# d1_*/d2_* interleaved, same set as the reference (pc_metric.py:57-58)
avail_opt_metrics = [
    y
    for x in zip(
        *[
            (f"d1_{m}", f"d2_{m}")
            for m in ["sum_AB", "sum_BA", "sum_max", "sum_mean",
                      "mse_AB", "mse_BA", "mse"]
        ]
    )
    for y in x
]


def validate_opt_metrics(opt_metrics, with_normals=False):
    for m in opt_metrics:
        assert m in avail_opt_metrics, f"{m} not in {avail_opt_metrics}"
        if not with_normals:
            assert not m.startswith("d2"), f"{m} needs normals"


def psnr(mse, max_energy):
    if np.ndim(mse) == 0 and mse == 0:
        return np.inf  # perfect reconstruction (numpy would warn-and-inf)
    return 10 * np.log10(max_energy / mse)


def assign_attr(attr1, idx1, idx2):
    """Transfer attributes from set 1 to set 2 by NN voting.

    :param attr1: [N1, A] attributes on set 1.
    :param idx1: [N2] NN index of each set-2 point within set 1.
    :param idx2: [N1] NN index of each set-1 point within set 2.
    :return: [N2, A] averaged attributes (set-1 points vote at their NN in
        set 2; orphan set-2 points take their own NN's attribute).
    """
    n2 = idx1.shape[0]
    counts = np.zeros(n2)
    sums = np.zeros((n2, attr1.shape[1]))
    np.add.at(counts, idx2, 1.0)
    np.add.at(sums, idx2, attr1)
    orphan = counts == 0
    counts[orphan] = 1.0
    sums[orphan] = attr1[idx1[orphan]]
    return sums / counts[:, None]


def _d1_sums(a, b_of_a):
    return float(np.sum((a - b_of_a) ** 2))


def _d2_sums(a, b_of_a, n_of_a):
    return float(np.sum(np.sum((a - b_of_a) * n_of_a, axis=1) ** 2))


def compute_metrics(p1, p2, r, p1_n=None, t1=None):
    """Full symmetric D1 (and D2 when normals given) metric dict.

    :param p1: [N1, 3] reference points.
    :param p2: [N2, 3] candidate points.
    :param r: peak value (resolution - 1); PSNR peak energy is 3r².
    :param p1_n: optional [N1, 3] normals on p1 (enables d2_*).
    :param t1: optional prebuilt cKDTree over p1.
    """
    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)
    if len(p1) == 0 or len(p2) == 0:
        # degenerate cloud (e.g. an untrained/diverged model decoding to
        # nothing): report unusable quality instead of crashing — the
        # reference scores empty candidates -inf (model_types.py:128-176)
        keys = ["d1"] + (["d2"] if p1_n is not None else [])
        out = {}
        for k in keys:
            for s in ("sum_AB", "sum_BA", "sum_max", "sum_mean",
                      "mse_AB", "mse_BA", "mse"):
                out[f"{k}_{s}"] = np.inf
            for s in ("psnr_AB", "psnr_BA", "psnr"):
                out[f"{k}_{s}"] = -np.inf
        return out
    if t1 is None:
        t1 = cKDTree(p1, balanced_tree=False)
    t2 = cKDTree(p2, balanced_tree=False)
    _, idx2 = t2.query(p1, workers=-1)  # NN of p1 in p2
    _, idx1 = t1.query(p2, workers=-1)  # NN of p2 in p1

    max_energy = 3.0 * r * r
    p1_ngb = p2[idx2]
    p2_ngb = p1[idx1]
    d1_sum_ab = _d1_sums(p1, p1_ngb)
    d1_sum_ba = _d1_sums(p2, p2_ngb)
    d1_mse_ab = d1_sum_ab / p1.shape[0]
    d1_mse_ba = d1_sum_ba / p2.shape[0]
    metrics = {
        "d1_sum_AB": d1_sum_ab,
        "d1_sum_BA": d1_sum_ba,
        "d1_sum_max": max(d1_sum_ab, d1_sum_ba),
        "d1_sum_mean": (d1_sum_ab + d1_sum_ba) / 2,
        "d1_mse_AB": d1_mse_ab,
        "d1_mse_BA": d1_mse_ba,
        "d1_mse": max(d1_mse_ab, d1_mse_ba),
        "d1_psnr_AB": psnr(d1_mse_ab, max_energy),
        "d1_psnr_BA": psnr(d1_mse_ba, max_energy),
        "d1_psnr": min(psnr(d1_mse_ab, max_energy), psnr(d1_mse_ba, max_energy)),
    }
    if p1_n is not None:
        p1_n = np.asarray(p1_n, np.float64)
        p2_n = assign_attr(p1_n, idx1, idx2)
        d2_sum_ab = _d2_sums(p1, p1_ngb, p2_n[idx2])
        d2_sum_ba = _d2_sums(p2, p2_ngb, p1_n[idx1])
        d2_mse_ab = d2_sum_ab / p1.shape[0]
        d2_mse_ba = d2_sum_ba / p2.shape[0]
        metrics.update(
            {
                "d2_sum_AB": d2_sum_ab,
                "d2_sum_BA": d2_sum_ba,
                "d2_sum_max": max(d2_sum_ab, d2_sum_ba),
                "d2_sum_mean": (d2_sum_ab + d2_sum_ba) / 2,
                "d2_mse_AB": d2_mse_ab,
                "d2_mse_BA": d2_mse_ba,
                "d2_mse": max(d2_mse_ab, d2_mse_ba),
                "d2_psnr_AB": psnr(d2_mse_ab, max_energy),
                "d2_psnr_BA": psnr(d2_mse_ba, max_energy),
                "d2_psnr": min(
                    psnr(d2_mse_ab, max_energy), psnr(d2_mse_ba, max_energy)
                ),
            }
        )
    return metrics
