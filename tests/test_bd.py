"""BD metrics vs the reference implementation (oracle) and analytic cases."""

import numpy as np

from pcc_geo_cnn_v2_tpu.utils.bd import bdrate, bdsnr
from conftest import reference_module


def exp_x(arr):
    return [(np.exp(x), y) for x, y in arr]


def test_analytic_cases():
    # +1 dB everywhere
    a = exp_x([[1.0, 1.0], [2.0, 2.0], [3.0, 2.0]])
    b = exp_x([[1.0, 2.0], [2.0, 3.0], [3.0, 3.0]])
    assert abs(bdsnr(a, b, pchip=False) - 1.0) < 1e-8
    assert abs(bdsnr(a, b, pchip=True) - 1.0) < 1e-8
    # double rate at same quality = +100%
    c = [[1.0, 1.0], [2.0, 2.0]]
    d = [[2.0, 1.0], [4.0, 2.0]]
    assert abs(bdrate(c, d, pchip=True) - 100.0) < 1e-6
    # saw-tooth: pchip handles what cubic fit can't
    saw = exp_x([[1.0, 2.0], [2.0, 3.0], [3.0, 2.0], [4.0, 3.0], [5.0, 2.0]])
    flat = exp_x([[1.0, 2.0], [2.0, 2.0], [3.0, 2.0], [4.0, 2.0], [5.0, 2.0]])
    assert abs(bdsnr(saw, flat, pchip=True) - (-0.583)) < 5e-3


def test_matches_reference_oracle():
    ref = reference_module("utils.bd")
    rng = np.random.default_rng(0)
    for trial in range(5):
        rates1 = np.sort(rng.uniform(0.1, 1.0, 5))
        rates2 = np.sort(rng.uniform(0.1, 1.0, 5))
        psnr1 = np.sort(rng.uniform(60, 75, 5))
        psnr2 = np.sort(rng.uniform(60, 75, 5))
        s1 = list(zip(rates1, psnr1))
        s2 = list(zip(rates2, psnr2))
        for pchip in (True, False):
            np.testing.assert_allclose(
                bdsnr(s1, s2, pchip=pchip), ref.bdsnr(s1, s2, pchip=pchip),
                rtol=1e-9, err_msg=f"bdsnr trial {trial} pchip={pchip}",
            )
            np.testing.assert_allclose(
                bdrate(s1, s2, pchip=pchip), ref.bdrate(s1, s2, pchip=pchip),
                rtol=1e-9, err_msg=f"bdrate trial {trial} pchip={pchip}",
            )


def test_reference_baseline_numbers_reproduce():
    """Recompute the headline BD-PSNR (c6 vs trisoup, D1) from data.csv
    and check it against BASELINE.md's +5.50 dB."""
    import csv

    rows = []
    with open("/root/reference/data.csv") as f:
        for row in csv.DictReader(f):
            rows.append(row)

    def curve(mode_id, eval_id, metric):
        out = {}
        for r in rows:
            if (r["mode_id"] == mode_id and r["eval_id"] == eval_id
                    and r["metric"] == metric):
                out.setdefault(r["pc_name"], []).append(
                    (float(r["x"]), float(r["y"]))
                )
        return out

    ours = curve("c4-ws", "main", "d1_psnr")
    anchor = curve("trisoup-predlift/lossy-geom-lossy-attrs", "main",
                   "d1_psnr")
    # bd_ignore c4-ws/1e-05 (ev_experiment.yml:115): drop the lowest-rate pt
    deltas = []
    for pc in ours:
        pts = sorted(ours[pc])[1:]
        deltas.append(bdsnr(anchor[pc], pts, pchip=True))
    assert abs(np.mean(deltas) - 5.50) < 0.1, np.mean(deltas)


def test_bd_degenerate_inputs_raise():
    """Single-point or disjoint curves must raise, not report a fake 0.0
    (a one-λ smoke run once printed BD=0.0 against the reference)."""
    import pytest

    from pcc_geo_cnn_v2_tpu.utils.bd import bdrate, bdsnr

    two = [(0.2, 60.0), (0.6, 66.0)]
    with pytest.raises(ValueError):
        bdsnr(two, [(0.4, 63.0)])
    with pytest.raises(ValueError):
        bdrate([(0.4, 63.0)], two)
    disjoint = [(5.0, 80.0), (9.0, 85.0)]
    with pytest.raises(ValueError):
        bdsnr(two, disjoint)
