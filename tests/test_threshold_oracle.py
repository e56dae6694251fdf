"""Golden parity: our host threshold optimizer vs the reference's
``model_opt.compute_optimal_thresholds`` (imported from the read-only
reference repo as a pure-numpy oracle; pyntcloud/numba stubbed)."""

import sys
import types

import numpy as np
import pytest

from pcc_geo_cnn_v2_tpu.utils.threshold import compute_optimal_thresholds
from conftest import REFERENCE_SRC


@pytest.fixture(scope="module")
def ref_model_opt():
    fake = types.ModuleType("pyntcloud")
    fake.PyntCloud = object
    sys.modules.setdefault("pyntcloud", fake)
    numba = types.ModuleType("numba")
    numba.njit = lambda f=None, **kw: (f if callable(f)
                                       else (lambda g: g))
    sys.modules.setdefault("numba", numba)
    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))
    import model_opt

    # the reference targets scipy<1.6 (`n_jobs`); shim to `workers`
    from scipy.spatial import cKDTree

    class _KD(cKDTree):
        def query(self, x, *a, n_jobs=None, **kw):
            if n_jobs is not None:
                kw["workers"] = n_jobs
            return super().query(x, *a, **kw)

    import utils.pc_metric as ref_pc_metric

    ref_pc_metric.cKDTree = _KD
    model_opt.cKDTree = _KD
    return model_opt


def _case(seed, size=16, n=150, peaked=True):
    rng = np.random.default_rng(seed)
    pts = np.unique(rng.integers(0, size, (n, 3)).astype(np.float64), axis=0)
    x_hat = rng.uniform(0, 1, (size, size, size)).astype(np.float64)
    if peaked:  # concentrate probability mass near the points
        x_hat *= 0.3
        x_hat[tuple(pts.astype(int).T)] = rng.uniform(
            0.5, 1.0, len(pts))
    return pts, x_hat


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("opt_metrics,max_deltas", [
    (["d1_mse"], [np.inf]),
    (["d1_mse", "d1_mse_BA"], [np.inf, 3.0]),
    (["d1_sum_max"], [2.0]),
])
def test_matches_reference_selection(ref_model_opt, seed, opt_metrics,
                                     max_deltas):
    pts, x_hat = _case(seed)
    thr = np.linspace(0, 1.0, 64)
    want_names, want = ref_model_opt.compute_optimal_thresholds(
        pts, x_hat, thr, resolution=16, normals=None,
        opt_metrics=list(opt_metrics), max_deltas=list(max_deltas),
    )
    got_names, got = compute_optimal_thresholds(
        pts, x_hat, thr, 16, normals=None, opt_metrics=opt_metrics,
        max_deltas=max_deltas,
    )
    assert list(got_names) == list(want_names)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_matches_reference_d2(ref_model_opt):
    rng = np.random.default_rng(7)
    pts, x_hat = _case(7)
    normals = rng.normal(size=(len(pts), 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    thr = np.linspace(0, 1.0, 32)
    want_names, want = ref_model_opt.compute_optimal_thresholds(
        pts, x_hat, thr, resolution=16, normals=normals,
        opt_metrics=["d1_mse", "d2_mse"], max_deltas=[np.inf],
    )
    got_names, got = compute_optimal_thresholds(
        pts, x_hat, thr, 16, normals=normals,
        opt_metrics=["d1_mse", "d2_mse"], max_deltas=[np.inf],
    )
    assert list(got_names) == list(want_names)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_matches_reference_fixed_threshold(ref_model_opt):
    pts, x_hat = _case(9)
    thr = np.linspace(0, 1.0, 64)
    want_names, want = ref_model_opt.compute_optimal_thresholds(
        pts, x_hat, thr, resolution=16, opt_metrics=["d1_mse"],
        max_deltas=[np.inf], fixed_threshold=True,
    )
    got_names, got = compute_optimal_thresholds(
        pts, x_hat, thr, 16, opt_metrics=["d1_mse"], max_deltas=[np.inf],
        fixed_threshold=True,
    )
    assert list(got_names) == list(want_names)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_compute_metrics_matches_reference(ref_model_opt):
    """utils.metrics.compute_metrics vs the reference's pc_metric oracle
    (D1 exact; D2 via the same normal-transfer vote)."""
    import utils.pc_metric as ref_pc_metric

    from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics

    rng = np.random.default_rng(3)
    p1 = np.unique(rng.integers(0, 64, (500, 3)).astype(np.float64), axis=0)
    p2 = np.unique(
        np.clip(np.round(p1 + rng.normal(0, 1.2, p1.shape)), 0, 63), axis=0
    )
    n1 = rng.normal(size=(len(p1), 3))
    n1 /= np.linalg.norm(n1, axis=1, keepdims=True)
    want = ref_pc_metric.compute_metrics(p1, p2, 63, p1_n=n1)
    got = compute_metrics(p1, p2, 63, p1_n=n1)
    for key in ("d1_sum_AB", "d1_sum_BA", "d1_mse", "d1_psnr"):
        np.testing.assert_allclose(got[key], want[key], rtol=0,
                                   err_msg=key)
    for key in ("d2_sum_AB", "d2_sum_BA", "d2_mse", "d2_psnr"):
        np.testing.assert_allclose(got[key], want[key], rtol=1e-9,
                                   err_msg=key)
