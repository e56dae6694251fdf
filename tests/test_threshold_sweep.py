"""On-device EDT + threshold sweep vs the exact host path (selection parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcc_geo_cnn_v2_tpu.ops.edt import squared_edt
from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import (
    d1_sweep,
    select_thresholds_d1,
    select_thresholds_d1_batch,
)
from pcc_geo_cnn_v2_tpu.utils.threshold import compute_optimal_thresholds

B = 16
T = 64


def _brute_edt(occ):
    pts = np.argwhere(occ)
    out = np.full(occ.shape, 1e12, np.float64)
    if len(pts) == 0:
        return out
    grid = np.argwhere(np.ones_like(occ))
    d = ((grid[:, None, :] - pts[None, :, :]) ** 2).sum(-1).min(1)
    return d.reshape(occ.shape)


def test_squared_edt_exact():
    rng = np.random.default_rng(0)
    occ = rng.random((8, 8, 8)) < 0.05
    occ[0, 0, 0] = True  # ensure nonempty
    mine = np.asarray(squared_edt(jnp.asarray(occ)))
    np.testing.assert_array_equal(mine, _brute_edt(occ))


def test_squared_edt_batched_and_empty():
    rng = np.random.default_rng(1)
    occ = rng.random((3, 8, 8, 8)) < 0.04
    occ[1] = False  # empty grid
    out = np.asarray(squared_edt(jnp.asarray(occ)))
    for i in (0, 2):
        np.testing.assert_array_equal(out[i], _brute_edt(occ[i]))
    assert (out[1] >= 1e11).all()


def _case(seed, lift=0.0):
    """Random block + smooth-ish probability field correlated with it."""
    rng = np.random.default_rng(seed)
    pts = np.unique(rng.integers(0, B, (rng.integers(30, 300), 3)), axis=0)
    occ = np.zeros((B, B, B), np.float32)
    occ[pts[:, 0], pts[:, 1], pts[:, 2]] = 1.0
    noise = rng.random((B, B, B)).astype(np.float32)
    x_hat = np.clip(0.65 * occ + 0.35 * noise + lift, 0.0, 1.0)
    return pts.astype(np.float64), occ, x_hat


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("opt_metrics", [("d1_mse",),
                                         ("d1_mse", "d1_mse_BA", "d1_sum_max")])
@pytest.mark.parametrize("max_deltas", [(np.inf,), (np.inf, 3.0)])
def test_selection_parity_with_host(seed, opt_metrics, max_deltas):
    pts, occ, x_hat = _case(seed)
    thresholds = np.linspace(0, 1.0, T)
    _, host_pick = compute_optimal_thresholds(
        pts, x_hat, thresholds, B, opt_metrics=opt_metrics,
        max_deltas=max_deltas,
    )
    dev_pick = np.asarray(
        jax.jit(
            lambda o, x: select_thresholds_d1(
                o, x, jnp.asarray(thresholds, jnp.float32),
                opt_metrics=opt_metrics, max_deltas=max_deltas,
            )
        )(jnp.asarray(occ), jnp.asarray(x_hat))
    )
    assert list(dev_pick) == list(host_pick), (
        f"device {list(dev_pick)} vs host {host_pick}"
    )


def test_selection_parity_degenerate_all_below():
    """x_hat never exceeds threshold 0 → empty everywhere → max_idx."""
    pts, occ, _ = _case(7)
    x_hat = np.zeros((B, B, B), np.float32)
    thresholds = np.linspace(0, 1.0, T)
    _, host_pick = compute_optimal_thresholds(pts, x_hat, thresholds, B)
    dev_pick = np.asarray(
        select_thresholds_d1(jnp.asarray(occ), jnp.asarray(x_hat),
                             jnp.asarray(thresholds, jnp.float32))
    )
    assert list(dev_pick) == list(host_pick) == [T - 1]


def test_batch_wrapper_matches_single():
    thresholds = jnp.asarray(np.linspace(0, 1.0, T), jnp.float32)
    occs, xhats, singles = [], [], []
    for seed in range(3):
        _, occ, x_hat = _case(seed + 10)
        occs.append(occ)
        xhats.append(x_hat)
        singles.append(
            np.asarray(select_thresholds_d1(jnp.asarray(occ),
                                            jnp.asarray(x_hat), thresholds))
        )
    batch = np.asarray(
        select_thresholds_d1_batch(jnp.asarray(np.stack(occs)),
                                   jnp.asarray(np.stack(xhats)), thresholds)
    )
    np.testing.assert_array_equal(batch, np.stack(singles))


def test_sweep_metrics_match_host_values():
    """Spot-check sweep metric values against scipy KD metrics."""
    from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics

    pts, occ, x_hat = _case(20)
    thresholds = np.linspace(0, 1.0, T)
    sweep = jax.tree_util.tree_map(
        np.asarray,
        d1_sweep(jnp.asarray(occ), jnp.asarray(x_hat),
                 jnp.asarray(thresholds, jnp.float32)),
    )
    for t_idx in (0, 10, 30):
        cand = np.argwhere(x_hat > thresholds[t_idx]).astype(np.float64)
        if len(cand) == 0:
            continue
        ref = compute_metrics(pts, cand, B - 1)
        for key in ("d1_sum_AB", "d1_sum_BA", "d1_mse", "d1_mse_AB"):
            np.testing.assert_allclose(sweep[key][t_idx], ref[key],
                                       rtol=1e-5, err_msg=f"{key}@{t_idx}")


def test_pallas_sweep_matches_xla(monkeypatch):
    """Pallas kernel (interpret mode on CPU) must select identically."""
    from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import (
        select_thresholds_d1_pallas,
    )

    thresholds = jnp.asarray(np.linspace(0, 1.0, T), jnp.float32)
    occs, xhats, singles = [], [], []
    for seed in range(4):
        _, occ, x_hat = _case(seed + 30)
        occs.append(occ)
        xhats.append(x_hat)
        singles.append(
            np.asarray(select_thresholds_d1(
                jnp.asarray(occ), jnp.asarray(x_hat), thresholds,
                opt_metrics=("d1_mse", "d1_mse_BA"),
                max_deltas=(np.inf, 3.0),
            ))
        )
    picks = np.asarray(select_thresholds_d1_pallas(
        jnp.asarray(np.stack(occs)), jnp.asarray(np.stack(xhats)),
        thresholds, opt_metrics=("d1_mse", "d1_mse_BA"),
        max_deltas=(np.inf, 3.0), interpret=True,
    ))
    np.testing.assert_array_equal(picks, np.stack(singles))


def test_pallas_sweep_pts_path_matches_xla(monkeypatch):
    """Sparse-tail prefix-min path (pts given) must select identically."""
    from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import (
        select_thresholds_d1_pallas,
    )

    thresholds = jnp.asarray(np.linspace(0, 1.0, T), jnp.float32)
    occs, xhats, singles = [], [], []
    for seed in range(4):
        _, occ, x_hat = _case(seed + 50)
        occs.append(occ)
        xhats.append(x_hat)
        singles.append(
            np.asarray(select_thresholds_d1(
                jnp.asarray(occ), jnp.asarray(x_hat), thresholds,
                opt_metrics=("d1_mse", "d1_sum_max"),
                max_deltas=(np.inf, 3.0),
            ))
        )
    occ_b = np.stack(occs)
    budget = 1 << int(np.ceil(np.log2(max(int(o.sum()) for o in occ_b))))
    pts = np.full((len(occ_b), budget, 3), -1, np.int32)
    for i, o in enumerate(occ_b):
        c = np.argwhere(o > 0)
        pts[i, : len(c)] = c
    picks = np.asarray(select_thresholds_d1_pallas(
        jnp.asarray(occ_b), jnp.asarray(np.stack(xhats)),
        thresholds, opt_metrics=("d1_mse", "d1_sum_max"),
        max_deltas=(np.inf, 3.0), interpret=True, pts=jnp.asarray(pts),
    ))
    np.testing.assert_array_equal(picks, np.stack(singles))


def test_pallas_sweep_degenerate_empty(monkeypatch):
    from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import (
        select_thresholds_d1_pallas,
    )

    _, occ, _ = _case(31)
    x_hat = np.zeros((B, B, B), np.float32)
    thresholds = jnp.asarray(np.linspace(0, 1.0, T), jnp.float32)
    picks = np.asarray(select_thresholds_d1_pallas(
        jnp.asarray(occ[None]), jnp.asarray(x_hat[None]), thresholds,
        interpret=True,
    ))
    assert picks.tolist() == [[T - 1]]


def test_squared_edt_argmin_exact():
    from pcc_geo_cnn_v2_tpu.ops.edt import squared_edt_argmin

    rng = np.random.default_rng(5)
    occ = rng.random((8, 8, 8)) < 0.06
    occ[2, 3, 4] = True
    dist, nn = jax.tree_util.tree_map(
        np.asarray, squared_edt_argmin(jnp.asarray(occ)))
    np.testing.assert_array_equal(dist, _brute_edt(occ))
    # nn points at an occupied voxel achieving the distance
    grid = np.argwhere(np.ones_like(occ)).reshape(8, 8, 8, 3)
    d_claim = ((grid - nn) ** 2).sum(-1)
    np.testing.assert_array_equal(d_claim, dist)
    assert occ[nn[..., 0], nn[..., 1], nn[..., 2]].all()


def _case_with_normals(seed):
    pts, occ, x_hat = _case(seed)
    rng = np.random.default_rng(seed + 100)
    n = rng.normal(size=(len(pts), 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    grid_n = np.zeros((B, B, B, 3), np.float32)
    ip = pts.astype(int)
    grid_n[ip[:, 0], ip[:, 1], ip[:, 2]] = n
    return pts, n, occ, x_hat, grid_n


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_d2_sweep_values_close_to_host(seed):
    """D2 sweep values match scipy within NN-tie tolerance; exact when no
    equidistant ties (the common case on random data)."""
    from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import d2_sweep
    from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics

    pts, n, occ, x_hat, grid_n = _case_with_normals(seed)
    thresholds = np.linspace(0, 1.0, T)
    sweep = jax.tree_util.tree_map(
        np.asarray,
        d2_sweep(jnp.asarray(occ), jnp.asarray(grid_n), jnp.asarray(x_hat),
                 jnp.asarray(thresholds, jnp.float32)),
    )
    checked = 0
    for t_idx in (0, 8, 24):
        cand = np.argwhere(x_hat > thresholds[t_idx]).astype(np.float64)
        if len(cand) == 0:
            continue
        ref = compute_metrics(pts, cand, B - 1, p1_n=n)
        # BA direction has no transfer ambiguity beyond NN ties
        np.testing.assert_allclose(sweep["d2_sum_BA"][t_idx],
                                   ref["d2_sum_BA"], rtol=0.1)
        np.testing.assert_allclose(sweep["d2_sum_AB"][t_idx],
                                   ref["d2_sum_AB"], rtol=0.15)
        checked += 1
    assert checked >= 2


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mixed_d1_d2_selection_close_to_host(seed):
    """Device d1+d2 selection: d1 picks exact; d2 picks within the
    documented NN-tie deviation (metric value at the device pick must be
    within 2% of the host's best)."""
    from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import (
        select_thresholds_device,
    )
    from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics

    pts, n, occ, x_hat, grid_n = _case_with_normals(seed + 40)
    thresholds = np.linspace(0, 1.0, T)
    _, host_pick = compute_optimal_thresholds(
        pts, x_hat, thresholds, B, normals=n,
        opt_metrics=("d1_mse", "d2_mse"),
    )
    dev_pick = np.asarray(select_thresholds_device(
        jnp.asarray(occ), jnp.asarray(x_hat),
        jnp.asarray(thresholds, jnp.float32), normals=jnp.asarray(grid_n),
        opt_metrics=("d1_mse", "d2_mse"),
    ))
    assert dev_pick[0] == host_pick[0], "d1 pick must be exact"

    def host_d2(t_idx):
        cand = np.argwhere(x_hat > thresholds[t_idx]).astype(np.float64)
        if len(cand) == 0:
            return np.inf
        return compute_metrics(pts, cand, B - 1, p1_n=n)["d2_mse"]

    v_dev, v_host = host_d2(dev_pick[1]), host_d2(host_pick[1])
    assert v_dev <= v_host * 1.02 + 1e-9, (dev_pick, host_pick, v_dev, v_host)


def test_squared_edt_carry_exact():
    """Carried values equal the value at the first-minimum NN voxel."""
    from pcc_geo_cnn_v2_tpu.ops.edt import squared_edt_argmin, squared_edt_carry

    rng = np.random.default_rng(9)
    occ = rng.random((8, 8, 8)) < 0.06
    occ[1, 6, 2] = True
    val = rng.normal(size=(8, 8, 8)).astype(np.float32)
    dist_a, nn = jax.tree_util.tree_map(
        np.asarray, squared_edt_argmin(jnp.asarray(occ)))
    dist_c, (carried,) = jax.tree_util.tree_map(
        np.asarray, squared_edt_carry(jnp.asarray(occ), [jnp.asarray(val)]))
    np.testing.assert_array_equal(dist_c, dist_a)
    np.testing.assert_array_equal(
        carried, val[nn[..., 0], nn[..., 1], nn[..., 2]])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_d2_sweep_pts_matches_grid(seed):
    """Point-based d2 sweep (band=None) ≡ grid d2_sweep (same tie rules):
    both transfer vote-mean normals at each original's first-min NN."""
    from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import d2_sweep, d2_sweep_pts

    pts, n, occ, x_hat, grid_n = _case_with_normals(seed)
    thresholds = jnp.asarray(np.linspace(0, 1.0, T), jnp.float32)
    ref = jax.tree_util.tree_map(
        np.asarray,
        d2_sweep(jnp.asarray(occ), jnp.asarray(grid_n), jnp.asarray(x_hat),
                 thresholds))
    pad = np.full((512, 3), -1, np.int32)
    pad[: len(pts)] = pts.astype(np.int32)
    npad = np.zeros((512, 3), np.float32)
    npad[: len(pts)] = n
    got = jax.tree_util.tree_map(
        np.asarray,
        d2_sweep_pts(jnp.asarray(occ), jnp.asarray(pad), jnp.asarray(npad),
                     jnp.asarray(x_hat), thresholds, band=None))
    np.testing.assert_array_equal(got["count"], ref["count"])
    nz = ref["count"] > 0
    for k in ("d2_sum_AB", "d2_sum_BA", "d2_mse"):
        np.testing.assert_allclose(got[k][nz], ref[k][nz], rtol=2e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_select_pts_matches_select_grid(seed):
    """select_thresholds_device_pts(band=None) picks ≡ the r4-validated
    grid path (same EDT tie conventions end to end)."""
    from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import (
        select_thresholds_device,
        select_thresholds_device_pts,
    )

    pts, n, occ, x_hat, grid_n = _case_with_normals(seed + 40)
    thresholds = jnp.asarray(np.linspace(0, 1.0, T), jnp.float32)
    oms = ("d1_mse", "d2_mse", "d2_mse_BA")
    mds = (np.inf, 1.5)
    grid_pick = np.asarray(select_thresholds_device(
        jnp.asarray(occ), jnp.asarray(x_hat), thresholds,
        normals=jnp.asarray(grid_n), opt_metrics=oms, max_deltas=mds))
    pad = np.full((512, 3), -1, np.int32)
    pad[: len(pts)] = pts.astype(np.int32)
    npad = np.zeros((512, 3), np.float32)
    npad[: len(pts)] = n
    pts_pick = np.asarray(select_thresholds_device_pts(
        jnp.asarray(occ), jnp.asarray(x_hat), thresholds, jnp.asarray(pad),
        jnp.asarray(npad), opt_metrics=oms, max_deltas=mds, band=None))
    np.testing.assert_array_equal(pts_pick, grid_pick)
