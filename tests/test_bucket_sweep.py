"""Bucket-ordered sweep vs the exact XLA backend (sums + selection parity).

The bucket backend (``ops/bucket_sweep.py``) must pick identical
thresholds to ``select_thresholds_d1`` wherever its candidate budget K
holds, and must flag (never silently mis-select) blocks that overflow it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcc_geo_cnn_v2_tpu.ops.bucket_sweep import (
    bucket_sweep_sums,
    select_thresholds_d1_bucket,
)
from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import (
    d1_sweep,
    select_thresholds_d1,
)

B = 16
T = 64


def _case(seed, lift=0.0):
    rng = np.random.default_rng(seed)
    pts = np.unique(rng.integers(0, B, (rng.integers(30, 300), 3)), axis=0)
    occ = np.zeros((B, B, B), np.float32)
    occ[pts[:, 0], pts[:, 1], pts[:, 2]] = 1.0
    noise = rng.random((B, B, B)).astype(np.float32)
    x_hat = np.clip(0.65 * occ + 0.35 * noise + lift, 0.0, 1.0)
    return pts.astype(np.float64), occ, x_hat


def _pack(occs, budget=512):
    pts = np.full((len(occs), budget, 3), -1, np.int32)
    for i, o in enumerate(occs):
        c = np.argwhere(o > 0)
        pts[i, : len(c)] = c
    return pts


def test_bucket_sums_match_xla_sweep():
    """ab/ba/count parity vs the exact per-threshold XLA sweep."""
    thresholds = np.linspace(0, 1.0, T)
    occs, xhats = [], []
    for seed in range(3):
        _, occ, x_hat = _case(seed)
        occs.append(occ)
        xhats.append(x_hat)
    pts = _pack(occs)
    ab, ba, cnt, overflow = jax.tree_util.tree_map(
        np.asarray,
        bucket_sweep_sums(
            jnp.asarray(np.stack(xhats)), jnp.asarray(pts),
            jnp.asarray(thresholds, jnp.float32),
            K=4096, kc=256, pc=64, interpret=True,
        ),
    )
    assert not overflow.any()
    for i in range(3):
        ref = jax.tree_util.tree_map(
            np.asarray,
            d1_sweep(jnp.asarray(occs[i]), jnp.asarray(xhats[i]),
                     jnp.asarray(thresholds, jnp.float32)),
        )
        np.testing.assert_array_equal(cnt[i], ref["count"])
        nz = ref["count"] > 0
        # f32 accumulation order differs between backends: rtol, not atol
        np.testing.assert_allclose(ab[i][nz], ref["d1_sum_AB"][nz],
                                   rtol=1e-5)
        np.testing.assert_allclose(ba[i][nz], ref["d1_sum_BA"][nz],
                                   rtol=1e-5)


@pytest.mark.parametrize("opt_metrics", [("d1_mse",),
                                         ("d1_mse", "d1_mse_BA",
                                          "d1_sum_max")])
@pytest.mark.parametrize("max_deltas", [(np.inf,), (np.inf, 3.0)])
def test_bucket_selection_parity(opt_metrics, max_deltas):
    thresholds = jnp.asarray(np.linspace(0, 1.0, T), jnp.float32)
    occs, xhats, singles = [], [], []
    for seed in range(4):
        _, occ, x_hat = _case(seed + 30)
        occs.append(occ)
        xhats.append(x_hat)
        singles.append(
            np.asarray(select_thresholds_d1(
                jnp.asarray(occ), jnp.asarray(x_hat), thresholds,
                opt_metrics=opt_metrics, max_deltas=max_deltas,
            ))
        )
    pts = _pack(occs)
    picks, overflow = select_thresholds_d1_bucket(
        jnp.asarray(np.stack(xhats)), jnp.asarray(pts), thresholds,
        opt_metrics=opt_metrics, max_deltas=max_deltas,
        K=4096, interpret=True,
    )
    assert not np.asarray(overflow).any()
    np.testing.assert_array_equal(np.asarray(picks), np.stack(singles))


def test_bucket_selection_sparse_probabilities():
    """Mostly-zero x_hat (thin candidate sets, empty tail thresholds)."""
    thresholds = jnp.asarray(np.linspace(0, 1.0, T), jnp.float32)
    occs, xhats, singles = [], [], []
    for seed in range(3):
        _, occ, x_hat = _case(seed + 60)
        x_hat = np.where(x_hat > 0.55, x_hat, 0.0).astype(np.float32)
        occs.append(occ)
        xhats.append(x_hat)
        singles.append(
            np.asarray(select_thresholds_d1(
                jnp.asarray(occ), jnp.asarray(x_hat), thresholds))
        )
    pts = _pack(occs)
    picks, overflow = select_thresholds_d1_bucket(
        jnp.asarray(np.stack(xhats)), jnp.asarray(pts), thresholds,
        K=4096, interpret=True,
    )
    assert not np.asarray(overflow).any()
    np.testing.assert_array_equal(np.asarray(picks), np.stack(singles))


def test_bucket_degenerate_empty():
    """x_hat ≡ 0 → no candidates anywhere → max_idx, no overflow."""
    _, occ, _ = _case(7)
    x_hat = np.zeros((B, B, B), np.float32)
    thresholds = jnp.asarray(np.linspace(0, 1.0, T), jnp.float32)
    picks, overflow = select_thresholds_d1_bucket(
        jnp.asarray(x_hat[None]), jnp.asarray(_pack([occ])), thresholds,
        K=4096, interpret=True,
    )
    assert not np.asarray(overflow).any()
    assert np.asarray(picks).tolist() == [[T - 1]]


def test_bucket_overflow_flagged():
    """cnt0 > K must raise the overflow flag (sums are then unusable)."""
    _, occ, x_hat = _case(11)  # x_hat > 0 nearly everywhere (~B³ voxels)
    thresholds = jnp.asarray(np.linspace(0, 1.0, T), jnp.float32)
    ab, ba, cnt, overflow = bucket_sweep_sums(
        jnp.asarray(x_hat[None]), jnp.asarray(_pack([occ])), thresholds,
        K=256, kc=128, pc=64, interpret=True,
    )
    assert np.asarray(overflow).all()


def test_bucket_tie_values_match_strict_comparison():
    """Blocks of equal probability values: count(t) must follow strict
    `x_hat > t` semantics even when ties straddle top-k boundaries."""
    rng = np.random.default_rng(3)
    occ = np.zeros((B, B, B), np.float32)
    occ[rng.integers(0, B, 40), rng.integers(0, B, 40),
        rng.integers(0, B, 40)] = 1.0
    # quantize probabilities to 8 levels → massive value ties
    x_hat = (np.round(rng.random((B, B, B)) * 8) / 8).astype(np.float32)
    thresholds = jnp.asarray(np.linspace(0, 1.0, T), jnp.float32)
    pts = _pack([occ])
    single = np.asarray(select_thresholds_d1(
        jnp.asarray(occ), jnp.asarray(x_hat), thresholds))
    picks, overflow = select_thresholds_d1_bucket(
        jnp.asarray(x_hat[None]), jnp.asarray(pts), thresholds,
        K=4096, interpret=True,
    )
    assert not np.asarray(overflow).any()
    np.testing.assert_array_equal(np.asarray(picks)[0], single)


def _case_with_normals(seed):
    pts, occ, x_hat = _case(seed)
    rng = np.random.default_rng(seed + 100)
    n = rng.normal(size=(len(pts), 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    return pts, n, occ, x_hat


def _d2_bucket_oracle(x_hat, pts, nrm, thresholds, K):
    """Numpy twin of the d2 bucket kernel's documented semantics:
    AB carries each original's OWN normal through the prefix argmin
    (earlier candidate wins ties); BA takes the plane value of the
    FIRST distance-tied original row."""
    B = x_hat.shape[-1]
    flat = x_hat.reshape(-1)
    order = np.argsort(-flat, kind="stable")[:K]
    cand = np.stack([order // (B * B), (order // B) % B, order % B],
                    axis=-1).astype(np.float64)
    vals = flat[order]
    d2 = ((pts[:, None, :] - cand[None, :, :]) ** 2).sum(-1)  # [P,K]
    dot = ((pts[:, None, :] - cand[None, :, :])
           * nrm[:, None, :]).sum(-1) ** 2
    # prefix argmin per point (first minimum)
    pm = np.minimum.accumulate(d2, axis=1)
    first_arg = np.argmax(d2 == pm, axis=1)  # broadcasting trick below
    ab2 = np.empty(K)
    for k in range(K):
        j = np.argmin(d2[:, : k + 1], axis=1)  # first min
        ab2[k] = dot[np.arange(len(pts)), j].sum()
    cm = d2.min(axis=0)
    # first distance-tied row (the kernel's tie rule — min-plane-among-
    # tied was systematically optimistic, see _bucket_kernel_d2)
    ba2_col = np.array([
        dot[int(np.argmax(d2[:, k] == cm[k])), k] for k in range(K)
    ])
    ba2 = np.cumsum(ba2_col)
    cnt = np.array([(flat > t).sum() for t in thresholds])
    cnt = np.minimum(cnt, K)
    ab = np.where(cnt > 0, ab2[np.maximum(cnt, 1) - 1], np.inf)
    ba = np.where(cnt > 0, ba2[np.maximum(cnt, 1) - 1], 0.0)
    return ab, ba, cnt


@pytest.mark.parametrize("seed", [0, 1])
def test_bucket_d2_sums_match_oracle(seed):
    """ab2/ba2 of the d2 bucket kernel vs an independent numpy oracle
    of the same conventions (single point tile: pc ≥ P)."""
    pts, n, occ, x_hat = _case_with_normals(seed)
    T_loc = 16
    thresholds = np.linspace(0.05, 0.95, T_loc)
    K = 4096
    pad = np.full((512, 3), -1, np.int32)
    pad[: len(pts)] = pts.astype(np.int32)
    npad = np.zeros((512, 3), np.float32)
    npad[: len(pts)] = n
    res = jax.tree_util.tree_map(
        np.asarray,
        bucket_sweep_sums(
            jnp.asarray(x_hat[None]), jnp.asarray(pad[None]),
            jnp.asarray(thresholds, jnp.float32),
            K=K, kc=256, pc=512, interpret=True,
            nrm=jnp.asarray(npad[None]),
        ),
    )
    ab, ba, cnt, overflow, ab2, ba2 = res
    assert not overflow.any()
    oab, oba, ocnt = _d2_bucket_oracle(
        x_hat.astype(np.float64), pts, n, thresholds, K)
    np.testing.assert_array_equal(cnt[0], ocnt)
    nz = ocnt > 0
    np.testing.assert_allclose(ab2[0][nz], oab[nz], rtol=1e-4)
    np.testing.assert_allclose(ba2[0][nz], oba[nz], rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_bucket_d2_sums_match_oracle_multitile(seed):
    """Same oracle comparison but with pc=64/kc=128 so the 512-row point
    pad spans 8 point tiles and candidates span many lane tiles: pins the
    CROSS-TILE tie rule (BA distance ties must keep the EARLIER tile's
    plane value — global first-tied-row, like the oracle's argmax)."""
    pts, n, occ, x_hat = _case_with_normals(seed)
    T_loc = 16
    thresholds = np.linspace(0.05, 0.95, T_loc)
    K = 4096
    pad = np.full((512, 3), -1, np.int32)
    pad[: len(pts)] = pts.astype(np.int32)
    npad = np.zeros((512, 3), np.float32)
    npad[: len(pts)] = n
    res = jax.tree_util.tree_map(
        np.asarray,
        bucket_sweep_sums(
            jnp.asarray(x_hat[None]), jnp.asarray(pad[None]),
            jnp.asarray(thresholds, jnp.float32),
            K=K, kc=128, pc=64, interpret=True,
            nrm=jnp.asarray(npad[None]),
        ),
    )
    ab, ba, cnt, overflow, ab2, ba2 = res
    assert not overflow.any()
    oab, oba, ocnt = _d2_bucket_oracle(
        x_hat.astype(np.float64), pts, n, thresholds, K)
    np.testing.assert_array_equal(cnt[0], ocnt)
    nz = ocnt > 0
    np.testing.assert_allclose(ab2[0][nz], oab[nz], rtol=1e-4)
    np.testing.assert_allclose(ba2[0][nz], oba[nz], rtol=1e-4)


def test_bucket_d2_selection_parity_with_host():
    """d1+d2 selection through the d2 bucket kernel on the standard case
    class: d1 picks exact; d2 picks match the host oracle here (the
    own-normal AB approximation only deviates under heavy noise — its
    tolerance class is characterized in test_threshold_sweep)."""
    from pcc_geo_cnn_v2_tpu.utils.threshold import compute_optimal_thresholds

    thresholds = np.linspace(0, 1.0, T)
    for seed in range(4):
        pts, n, occ, x_hat = _case_with_normals(seed + 40)
        pad = np.full((512, 3), -1, np.int32)
        pad[: len(pts)] = pts.astype(np.int32)
        npad = np.zeros((512, 3), np.float32)
        npad[: len(pts)] = n
        picks, overflow = select_thresholds_d1_bucket(
            jnp.asarray(x_hat[None]), jnp.asarray(pad[None]),
            jnp.asarray(thresholds, jnp.float32),
            opt_metrics=("d1_mse", "d2_mse"), max_deltas=(np.inf,),
            K=B ** 3, interpret=True, nrm=jnp.asarray(npad[None]))
        assert not np.asarray(overflow).any()
        _, host = compute_optimal_thresholds(
            pts, x_hat, thresholds, B, normals=n,
            opt_metrics=("d1_mse", "d2_mse"), max_deltas=(np.inf,))
        assert np.asarray(picks)[0].tolist() == host, (seed, picks, host)
