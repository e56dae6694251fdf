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
