"""Bench-shaped bucket-sweep parity check (CPU, interpret mode).

Runs the bucket sweep at the benchmark's REAL shapes — one 64³ block,
K=20480 candidate budget, P=8192 point budget, 256 thresholds, ~19k
diffuse candidates — and asserts exact count and rtol-1e-5 sum parity
against the per-threshold XLA sweep. The unit tests cover 16³ blocks;
this exercises the kernel's scalar-prefetch tile bounds at full tile
counts (19 candidate tiles × 8 point tiles) without TPU access.

Usage: python tools/validate_bucket_shapes.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from pcc_geo_cnn_v2_tpu.ops.bucket_sweep import bucket_sweep_sums
from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import d1_sweep


def main():
    B = 64
    rng = np.random.default_rng(0)
    x, y = np.meshgrid(np.arange(B), np.arange(B), indexing="ij")
    z = (20 + 8 * np.sin(x / 9.0) + 6 * np.cos(y / 11.0)).astype(int)
    occ = np.zeros((B, B, B), np.float32)
    occ[x.ravel(), y.ravel(), z.ravel()] = 1.0
    pts_list = np.argwhere(occ > 0)
    noise = rng.random((B, B, B)).astype(np.float32) * 0.4
    x_hat = np.clip(0.8 * occ + noise - 0.377, 0.0, 1.0)
    n_cand = int((x_hat > 0).sum())

    P = 8192
    pts = np.full((1, P, 3), -1, np.int32)
    pts[0, : len(pts_list)] = pts_list
    thr = jnp.asarray(np.linspace(0, 1.0, 256), jnp.float32)
    ab, ba, cnt, ov = jax.tree_util.tree_map(
        np.asarray,
        bucket_sweep_sums(jnp.asarray(x_hat[None]), jnp.asarray(pts), thr,
                          K=20480, interpret=True),
    )
    assert not ov.any(), "unexpected overflow"
    ref = jax.tree_util.tree_map(
        np.asarray, d1_sweep(jnp.asarray(occ), jnp.asarray(x_hat), thr)
    )
    np.testing.assert_array_equal(cnt[0], ref["count"])
    nz = ref["count"] > 0
    np.testing.assert_allclose(ab[0][nz], ref["d1_sum_AB"][nz], rtol=1e-5)
    np.testing.assert_allclose(ba[0][nz], ref["d1_sum_BA"][nz], rtol=1e-5)
    print(f"OK: 64³ block, {n_cand} candidates, {int(nz.sum())} non-empty "
          "thresholds — bucket sums exactly match the XLA sweep")


if __name__ == "__main__":
    main()
