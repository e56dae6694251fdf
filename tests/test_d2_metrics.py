"""Device-first full-cloud D2 metrics vs the host KD-tree oracle.

``blockwise_d2_metrics`` must reproduce ``utils/metrics.py:compute_metrics``
(itself oracle-tested against the reference's ``pc_metric.py``) — NN
identities from banded argmin EDTs + exact f64 host finishing. Tie
distances may pick different neighbors than a KD-tree (documented
reference deviation), so sums compare with a small tolerance.
"""

import numpy as np
import pytest

from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import (
    blockwise_d2_metrics,
    blockwise_nn_offsets,
)
from pcc_geo_cnn_v2_tpu.ops.voxel import pack_attrs, pack_points
from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics
from pcc_geo_cnn_v2_tpu.utils.octree import block_origins, partition_octree

RESOLUTION = 64
LEVEL = 2  # 16³ blocks
SIZE = RESOLUTION // (2 ** LEVEL)


def _cloud_with_normals(seed, n=900):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = np.round(v * 24 + 32)
    pts = pts[np.all((pts >= 0) & (pts < RESOLUTION), axis=1)]
    pts, idx = np.unique(pts, axis=0, return_index=True)
    nrm = v[np.sort(idx)]
    nrm = v[idx][np.argsort(idx)][: len(pts)]
    # normals must align with the deduped points: recompute directly
    nrm = pts - 32.0
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    return np.hstack([pts, nrm])


def _candidate_blocks(blocks, seed):
    rng = np.random.default_rng(seed)
    out = []
    for b in blocks:
        p = np.asarray(b)[:, :3]
        jit = p + rng.integers(-2, 3, size=p.shape)
        jit = np.clip(jit, 0, SIZE - 1)
        keep = rng.random(len(jit)) < 0.85
        cand = np.unique(jit[keep], axis=0) if keep.any() else jit[:1]
        out.append(cand.astype(np.float32))
    return out


def _packed_masks(b_blocks):
    occ = np.zeros((len(b_blocks), SIZE ** 3), np.uint8)
    for i, b in enumerate(b_blocks):
        c = np.asarray(b, np.int64)
        occ[i, (c[:, 0] * SIZE + c[:, 1]) * SIZE + c[:, 2]] = 1
    return np.packbits(occ, axis=-1, bitorder="big")


@pytest.mark.parametrize("seed", [0, 3])
def test_d2_matches_host_oracle(seed):
    points = _cloud_with_normals(seed)
    blocks, binstr = partition_octree(
        points, [0, 0, 0], [RESOLUTION] * 3, LEVEL)
    origins = np.stack(
        block_origins(binstr, [0, 0, 0], [RESOLUTION] * 3, LEVEL))
    b_blocks = _candidate_blocks(blocks, seed + 10)

    budget = int(2 ** np.ceil(np.log2(max(len(b) for b in blocks))))
    a_pts, _ = pack_points(blocks, max_points=budget)
    a_nrm = pack_attrs(blocks, [3, 4, 5], budget)

    got = blockwise_d2_metrics(
        a_pts, a_nrm, _packed_masks(b_blocks), b_blocks, origins, SIZE,
        RESOLUTION, points, halo=6, with_d1=True,
    )

    b_full = np.vstack([np.asarray(b)[:, :3] + o
                        for b, o in zip(b_blocks, origins)])
    want = compute_metrics(points[:, :3], b_full, RESOLUTION - 1,
                           p1_n=points[:, 3:6])
    # d1 identities are tie-free in distance, sums must match exactly
    np.testing.assert_allclose(got["d1_sum_AB"], want["d1_sum_AB"],
                               rtol=1e-9)
    np.testing.assert_allclose(got["d1_sum_BA"], want["d1_sum_BA"],
                               rtol=1e-9)
    # d2 sums depend on tie-broken NN identity; allow a small deviation
    np.testing.assert_allclose(got["d2_sum_AB"], want["d2_sum_AB"],
                               rtol=0.05)
    np.testing.assert_allclose(got["d2_sum_BA"], want["d2_sum_BA"],
                               rtol=0.05)
    assert abs(got["d2_psnr"] - want["d2_psnr"]) < 0.25


@pytest.mark.parametrize("seed", [0, 3])
def test_host_finishing_exact_with_kdtree_identities(seed):
    """With KD-tree identities, d2_from_identities == compute_metrics
    exactly — isolates the host math from the tie-rule deviation."""
    from scipy.spatial import cKDTree

    from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import d2_from_identities

    points = _cloud_with_normals(seed)
    blocks, binstr = partition_octree(
        points, [0, 0, 0], [RESOLUTION] * 3, LEVEL)
    origins = np.stack(
        block_origins(binstr, [0, 0, 0], [RESOLUTION] * 3, LEVEL))
    b_blocks = _candidate_blocks(blocks, seed + 10)
    b_full = np.vstack([np.asarray(b)[:, :3] + o
                        for b, o in zip(b_blocks, origins)])
    a_glob = np.vstack([np.asarray(b)[:, :3] + o
                        for b, o in zip(blocks, origins)])
    a_n = np.vstack([np.asarray(b)[:, 3:6] for b in blocks])
    t1 = cKDTree(a_glob, balanced_tree=False)
    t2 = cKDTree(b_full, balanced_tree=False)
    _, idx2 = t2.query(a_glob, workers=-1)
    _, idx1 = t1.query(b_full, workers=-1)
    got = d2_from_identities(a_glob, a_n, b_full[idx2], b_full,
                             a_glob[idx1], points, RESOLUTION,
                             with_d1=True)
    # share the P1 tree (and point order) so oracle ties resolve
    # identically — KD-tree ties depend on insertion order
    want = compute_metrics(a_glob, b_full, RESOLUTION - 1,
                           p1_n=a_n, t1=t1)
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-12, err_msg=k)


def test_nn_offsets_exact_within_halo():
    points = _cloud_with_normals(1)
    blocks, binstr = partition_octree(
        points, [0, 0, 0], [RESOLUTION] * 3, LEVEL)
    origins = np.stack(
        block_origins(binstr, [0, 0, 0], [RESOLUTION] * 3, LEVEL))
    b_blocks = _candidate_blocks(blocks, 11)
    a_pts, _ = pack_points(blocks, max_points=64)
    res = blockwise_nn_offsets(a_pts, _packed_masks(b_blocks), origins,
                               SIZE, halo=6)
    from scipy.spatial import cKDTree

    b_full = np.vstack([np.asarray(b)[:, :3] + o
                        for b, o in zip(b_blocks, origins)])
    tree = cKDTree(b_full)
    bi, pi = np.nonzero(res["valid"])
    glob = a_pts[bi, pi].astype(np.int64) + origins[bi]
    d_true, _ = tree.query(glob, workers=-1)
    ok = res["ok"][bi, pi]
    d_dev = np.sum(res["off"][bi, pi].astype(np.int64) ** 2, axis=1)
    # within halo: device distance == true distance
    np.testing.assert_array_equal(d_dev[ok], (d_true[ok] ** 2).round())
    # flagged-out points really are beyond the halo
    assert (d_true[~ok] > 6).all()


@pytest.mark.slow
@pytest.mark.parametrize("seed", [204, 205])
def test_full_cloud_d2_deviation_bound(seed):
    """Device D2 vs host KD oracle at FULL-CLOUD scale (VERDICT r2 #7).

    The recorded bound backs the 0.3 dB d2 tolerance of ev_experiment's
    enc-vs-report cross-check: measured deviation on full scan-like
    clouds is 0.07-0.12 dB (NN tie-rule identity differences; d1
    identities are tie-free and must match to f64 rounding). Asserted
    at 0.15 dB.
    """
    from pcc_geo_cnn_v2_tpu.utils.scansim import figure_cloud

    res, level = 256, 3
    size = res // 2 ** level
    points = np.hstack(figure_cloud(seed, res, with_normals=True))  # [N, 6]
    blocks, binstr = partition_octree(points, [0, 0, 0], [res] * 3, level)
    origins = np.stack(block_origins(binstr, [0, 0, 0], [res] * 3, level))
    rng = np.random.default_rng(42)
    b_blocks = []
    for b in blocks:
        p = np.asarray(b)[:, :3]
        jit = np.clip(p + rng.integers(-1, 2, size=p.shape), 0, size - 1)
        keep = rng.random(len(jit)) < 0.9
        cand = np.unique(jit[keep], axis=0) if keep.any() else jit[:1]
        b_blocks.append(cand.astype(np.float32))

    budget = int(2 ** np.ceil(np.log2(max(len(b) for b in blocks))))
    a_pts, _ = pack_points(blocks, max_points=budget)
    a_nrm = pack_attrs(blocks, [3, 4, 5], budget)
    occ = np.zeros((len(b_blocks), size ** 3), np.uint8)
    for i, b in enumerate(b_blocks):
        c = np.asarray(b, np.int64)
        occ[i, (c[:, 0] * size + c[:, 1]) * size + c[:, 2]] = 1
    packed = np.packbits(occ, axis=-1, bitorder="big")

    got = blockwise_d2_metrics(
        a_pts, a_nrm, packed, b_blocks, origins, size, res, points,
        halo=6, with_d1=True,
    )
    b_full = np.vstack([np.asarray(b)[:, :3] + o
                        for b, o in zip(b_blocks, origins)])
    want = compute_metrics(points[:, :3], b_full, res - 1,
                           p1_n=points[:, 3:6])
    np.testing.assert_allclose(got["d1_sum_AB"], want["d1_sum_AB"],
                               rtol=1e-9)
    np.testing.assert_allclose(got["d1_sum_BA"], want["d1_sum_BA"],
                               rtol=1e-9)
    dev = abs(got["d2_psnr"] - want["d2_psnr"])
    print(f"full-cloud d2 deviation: {dev:.4f} dB "
          f"({len(points)} pts, {len(blocks)} blocks)")
    assert dev < 0.15, dev
