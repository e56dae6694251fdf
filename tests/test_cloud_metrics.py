"""Device blockwise full-cloud D1 metrics vs the host KD-tree reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import (
    blockwise_d1_sums,
    d1_metrics_from_sums,
    neighbor_table,
)
from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics
from pcc_geo_cnn_v2_tpu.utils.octree import block_origins, partition_octree


def _pack_grids(blocks, origins, size):
    packed = []
    for block, origin in zip(blocks, origins):
        g = np.zeros((size, size, size), np.uint8)
        local = (np.asarray(block)[:, :3]).astype(int)
        g[local[:, 0], local[:, 1], local[:, 2]] = 1
        packed.append(np.packbits(g.reshape(-1), bitorder="big"))
    return np.stack(packed)


def _cloud(rng, n, resolution):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = np.round(v * resolution * 0.3 + resolution / 2)
    pts = pts[np.all((pts >= 0) & (pts < resolution), axis=1)]
    return np.unique(pts, axis=0)


@pytest.mark.parametrize("jitter", [0, 3])
def test_blockwise_d1_matches_host(jitter):
    rng = np.random.default_rng(0)
    resolution, level, size = 256, 2, 64
    a = _cloud(rng, 20_000, resolution)
    # decoded-like cloud: jittered copy (same partition!)
    b = np.round(a + rng.normal(0, jitter * 0.4, a.shape))
    b = np.unique(np.clip(b, 0, resolution - 1), axis=0)

    # both clouds on ONE shared partition: partition their union's binstr
    both = np.unique(np.vstack([a, b]), axis=0)
    _, binstr = partition_octree(both, [0, 0, 0], [resolution] * 3, level)
    origins = np.stack(
        block_origins(binstr, [0, 0, 0], [resolution] * 3, level)
    )

    def grids(points):
        out = []
        for o in origins:
            local = points - o
            inside = np.all((local >= 0) & (local < size), axis=1)
            out.append(local[inside])
        return out

    a_packed = _pack_grids(grids(a), origins, size)
    b_packed = _pack_grids(grids(b), origins, size)

    sums = blockwise_d1_sums(a_packed, b_packed, origins, size, halo=8,
                             batch=4)
    got = d1_metrics_from_sums(sums, resolution - 1, points_a=a, points_b=b)
    want = compute_metrics(a, b, resolution - 1)
    assert sums["n_a"] == len(a) and sums["n_b"] == len(b)
    for key in ("d1_sum_AB", "d1_sum_BA", "d1_mse", "d1_psnr"):
        np.testing.assert_allclose(got[key], want[key], rtol=1e-6,
                                   err_msg=key)


def test_outlier_fallback_path():
    """A far-away lone block forces the > halo fallback branch."""
    resolution, level, size = 256, 2, 64
    a = np.array([[0, 0, 0], [1, 0, 0], [200, 200, 200]], np.float64)
    b = np.array([[0, 0, 1], [200, 200, 201]], np.float64)
    both = np.unique(np.vstack([a, b]), axis=0)
    _, binstr = partition_octree(both, [0, 0, 0], [resolution] * 3, level)
    origins = np.stack(
        block_origins(binstr, [0, 0, 0], [resolution] * 3, level)
    )

    def grids(points):
        return [
            (points - o)[np.all((points - o >= 0) & (points - o < size),
                                axis=1)]
            for o in origins
        ]

    a_packed = _pack_grids(grids(a), origins, size)
    b_packed = _pack_grids(grids(b), origins, size)
    sums = blockwise_d1_sums(a_packed, b_packed, origins, size, halo=8,
                             batch=2)
    got = d1_metrics_from_sums(sums, resolution - 1, points_a=a, points_b=b)
    want = compute_metrics(a, b, resolution - 1)
    for key in ("d1_sum_AB", "d1_sum_BA", "d1_psnr"):
        np.testing.assert_allclose(got[key], want[key], rtol=1e-6,
                                   err_msg=key)


def test_neighbor_table():
    origins = np.array([[0, 0, 0], [64, 0, 0], [0, 64, 0]])
    nb = neighbor_table(origins, 64)
    assert nb[0, 13] == 0  # self at center
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    j_px = offs.index((1, 0, 0))
    j_py = offs.index((0, 1, 0))
    assert nb[0, j_px] == 1 and nb[0, j_py] == 2
    assert nb[1, offs.index((-1, 0, 0))] == 0


def test_resolve_outliers_matches_kd():
    from scipy.spatial import cKDTree

    from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import resolve_outliers

    rng = np.random.default_rng(1)
    size = 64
    origins = np.array([[x * 64, y * 64, z * 64]
                        for x in range(4) for y in range(4) for z in range(4)])
    blocks = [rng.integers(0, 64, (int(rng.integers(0, 8)), 3))
              .astype(np.float64) for _ in origins]
    cloud = np.vstack([b + o for b, o in zip(blocks, origins) if len(b)])
    queries = rng.uniform(0, 256, (500, 3)).round()
    d2 = resolve_outliers(queries, blocks, origins, size)
    d, _ = cKDTree(cloud).query(queries)
    np.testing.assert_allclose(d2, d ** 2)


def test_pallas_halo_dir_matches_xla():
    """Bounded-EDT Pallas halo kernel (interpret) == XLA banded-EDT path."""
    from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import (
        _halo_dir_chunk,
        _halo_dir_chunk_pallas,
    )

    rng = np.random.default_rng(7)
    size, halo, bs = 16, 5, 4

    def packed_random(p_occ):
        g = rng.random((bs, 27, size ** 3)) < p_occ
        return jnp.asarray(
            np.packbits(g.reshape(bs, -1), bitorder="big").reshape(
                bs, 27, -1
            )
        )

    for p in (0.02, 0.0005, 0.0):  # dense, sparse, empty target
        a = packed_random(0.02)
        b = packed_random(p)
        ref = jax.device_get(_halo_dir_chunk(a, b, size=size, halo=halo))
        new = jax.device_get(
            _halo_dir_chunk_pallas(a, b, size=size, halo=halo,
                                   interpret=True)
        )
        for k in ("sum", "n", "unres_cnt"):
            np.testing.assert_allclose(new[k], ref[k], atol=1e-3,
                                       err_msg=f"{k} p={p}")
        np.testing.assert_array_equal(new["unres"], ref["unres"])
