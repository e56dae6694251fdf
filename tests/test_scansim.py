"""Scan-like figure generator: density, manifold-ness, normals."""

import numpy as np

from pcc_geo_cnn_v2_tpu.utils.scansim import figure_blocks, figure_cloud


def test_figure_cloud_statistics():
    pts, nrm = figure_cloud(7, resolution=256)
    # 2D-manifold density regime at this resolution (scales ~R²)
    assert 20_000 < len(pts) < 120_000
    assert pts.shape == nrm.shape
    assert np.all((pts >= 0) & (pts < 256))
    np.testing.assert_array_equal(pts, np.round(pts))  # integer voxels
    assert len(np.unique(pts, axis=0)) == len(pts)  # deduped
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0,
                               atol=1e-6)


def test_figure_blocks_drop_not_truncate():
    blocks = figure_blocks([7], resolution=256, level=2, max_points=512)
    assert blocks
    assert max(len(b) for b in blocks) <= 512


def test_seeds_give_distinct_clouds():
    a = figure_cloud(1, resolution=128, with_normals=False)
    b = figure_cloud(2, resolution=128, with_normals=False)
    assert abs(len(a) - len(b)) > 0 or not np.array_equal(
        a[: min(len(a), len(b))], b[: min(len(a), len(b))])
