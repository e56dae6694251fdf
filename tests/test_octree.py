"""Octree partition/departition: roundtrip + golden parity with the reference.

The reference's ``utils/octree_coding.py`` is pure numpy and serves as the
oracle for the bitstream-visible binstr layout and block ordering.
"""

import numpy as np
import pytest

from pcc_geo_cnn_v2_tpu.utils.octree import (
    departition_octree,
    morton_codes,
    partition_octree,
)
from conftest import reference_module


def random_cloud(rng, n, resolution, extra_cols=0):
    pts = rng.integers(0, resolution, size=(n, 3)).astype(np.float64)
    pts = np.unique(pts, axis=0)
    if extra_cols:
        extra = rng.normal(size=(len(pts), extra_cols))
        pts = np.hstack([pts, extra])
    return pts


def test_morton_order_is_child_index_order():
    ids = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]])
    codes = morton_codes(ids, 1)
    # child index v = x + 2y + 4z
    assert list(codes) == [0, 1, 2, 4, 7]


@pytest.mark.parametrize("level,resolution,n", [(2, 64, 500), (3, 64, 2000), (4, 256, 5000)])
def test_partition_matches_reference(level, resolution, n):
    ref = reference_module("utils.octree_coding")
    rng = np.random.default_rng(42 + level)
    pts = random_cloud(rng, n, resolution)

    blocks, binstr = partition_octree(pts, [0, 0, 0], [resolution] * 3, level)
    ref_blocks, ref_binstr = ref.partition_octree(pts, [0, 0, 0], [resolution] * 3, level)

    assert binstr == list(ref_binstr)
    assert len(blocks) == len(ref_blocks)
    for mine, theirs in zip(blocks, ref_blocks):
        np.testing.assert_array_equal(mine, theirs)


def test_departition_matches_reference_and_roundtrips():
    ref = reference_module("utils.octree_coding")
    rng = np.random.default_rng(7)
    resolution, level = 128, 3
    pts = random_cloud(rng, 3000, resolution)

    blocks, binstr = partition_octree(pts, [0, 0, 0], [resolution] * 3, level)
    mine = departition_octree(blocks, binstr, [0, 0, 0], [resolution] * 3, level)
    theirs = ref.departition_octree(
        blocks, list(binstr), np.array([0, 0, 0]), np.array([resolution] * 3), level
    )
    for a, b in zip(mine, theirs):
        np.testing.assert_array_equal(a, b)

    restored = np.vstack(mine)
    assert restored.shape == pts.shape
    key = lambda a: np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
    np.testing.assert_array_equal(restored[key(restored)], pts[key(pts)])


def test_extra_columns_pass_through():
    rng = np.random.default_rng(3)
    resolution, level = 64, 2
    pts = random_cloud(rng, 800, resolution, extra_cols=3)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [resolution] * 3, level)
    restored = np.vstack(
        departition_octree(blocks, binstr, [0, 0, 0], [resolution] * 3, level)
    )
    key = lambda a: np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
    np.testing.assert_allclose(restored[key(restored)], pts[key(pts)])


def test_degenerate_inputs():
    empty = np.zeros((0, 3))
    blocks, binstr = partition_octree(empty, [0, 0, 0], [64] * 3, 2)
    assert binstr is None and len(blocks) == 1
    pts = np.array([[1.0, 2.0, 3.0]])
    blocks, binstr = partition_octree(pts, [0, 0, 0], [64] * 3, 0)
    assert binstr is None
    np.testing.assert_array_equal(blocks[0], pts)
