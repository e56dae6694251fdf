"""Native packed-mask coordinate unpack vs the numpy twin (bit-identical)."""

import numpy as np
import pytest

from pcc_geo_cnn_v2_tpu.ops import bitunpack


@pytest.mark.parametrize("bsz,density", [(16, 0.0), (16, 0.03),
                                         (32, 0.2), (64, 0.01)])
def test_native_matches_numpy(bsz, density):
    rng = np.random.default_rng(int(bsz * 1000 + density * 100))
    n = 5
    vol = rng.random((n, bsz ** 3)) < density
    rows = np.packbits(vol, axis=-1, bitorder="big")
    got = bitunpack.unpack_mask_coords(rows, bsz)
    want = bitunpack._unpack_numpy(rows, bsz)
    assert len(got) == len(want) == n
    for g, w in zip(got, want):
        assert g.dtype == np.float32
        np.testing.assert_array_equal(g, w)


def test_full_and_single_bits():
    bsz = 16
    rows = np.zeros((3, bsz ** 3 // 8), np.uint8)
    rows[0] = 0xFF  # fully occupied block
    rows[1, 0] = 0x80  # single voxel at flat 0 -> (0,0,0)
    rows[2, -1] = 0x01  # last flat voxel -> (15,15,15)
    got = bitunpack.unpack_mask_coords(rows, bsz)
    assert len(got[0]) == bsz ** 3
    np.testing.assert_array_equal(got[1], [[0.0, 0.0, 0.0]])
    np.testing.assert_array_equal(got[2], [[15.0, 15.0, 15.0]])
    want = bitunpack._unpack_numpy(rows, bsz)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_native_builds():
    # the fast path must actually be available in CI (g++ is baked in);
    # a broken build would silently run 30-100x slower
    assert bitunpack.native_available()
