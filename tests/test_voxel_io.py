"""Voxelization scatter and PLY IO roundtrips."""

import numpy as np

import jax.numpy as jnp

from pcc_geo_cnn_v2_tpu.ops.voxel import devoxelize_host, pack_points, voxelize
from pcc_geo_cnn_v2_tpu.utils.pc_io import read_ply, write_ply, load_points


def test_voxelize_roundtrip():
    rng = np.random.default_rng(0)
    size = 16
    blocks = [
        np.unique(rng.integers(0, size, size=(n, 3)), axis=0).astype(np.float64)
        for n in (50, 5, 200)
    ]
    points, counts = pack_points(blocks)
    grids = np.asarray(voxelize(jnp.asarray(points), size))
    assert grids.shape == (3, size, size, size, 1)
    for i, b in enumerate(blocks):
        assert grids[i].sum() == len(b)
        back = devoxelize_host(grids[i, ..., 0], 0.5)
        key = lambda a: np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
        np.testing.assert_array_equal(back[key(back)], b[key(b)].astype(np.float32))


def test_voxelize_drops_padding():
    points = np.full((2, 4, 3), -1, dtype=np.int32)
    points[0, 0] = [1, 2, 3]
    grids = np.asarray(voxelize(jnp.asarray(points), 8))
    assert grids[0].sum() == 1.0 and grids[1].sum() == 0.0
    assert grids[0, 1, 2, 3, 0] == 1.0


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    data = np.hstack(
        [
            rng.integers(0, 1024, size=(100, 3)).astype(np.float64),
            rng.normal(size=(100, 3)),
        ]
    )
    names = ["x", "y", "z", "nx", "ny", "nz"]
    for binary in (True, False):
        p = tmp_path / f"t_{binary}.ply"
        write_ply(p, data, names, dtypes=["f4"] * 3 + ["f8"] * 3, binary=binary)
        back, got_names = read_ply(p)
        assert got_names == names
        np.testing.assert_allclose(back, data, rtol=1e-6)
    # column selection
    back, _ = read_ply(tmp_path / "t_True.ply", columns=["x", "y", "z"])
    np.testing.assert_allclose(back, data[:, :3])
    # parallel loader
    pts = load_points([tmp_path / "t_True.ply"] * 3)
    assert len(pts) == 3 and pts[0].shape == (100, 3)


def test_ply_uchar_colors(tmp_path):
    data = np.array([[0, 1, 2, 255, 128, 0]], dtype=np.float64)
    p = tmp_path / "c.ply"
    write_ply(p, data, ["x", "y", "z", "red", "green", "blue"],
              dtypes=["f4"] * 3 + ["u1"] * 3)
    back, names = read_ply(p)
    np.testing.assert_array_equal(back, data)


def test_pack_unpack_coords_roundtrip():
    import numpy as np
    import jax.numpy as jnp
    from pcc_geo_cnn_v2_tpu.ops.voxel import pack_coords, unpack_coords

    rng = np.random.default_rng(0)
    for size in (16, 64, 100, 1024):
        pts = rng.integers(0, size, (500, 3))
        u = pack_coords(pts, size)
        assert u.dtype == np.uint32
        back = np.asarray(unpack_coords(jnp.asarray(u), size))
        np.testing.assert_array_equal(back, pts)
