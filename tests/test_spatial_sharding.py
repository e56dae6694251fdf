"""Spatially-sharded conv (halo exchange over the sp axis) vs unsharded."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcc_geo_cnn_v2_tpu.parallel.mesh import make_mesh
from pcc_geo_cnn_v2_tpu.parallel.spatial import conv3d_spatial_sharded


def _reference_conv(x, kernel, stride):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        x, kernel, (stride,) * 3, "SAME", dimension_numbers=dn)


@pytest.mark.parametrize("kd,stride", [(3, 1), (3, 2), (5, 2), (9, 2)])
def test_sharded_conv_matches_unsharded(kd, stride):
    mesh = make_mesh(8, axes=("sp",))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 16, 16, 4)).astype(np.float32))
    k = jnp.asarray(
        rng.normal(size=(kd, 3, 3, 4, 5)).astype(np.float32) * 0.1
    )
    expect = _reference_conv(x, k, stride)
    got = conv3d_spatial_sharded(mesh, x, k, stride=stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_sharded_conv_batch_one_device_grid():
    """128-deep grid over 8 shards, kernel 3, stride 1."""
    mesh = make_mesh(8, axes=("sp",))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 128, 8, 8, 2)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 2)).astype(np.float32))
    expect = _reference_conv(x, k, 1)
    got = conv3d_spatial_sharded(mesh, x, k, stride=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)
