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


def test_encode_syms_spatial_c3p_oversized_block():
    """Full c3p analysis+hyper encode of a 128³ block, depth-sharded over
    the 8-device mesh — symbols match the unsharded encode_syms
    executable (up to conv accumulation-order rounding at the integer
    quantization boundary, which must stay rare)."""
    from pcc_geo_cnn_v2_tpu.models.configs import build_model
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pcc_geo_cnn_v2_tpu.parallel.spatial import encode_syms_spatial

    mesh = make_mesh(8, axes=("sp",))
    model = build_model(dict(model="v2", num_filters=8,
                             analysis="AnalysisTransformProgressiveV2",
                             synthesis="SynthesisTransformProgressiveV2"))
    D = 128
    rng = np.random.default_rng(0)
    x0 = np.zeros((1, D, D, D, 1), np.float32)
    pts = rng.integers(0, D, size=(20000, 3))
    x0[0, pts[:, 0], pts[:, 1], pts[:, 2], 0] = 1.0
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 16, 16, 16, 1), np.float32),
                        training=False)

    want = jax.jit(
        lambda p, x: model.apply(p, x, method=model.encode_syms)
    )(params, x0)
    x_sh = jax.device_put(x0, NamedSharding(mesh, P(None, "sp")))
    got = encode_syms_spatial(model, params, x_sh, mesh)

    for k in ("y_sym", "z_sym"):
        a, b = np.asarray(got[k]), np.asarray(want[k])
        assert a.shape == b.shape
        mismatch = np.mean(a != b)
        assert mismatch < 5e-4, f"{k}: {mismatch:.2%} symbols differ"
