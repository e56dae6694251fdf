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


def _reference_deconv(x, kernel, stride):
    return jax.lax.conv_transpose(
        x, kernel, (stride,) * 3, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("kd,stride", [(3, 1), (3, 2), (5, 2), (9, 2)])
def test_sharded_deconv_matches_unsharded(kd, stride):
    from pcc_geo_cnn_v2_tpu.parallel.spatial import (
        conv3d_transpose_spatial_sharded,
    )

    mesh = make_mesh(8, axes=("sp",))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(
        rng.normal(size=(kd, kd, kd, 4, 5)).astype(np.float32) * 0.1
    )
    expect = _reference_deconv(x, k, stride)
    got = conv3d_transpose_spatial_sharded(mesh, x, k, stride=stride)
    assert got.shape == expect.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_spatial_roundtrip_oversized_block():
    """128³ block encode→rANS bytes→decode over the 8-device mesh: the
    decoder's thresholded mask equals the encoder's bit-for-bit (both
    sides run the same sharded decode executable — the decoder-canonical
    contract, extended to sp; VERDICT r2 ask #5)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pcc_geo_cnn_v2_tpu.coding import range_coder as rc
    from pcc_geo_cnn_v2_tpu.models.configs import build_model
    from pcc_geo_cnn_v2_tpu.models.entropy import (
        build_factorized_cdf,
        build_gaussian_cdf,
    )
    from pcc_geo_cnn_v2_tpu.parallel.spatial import (
        decode_y_spatial,
        encode_syms_spatial,
    )

    mesh = make_mesh(8, axes=("sp",))
    model = build_model(dict(model="v2", num_filters=8,
                             analysis="AnalysisTransformProgressiveV2",
                             synthesis="SynthesisTransformProgressiveV2"))
    D = 128
    rng = np.random.default_rng(3)
    x0 = np.zeros((1, D, D, D, 1), np.float32)
    pts = rng.integers(0, D, size=(20000, 3))
    x0[0, pts[:, 0], pts[:, 1], pts[:, 2], 0] = 1.0
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 16, 16, 16, 1), np.float32),
                        training=False)

    # ---- encode: sharded analysis → symbols → range-coded bytes
    x_sh = jax.device_put(x0, NamedSharding(mesh, P(None, "sp")))
    syms = encode_syms_spatial(model, params, x_sh, mesh)
    y_sym = np.asarray(syms["y_sym"])
    z_sym = np.asarray(syms["z_sym"])
    eb_table = build_factorized_cdf(
        jax.device_get(params["params"]["entropy_bottleneck"]))
    gc_table = build_gaussian_cdf()
    # decoder-side z → y CDF-row indexes (z is x/16: small, unsharded)
    _, y_idx = jax.jit(
        lambda p, z: model.apply(p, z, method=model.decode_z)
    )(params, z_sym)
    z_idx = np.broadcast_to(
        np.arange(z_sym.shape[-1], dtype=np.int32), z_sym.shape)
    y_bytes = rc.encode(y_sym, np.asarray(y_idx), gc_table)
    z_bytes = rc.encode(z_sym, z_idx, eb_table)

    # encoder-side reconstruction via the SAME sharded decode executable
    y_sh = jax.device_put(y_sym, NamedSharding(mesh, P(None, "sp")))
    x_hat_enc = np.asarray(decode_y_spatial(model, params, y_sh, mesh))
    thr = 0.51
    enc_mask = x_hat_enc[..., 0] > thr

    # ---- decode from bytes only
    z_dec = rc.decode(z_bytes, z_idx, eb_table).reshape(z_sym.shape)
    np.testing.assert_array_equal(z_dec, z_sym)
    _, y_idx_dec = jax.jit(
        lambda p, z: model.apply(p, z, method=model.decode_z)
    )(params, z_dec)
    y_dec = rc.decode(y_bytes, np.asarray(y_idx_dec), gc_table).reshape(
        y_sym.shape)
    np.testing.assert_array_equal(y_dec, y_sym)
    y_dec_sh = jax.device_put(y_dec, NamedSharding(mesh, P(None, "sp")))
    x_hat_dec = np.asarray(decode_y_spatial(model, params, y_dec_sh, mesh))
    np.testing.assert_array_equal(x_hat_dec, x_hat_enc)
    np.testing.assert_array_equal(x_hat_dec[..., 0] > thr, enc_mask)
