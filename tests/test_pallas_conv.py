"""Parity tests for the fused lane-folded residual-tail conv kernel.

The kernel must reproduce XLA's stride-1 SAME k3 conv semantics exactly
(modulo accumulation order) for every channel width the transform
stacks use (16/32/64 → lane fold 8/4/2), in both conv (analysis tails)
and flipped/ConvTranspose (synthesis tails) forms, plus the fused
conv→ReLU→conv→ReLU→add chain against the flax AnalysisBlock tail.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_geo_cnn_v2_tpu.ops.pallas_conv import (
    fold_shape,
    fused_residual_tail,
)

DN = ("NDHWC", "DHWIO", "NDHWC")


def xla_conv(x, w, b):
    y = jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                     dimension_numbers=DN)
    return y + b


def xla_deconv(x, w, b):
    y = jax.lax.conv_transpose(x, w, (1, 1, 1), "SAME",
                               dimension_numbers=DN)
    return y + b


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape,
                             jnp.float32) * 0.3


@pytest.mark.parametrize("spatial,channels", [(8, 16), (8, 32), (8, 64),
                                              (16, 16)])
def test_tail_matches_xla_conv(spatial, channels):
    x = _rand(0, 2, spatial, spatial, spatial, channels)
    w1 = _rand(1, 3, 3, 3, channels, channels)
    w2 = _rand(2, 3, 3, 3, channels, channels)
    b1 = _rand(3, channels)
    b2 = _rand(4, channels)

    want = jax.nn.relu(xla_conv(x, w1, b1))
    want = jax.nn.relu(xla_conv(want, w2, b2)) + x

    got = fused_residual_tail(x, w1, b1, w2, b2, spatial=spatial,
                              channels=channels, interpret=True,
                              dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-4)


def test_tail_matches_conv_transpose():
    """Synthesis tails: stride-1 SAME ConvTranspose == plain conv, so the
    un-flipped kernel must reproduce the flax ConvTranspose chain."""
    spatial, channels = 8, 32
    x = _rand(0, 1, spatial, spatial, spatial, channels)
    w1 = _rand(1, 3, 3, 3, channels, channels)
    w2 = _rand(2, 3, 3, 3, channels, channels)
    b1 = _rand(3, channels)
    b2 = _rand(4, channels)

    want = jax.nn.relu(xla_deconv(x, w1, b1))
    want = jax.nn.relu(xla_deconv(want, w2, b2)) + x

    got = fused_residual_tail(x, w1, b1, w2, b2, spatial=spatial,
                              channels=channels, interpret=True,
                              dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-4)


def test_no_residual_and_folded_io():
    spatial, channels = 8, 16
    rows, _ = fold_shape(spatial, channels)
    x = _rand(0, 3, spatial, spatial, spatial, channels)
    w1 = _rand(1, 3, 3, 3, channels, channels)
    w2 = _rand(2, 3, 3, 3, channels, channels)
    b1 = _rand(3, channels)
    b2 = _rand(4, channels)

    want = jax.nn.relu(xla_conv(x, w1, b1))
    want = jax.nn.relu(xla_conv(want, w2, b2))

    xf = x.reshape(3, rows, 128)
    got = fused_residual_tail(xf, w1, b1, w2, b2, spatial=spatial,
                              channels=channels, residual=False,
                              interpret=True, dtype=jnp.float32)
    assert got.shape == (3, rows, 128)
    np.testing.assert_allclose(
        np.asarray(got.reshape(want.shape)), np.asarray(want),
        rtol=2e-3, atol=1e-4)


def test_tail_matches_flax_analysis_block():
    """End-to-end vs flax: strided conv in XLA + fused tail = AnalysisBlock."""
    from pcc_geo_cnn_v2_tpu.models.transforms import AnalysisBlock

    spatial, channels = 16, 16
    block = AnalysisBlock(channels)
    x = (jax.random.uniform(jax.random.PRNGKey(7),
                            (2, 2 * spatial, 2 * spatial, 2 * spatial, 1))
         < 0.05).astype(jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x)
    want = block.apply(params, x)

    p = params["params"]
    h = jax.nn.relu(jax.lax.conv_general_dilated(
        x, p["Conv_0"]["kernel"], (2, 2, 2), "SAME",
        dimension_numbers=DN) + p["Conv_0"]["bias"])
    got = fused_residual_tail(
        h, p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
        p["Conv_2"]["kernel"], p["Conv_2"]["bias"],
        spatial=spatial, channels=channels, interpret=True,
        dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-4)


def test_conv_backend_pallas_matches_xla_end_to_end():
    """c3p-family model: encode_syms + decode_y through the pallas conv
    backend must agree with the XLA backend on the same params (symbols
    near-identical, reconstructions close)."""
    from pcc_geo_cnn_v2_tpu.models.configs import build_model

    mx = build_model("c3p")
    mp = build_model("c3p", conv_backend="pallas")
    x = (jax.random.uniform(jax.random.PRNGKey(11), (2, 16, 16, 16, 1))
         < 0.05).astype(jnp.float32)
    params = mx.init(jax.random.PRNGKey(0), x, training=False)

    sx = mx.apply(params, x, method=mx.encode_syms)
    sp = mp.apply(params, x, method=mp.encode_syms)
    for k in ("y_sym", "z_sym"):
        same = np.mean(np.asarray(sx[k]) == np.asarray(sp[k]))
        assert same > 0.999, (k, same)

    dx = mx.apply(params, sx["y_sym"], method=mx.decode_y)
    dp = mp.apply(params, sx["y_sym"], method=mp.decode_y)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dx),
                               rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("spatial,channels,slab", [(16, 16, 4), (16, 16, 8),
                                                   (32, 16, 8)])
def test_slab_tail_matches_whole_volume(spatial, channels, slab):
    """The slab-DMA variant must equal the XLA chain (and hence the
    whole-volume kernel) including at slab boundaries."""
    from pcc_geo_cnn_v2_tpu.ops.pallas_conv import fused_residual_tail_slab

    x = _rand(0, 1, spatial, spatial, spatial, channels)
    w1 = _rand(1, 3, 3, 3, channels, channels)
    w2 = _rand(2, 3, 3, 3, channels, channels)
    b1 = _rand(3, channels)
    b2 = _rand(4, channels)

    want = jax.nn.relu(xla_conv(x, w1, b1))
    want = jax.nn.relu(xla_conv(want, w2, b2)) + x

    got = fused_residual_tail_slab(x, w1, b1, w2, b2, spatial=spatial,
                                   channels=channels, slab=slab,
                                   interpret=True, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_full_synthesis_stack_with_slab_stage():
    """Full c3p synthesis at real 64³ scale: the 64³×16 tail runs the
    slab-DMA kernel; output must match the flax module end to end."""
    from pcc_geo_cnn_v2_tpu.models.transforms import (
        SynthesisTransformProgressiveV2,
    )
    from pcc_geo_cnn_v2_tpu.ops.pallas_conv import fused_block_stack_apply

    t = SynthesisTransformProgressiveV2(64)
    y = _rand(5, 1, 8, 8, 8, 64)
    params = t.init(jax.random.PRNGKey(0), y)
    want = t.apply(params, y)
    got = fused_block_stack_apply(params["params"], y, filters=64,
                                  widths=(1, 0.5, 0.25), synthesis=True,
                                  dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-3)
