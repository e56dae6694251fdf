"""Shape contracts for all transform stacks (port of the reference's
``src/test_model_transforms.py`` coverage, NDHWC)."""

import jax
import jax.numpy as jnp
import pytest

from pcc_geo_cnn_v2_tpu.models import transforms as T

KEY = jax.random.PRNGKey(0)


def run(module, shape):
    x = jnp.zeros(shape, jnp.float32)
    params = module.init(KEY, x)
    y = module.apply(params, x)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    return y.shape, n_params


@pytest.mark.parametrize("f", [8])
def test_analysis_synthesis_v1(f):
    y_shape, _ = run(T.AnalysisTransformV1(f), (1, 8, 8, 8, 1))
    assert y_shape == (1, 1, 1, 1, f)
    x_shape, _ = run(T.SynthesisTransformV1(f), (1, 1, 1, 1, f))
    assert x_shape == (1, 8, 8, 8, 1)


def test_blocks_add_and_concat():
    shape, _ = run(T.AnalysisBlock(8), (1, 8, 8, 8, 1))
    assert shape == (1, 4, 4, 4, 8)
    shape, _ = run(T.AnalysisBlock(8, residual_mode="concat"), (1, 8, 8, 8, 1))
    assert shape == (1, 4, 4, 4, 16)  # concat doubles channels
    shape, _ = run(T.SynthesisBlock(8), (1, 4, 4, 4, 8))
    assert shape == (1, 8, 8, 8, 8)
    shape, _ = run(T.SynthesisBlock(8, residual_mode="concat"), (1, 4, 4, 4, 8))
    assert shape == (1, 8, 8, 8, 16)


@pytest.mark.parametrize(
    "ana,syn",
    [
        (T.AnalysisTransformV2, T.SynthesisTransformV2),
        (T.AnalysisTransformProgressiveV2, T.SynthesisTransformProgressiveV2),
    ],
)
def test_v2_families_x8(ana, syn):
    f = 8
    y_shape, _ = run(ana(f), (1, 16, 16, 16, 1))
    assert y_shape == (1, 2, 2, 2, f)
    x_shape, _ = run(syn(f), (1, 2, 2, 2, f))
    assert x_shape == (1, 16, 16, 16, 1)


def test_hyper_transforms_x2():
    f = 8
    z_shape, _ = run(T.HyperAnalysisTransform(f), (1, 4, 4, 4, f))
    assert z_shape == (1, 2, 2, 2, f)
    s_shape, _ = run(T.HyperSynthesisTransform(f), (1, 2, 2, 2, f))
    assert s_shape == (1, 4, 4, 4, f)


def test_synthesis_output_nonnegative():
    """Final synthesis activation is ReLU (reference model_transforms.py:135)."""
    m = T.SynthesisTransformProgressiveV2(8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 2, 8))
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert (y >= 0).all()


def test_param_count_parity_c3p():
    """c3p channel progression f/4,f/2,f (64f) — sanity vs hand count.

    AnalysisBlock(filters,k3) params: strided conv (k^3*cin*f + f) +
    2 convs (k^3*f*f + f).
    """
    f = 64

    def ab(cin, fo):
        return (27 * cin * fo + fo) + 2 * (27 * fo * fo + fo)

    expect = ab(1, 16) + ab(16, 32) + ab(32, 64) + 27 * 64 * 64
    _, n = run(T.AnalysisTransformProgressiveV2(f), (1, 16, 16, 16, 1))
    assert n == expect
