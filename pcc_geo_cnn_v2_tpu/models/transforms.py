"""Analysis/synthesis transform stacks as flax modules, NDHWC layout.

Capability parity with the reference's Keras layer compositions
(``/root/reference/src/model_transforms.py``): V1 (9⁵/5⁵/5⁵ stride-2 stacks,
:41-59), residual Analysis/Synthesis blocks (:62-81), V2 and ProgressiveV2
variants (:84-137), and the hyperprior transforms (:140-158). All transforms
downsample/upsample ×8 between x and y; hyper transforms move ×2 between
y and z.

TPU-first choices: channels-last (NDHWC) so XLA tiles the channel dim onto
the MXU lane axis; convolutions lower to ``lax.conv_general_dilated`` which
XLA fuses with the elementwise activations; parameters are float32 with an
optional bfloat16 compute dtype.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = [
    "AnalysisTransformV1",
    "SynthesisTransformV1",
    "AnalysisBlock",
    "SynthesisBlock",
    "AnalysisTransformV2",
    "SynthesisTransformV2",
    "AnalysisTransformProgressiveV2",
    "SynthesisTransformProgressiveV2",
    "HyperAnalysisTransform",
    "HyperSynthesisTransform",
    "TRANSFORMS",
]

Dtype = Any
relu = nn.relu


def _conv(features, kernel, strides=1, use_bias=True, dtype=None):
    k = (kernel,) * 3
    s = (strides,) * 3
    return nn.Conv(features, k, strides=s, padding="SAME", use_bias=use_bias,
                   dtype=dtype)


def _deconv(features, kernel, strides=1, use_bias=True, dtype=None):
    k = (kernel,) * 3
    s = (strides,) * 3
    return nn.ConvTranspose(features, k, strides=s, padding="SAME",
                            use_bias=use_bias, dtype=dtype)


class AnalysisTransformV1(nn.Module):
    """Three stride-2 convs: k9 → k5 → k5(linear, no bias); ×8 downsample.

    Reference: ``model_transforms.py:41-48``.
    """

    filters: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = relu(_conv(self.filters, 9, 2, dtype=self.dtype)(x))
        x = relu(_conv(self.filters, 5, 2, dtype=self.dtype)(x))
        return _conv(self.filters, 5, 2, use_bias=False, dtype=self.dtype)(x)


class SynthesisTransformV1(nn.Module):
    """Three stride-2 transposed convs, final 1-channel k9 with ReLU.

    Reference: ``model_transforms.py:51-59``.
    """

    filters: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = relu(_deconv(self.filters, 5, 2, dtype=self.dtype)(x))
        x = relu(_deconv(self.filters, 5, 2, dtype=self.dtype)(x))
        return relu(_deconv(1, 9, 2, dtype=self.dtype)(x))


class AnalysisBlock(nn.Module):
    """Strided conv + two convs with a skip from the strided output.

    ``residual_mode`` 'add' returns ``h + f(h)``; 'concat' concatenates
    ``(f(h), h)`` on channels. Reference: ``model_transforms.py:62-70`` with
    ``ResidualLayer`` semantics at ``:22-38``.
    """

    filters: int
    kernel: int = 3
    strides: int = 2
    residual_mode: str = "add"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = relu(_conv(self.filters, self.kernel, self.strides, dtype=self.dtype)(x))
        t = relu(_conv(self.filters, self.kernel, dtype=self.dtype)(h))
        t = relu(_conv(self.filters, self.kernel, dtype=self.dtype)(t))
        if self.residual_mode == "add":
            return h + t
        return jnp.concatenate((t, h), axis=-1)


class SynthesisBlock(nn.Module):
    """Strided transposed conv + two transposed convs with a skip.

    Reference: ``model_transforms.py:73-81``.
    """

    filters: int
    kernel: int = 3
    strides: int = 2
    residual_mode: str = "add"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = relu(_deconv(self.filters, self.kernel, self.strides, dtype=self.dtype)(x))
        t = relu(_deconv(self.filters, self.kernel, dtype=self.dtype)(h))
        t = relu(_deconv(self.filters, self.kernel, dtype=self.dtype)(t))
        if self.residual_mode == "add":
            return h + t
        return jnp.concatenate((t, h), axis=-1)


class _BlockStack(nn.Module):
    """Shared body for the V2 analysis/synthesis families."""

    filters: int
    widths: Sequence[float]  # per-block filter fractions
    synthesis: bool
    kernel: int = 3
    residual_mode: str = "add"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        block = SynthesisBlock if self.synthesis else AnalysisBlock
        for frac in self.widths:
            x = block(int(self.filters * frac), self.kernel,
                      residual_mode=self.residual_mode, dtype=self.dtype)(x)
        if self.synthesis:
            return relu(_deconv(1, self.kernel, dtype=self.dtype)(x))
        return _conv(self.filters, self.kernel, use_bias=False, dtype=self.dtype)(x)


def AnalysisTransformV2(filters, dtype=None, residual_mode="add"):
    """f/2, f, f residual blocks + linear conv. Reference ``:84-95``."""
    return _BlockStack(filters, (0.5, 1, 1), synthesis=False,
                       residual_mode=residual_mode, dtype=dtype)


def SynthesisTransformV2(filters, dtype=None, residual_mode="add"):
    """f, f, f/2 blocks + 1-channel ReLU deconv. Reference ``:98-109``."""
    return _BlockStack(filters, (1, 1, 0.5), synthesis=True,
                       residual_mode=residual_mode, dtype=dtype)


def AnalysisTransformProgressiveV2(filters, dtype=None, residual_mode="add"):
    """f/4, f/2, f progressive blocks. Reference ``:112-123``."""
    return _BlockStack(filters, (0.25, 0.5, 1), synthesis=False,
                       residual_mode=residual_mode, dtype=dtype)


def SynthesisTransformProgressiveV2(filters, dtype=None, residual_mode="add"):
    """f, f/2, f/4 progressive blocks. Reference ``:126-137``."""
    return _BlockStack(filters, (1, 0.5, 0.25), synthesis=True,
                       residual_mode=residual_mode, dtype=dtype)


class HyperAnalysisTransform(nn.Module):
    """y → z: conv, stride-2 conv, linear conv (×2 downsample).

    Reference: ``model_transforms.py:140-147``.
    """

    filters: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = relu(_conv(self.filters, 3, dtype=self.dtype)(x))
        x = relu(_conv(self.filters, 3, 2, dtype=self.dtype)(x))
        return _conv(self.filters, 3, use_bias=False, dtype=self.dtype)(x)


class HyperSynthesisTransform(nn.Module):
    """z → σ: deconv, stride-2 deconv, deconv (×2 upsample), all ReLU.

    Reference: ``model_transforms.py:150-158``.
    """

    filters: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = relu(_deconv(self.filters, 3, dtype=self.dtype)(x))
        x = relu(_deconv(self.filters, 3, 2, dtype=self.dtype)(x))
        return relu(_deconv(self.filters, 3, dtype=self.dtype)(x))


TRANSFORMS: dict[str, Callable] = {
    "AnalysisTransformV1": AnalysisTransformV1,
    "SynthesisTransformV1": SynthesisTransformV1,
    "AnalysisTransformV2": AnalysisTransformV2,
    "SynthesisTransformV2": SynthesisTransformV2,
    "AnalysisTransformProgressiveV2": AnalysisTransformProgressiveV2,
    "SynthesisTransformProgressiveV2": SynthesisTransformProgressiveV2,
    "HyperAnalysisTransform": HyperAnalysisTransform,
    "HyperSynthesisTransform": HyperSynthesisTransform,
}
