"""Compression model graphs: factorized-prior (v1) and scale-hyperprior (v2).

Functional equivalents of the reference's graph builders
(``/root/reference/src/model_types.py`` ``CompressionModelV1.train/compress/
decompress`` :250-309 and ``CompressionModelV2`` :327-411), as flax modules
with three entry points each:

- ``__call__(x, training, ...)`` — the training graph (noise quantization),
  returning reconstructions and likelihoods for the RD loss.
- ``encode(x)`` — encoder side: integer symbols for range coding plus the
  decoder-identical reconstruction ``x_hat`` (the reference's merged
  encode+decode path, ``compress_octree.py --dec_files``).
- ``decode*`` — decoder side, consuming integer symbols.

Everything here is jittable and batched over blocks (the reference ran one
``sess.run`` per block; see SURVEY §3.2). Downsample contract: y = x/8,
z = x/16 (``model_types.py:305,403``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pcc_geo_cnn_v2_tpu.models.entropy import (
    FactorizedPrior,
    GaussianConditional,
    default_scale_table,
)
from pcc_geo_cnn_v2_tpu.models.transforms import TRANSFORMS, _BlockStack
from pcc_geo_cnn_v2_tpu.ops.pallas_conv import fused_block_stack_apply

__all__ = ["CompressionModelV1", "CompressionModelV2"]


class CompressionModelV1(nn.Module):
    """Autoencoder + learned factorized prior on y."""

    num_filters: int = 32
    analysis: str = "AnalysisTransformV1"
    synthesis: str = "SynthesisTransformV1"
    dtype: Any = None

    def setup(self):
        self.analysis_t = TRANSFORMS[self.analysis](self.num_filters, dtype=self.dtype)
        self.synthesis_t = TRANSFORMS[self.synthesis](self.num_filters, dtype=self.dtype)
        self.entropy_bottleneck = FactorizedPrior(self.num_filters)

    def __call__(self, x, training: bool, noise_rng=None):
        y = self.analysis_t(x)
        y_tilde, y_lik = self.entropy_bottleneck(y, training, noise_rng)
        x_tilde = self.synthesis_t(y_tilde)
        return {"y": y, "y_tilde": y_tilde, "y_likelihoods": y_lik,
                "x_tilde": x_tilde}

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    def encode(self, x):
        """x [N,B,B,B,1] → int32 y symbols + decoder-identical x_hat."""
        y = self.analysis_t(x).astype(jnp.float32)  # quantize in f32 even
        # when the conv stack runs bf16 (integer symbols need f32 range)
        y_sym = self.entropy_bottleneck.quantize_symbols(y)
        x_hat = self.decode(y_sym)
        return {"y_sym": y_sym, "x_hat": x_hat}

    def encode_syms(self, x):
        """Symbols only — no synthesis. The codec reconstructs via the
        decoder-canonical :meth:`decode` executable instead (running
        synthesis here too would double the encoder's conv work)."""
        y = self.analysis_t(x).astype(jnp.float32)
        return {"y_sym": self.entropy_bottleneck.quantize_symbols(y)}

    def decode(self, y_sym):
        y_hat = self.entropy_bottleneck.dequantize_symbols(y_sym)
        x_hat = self.synthesis_t(y_hat).astype(jnp.float32)
        return jnp.clip(x_hat, 0.0, 1.0)


class CompressionModelV2(nn.Module):
    """Autoencoder + hyperprior: z = H_a(y) coded with a factorized prior,
    σ = H_s(ẑ) conditions a Gaussian model on y."""

    num_filters: int = 32
    analysis: str = "AnalysisTransformV1"
    synthesis: str = "SynthesisTransformV1"
    hyper_analysis: str = "HyperAnalysisTransform"
    hyper_synthesis: str = "HyperSynthesisTransform"
    scales_min: float = 0.11
    scales_max: float = 256.0
    scales_levels: int = 64
    dtype: Any = None
    # "xla" | "pallas": conv backend for the INFERENCE entry points
    # (encode/encode_syms/decode_y). "pallas" runs the V2-family block
    # stacks through the fused lane-folded kernel
    # (ops/pallas_conv.fused_block_stack_apply) from the same param tree;
    # training (__call__) always uses flax/XLA (the kernel defines no
    # VJP). Encode and decode runs of one bitstream must use the same
    # backend (same-executable determinism contract as the rest of the
    # decoder-canonical design).
    conv_backend: str = "xla"

    def setup(self):
        self.analysis_t = TRANSFORMS[self.analysis](self.num_filters, dtype=self.dtype)
        self.synthesis_t = TRANSFORMS[self.synthesis](self.num_filters, dtype=self.dtype)
        self.hyper_analysis_t = TRANSFORMS[self.hyper_analysis](
            self.num_filters, dtype=self.dtype)
        self.hyper_synthesis_t = TRANSFORMS[self.hyper_synthesis](
            self.num_filters, dtype=self.dtype)
        self.entropy_bottleneck = FactorizedPrior(self.num_filters)

    @property
    def conditional(self) -> GaussianConditional:
        return GaussianConditional(
            default_scale_table(self.scales_min, self.scales_max,
                                self.scales_levels)
        )

    def _stack(self, t, x, synthesis: bool):
        """Apply a transform stack through the selected conv backend."""
        if (self.conv_backend == "pallas" and isinstance(t, _BlockStack)
                and t.residual_mode == "add"):
            return fused_block_stack_apply(
                t.variables["params"], x, filters=t.filters,
                widths=t.widths, synthesis=synthesis,
                dtype=self.dtype or jnp.float32)
        return t(x)

    def __call__(self, x, training: bool, noise_rng=None, noise_rng2=None):
        y = self.analysis_t(x)
        z = self.hyper_analysis_t(y)
        z_tilde, z_lik = self.entropy_bottleneck(z, training, noise_rng)
        sigma_tilde = self.hyper_synthesis_t(z_tilde)
        y_tilde, y_lik = self.conditional(y, sigma_tilde, training, noise_rng2)
        x_tilde = self.synthesis_t(y_tilde)
        return {"y": y, "z": z, "z_tilde": z_tilde, "z_likelihoods": z_lik,
                "sigma_tilde": sigma_tilde, "y_tilde": y_tilde,
                "y_likelihoods": y_lik, "x_tilde": x_tilde}

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    def encode(self, x):
        """x [N,B,B,B,1] → z/y symbols, y CDF-row indexes, x_hat.

        The decoder-side path (ẑ → σ̂ → indexes → x̂) is recomputed here with
        the *same* jitted computation the decoder runs, so encoder-embedded
        reconstructions match the decoder bit-for-bit on one platform.
        """
        y = self._stack(self.analysis_t, x, synthesis=False)
        z = self.hyper_analysis_t(y).astype(jnp.float32)
        # quantize in f32 even when the conv stacks run bf16
        z_sym = self.entropy_bottleneck.quantize_symbols(z)
        y_sym = self.conditional.quantize_symbols(y.astype(jnp.float32))
        sigma, y_idx = self.decode_z(z_sym)
        x_hat = self.decode_y(y_sym)
        return {"z_sym": z_sym, "y_sym": y_sym, "y_idx": y_idx, "x_hat": x_hat}

    def encode_syms(self, x):
        """Symbols only — the analysis half (y, z quantization) without the
        decoder-side recomputation :meth:`encode` performs; the codec runs
        the decoder-canonical ``decode_z``/``decode_y`` executables on the
        symbols instead (same executables the decoder runs → bit-exact)."""
        y = self._stack(self.analysis_t, x, synthesis=False)
        z = self.hyper_analysis_t(y).astype(jnp.float32)
        return {
            "z_sym": self.entropy_bottleneck.quantize_symbols(z),
            "y_sym": self.conditional.quantize_symbols(
                y.astype(jnp.float32)),
        }

    def decode_z(self, z_sym):
        """ẑ symbols → (σ̂, per-element y CDF-row indexes)."""
        z_hat = self.entropy_bottleneck.dequantize_symbols(z_sym)
        sigma = self.hyper_synthesis_t(z_hat).astype(jnp.float32)
        gc = self.conditional
        sigma_b = gc.bound_scale(sigma)
        return sigma_b, gc.indexes(sigma_b)

    def decode_y(self, y_sym):
        y_hat = self.conditional.dequantize_symbols(y_sym)
        x_hat = self._stack(self.synthesis_t, y_hat,
                            synthesis=True).astype(jnp.float32)
        return jnp.clip(x_hat, 0.0, 1.0)
