"""Named model configurations c1/c2/c3/c3p (reference ``src/model_configs.py``).

- c1  — v1 (factorized prior), V1 transforms, 32 filters
- c2  — v2 (hyperprior), V1 transforms, 32 filters
- c3  — v2, residual V2 transforms, 32 filters
- c3p — v2, progressive V2 transforms, **64** filters (the paper's flagship;
  'c4'..'c6' in the paper are c3p retrained with α=0.75 / num_filters
  tweaks / warm-start λ sequencing, not new architectures)
"""

from __future__ import annotations

import flax.linen as nn

from pcc_geo_cnn_v2_tpu.models.codec_models import (
    CompressionModelV1,
    CompressionModelV2,
)

__all__ = ["MODEL_CONFIGS", "build_model"]

MODEL_CONFIGS: dict[str, dict] = {
    "c1": dict(
        model="v1",
        num_filters=32,
        analysis="AnalysisTransformV1",
        synthesis="SynthesisTransformV1",
    ),
    "c2": dict(
        model="v2",
        num_filters=32,
        analysis="AnalysisTransformV1",
        synthesis="SynthesisTransformV1",
    ),
    "c3": dict(
        model="v2",
        num_filters=32,
        analysis="AnalysisTransformV2",
        synthesis="SynthesisTransformV2",
    ),
    "c3p": dict(
        model="v2",
        num_filters=64,
        analysis="AnalysisTransformProgressiveV2",
        synthesis="SynthesisTransformProgressiveV2",
    ),
}


def build_model(config, dtype=None, conv_backend="xla") -> nn.Module:
    """Instantiate a model from a config name or an explicit config dict.

    ``conv_backend`` selects the inference conv path for v2 models
    ("pallas" = fused lane-folded kernels, see models/codec_models.py);
    v1 models ignore it (their k9/k5 V1 stacks have no residual tails).
    """
    if isinstance(config, str):
        config = MODEL_CONFIGS[config]
    cfg = dict(config)
    kind = cfg.pop("model")
    if kind == "v1":
        return CompressionModelV1(dtype=dtype, **cfg)
    if kind == "v2":
        return CompressionModelV2(dtype=dtype, conv_backend=conv_backend,
                                  **cfg)
    raise ValueError(f"unknown model kind {kind}")
