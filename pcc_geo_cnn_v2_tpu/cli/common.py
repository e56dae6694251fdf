"""Shared CLI plumbing: model construction + checkpoint param loading."""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import numpy as np

from pcc_geo_cnn_v2_tpu.models.configs import MODEL_CONFIGS, build_model

logger = logging.getLogger(__name__)

__all__ = ["build_model_from_args", "load_params", "load_params_asset",
           "config_names", "add_model_args"]


def config_names():
    return list(MODEL_CONFIGS)


def add_model_args(parser, num_filters_default=None):
    parser.add_argument("--model_config", required=True,
                        help=f"Model config: {config_names()}")
    parser.add_argument("--num_filters", type=int, default=num_filters_default,
                        help="Override the config's filter count.")
    parser.add_argument(
        "--data_format", default="channels_last",
        help="NDHWC only (TPU-native); kept for reference CLI parity.")


def build_model_from_args(args):
    assert args.data_format == "channels_last", (
        "this framework is NDHWC-native; channels_first is a TF1-GPU layout"
    )
    cfg = dict(MODEL_CONFIGS[args.model_config])
    if getattr(args, "num_filters", None):
        cfg["num_filters"] = args.num_filters
    return build_model(cfg)


def load_params(model, checkpoint_dir, block_size=16):
    """Load the latest checkpoint's params for codec use."""
    from pcc_geo_cnn_v2_tpu.training import (
        TrainConfig,
        Trainer,
        create_train_state,
    )
    import orbax.checkpoint as ocp

    # orbax rejects relative paths
    path = Trainer.latest_checkpoint(Path(checkpoint_dir).resolve())
    assert path is not None, f"Checkpoint {checkpoint_dir} was not found"
    state = create_train_state(model, jax.random.PRNGKey(0),
                               TrainConfig(block_size=block_size))
    tree = {"params": state.params, "opt_state": state.opt_state, "step": 0}
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, tree)
    restored = ocp.StandardCheckpointer().restore(path, abstract)
    logger.info("restored %s (step %s)", path, restored["step"])
    return jax.tree_util.tree_map(np.asarray, restored["params"])


def load_params_asset(model, asset_path, block_size=16):
    """Load params from a committed ``.msgpack.gz`` asset.

    Assets are written by ``tools/export_rd_assets.py`` /
    ``tools/export_bench_ckpt.py`` so evals survive the loss of the
    gitignored ``models/`` tree (container reboots wipe it).
    """
    import gzip

    from flax import serialization

    from pcc_geo_cnn_v2_tpu.training import TrainConfig, create_train_state

    template = jax.device_get(
        create_train_state(model, jax.random.PRNGKey(0),
                           TrainConfig(block_size=block_size)).params)
    params = serialization.from_bytes(
        template, gzip.decompress(Path(asset_path).read_bytes()))
    logger.info("loaded asset %s", asset_path)
    return params
