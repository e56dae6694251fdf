"""Train sweep driver: configs × λ, sequential, with warm_seq chaining.

Parity with the reference's ``src/tr_train_all.py``: per-config ``lambdas``
and ``train_mode`` (``independent`` or ``warm_seq`` — each λ warm-starts
from the previous λ's checkpoint, ``tr_train_all.py:45-61``); runs are
skipped when their ``done`` marker exists; children run sequentially via
subprocess (one accelerator).

YAML schema (subset of the reference's ev_experiment.yml):

  mpeg_dataset_path / train_glob: glob of training block PLYs
  model_configs:
    - id: c3p-sweep          # checkpoint subdir prefix
      config: c3p            # MODEL_CONFIGS name
      lambdas: [1e-4, 5e-5]
      train_mode: warm_seq   # optional
      alpha: 0.9             # optional per-config overrides
      ...
"""

from __future__ import annotations

import argparse
import logging
import subprocess
import sys
from pathlib import Path

import yaml

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def lmbda_tag(lmbda):
    return f"{float(lmbda):.2e}"


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tr_train_all")
    parser.add_argument("experiment_yml")
    parser.add_argument("model_dir", help="Root dir for all checkpoints.")
    parser.add_argument("--extra_args", default="",
                        help="Extra flags passed to every train run, "
                             "as one shell-quoted string.")
    args = parser.parse_args(argv)
    import shlex

    extra_args = shlex.split(args.extra_args)

    spec = yaml.safe_load(Path(args.experiment_yml).read_text())
    train_glob = spec.get("train_glob") or spec["mpeg_dataset_path"]

    for mc in spec["model_configs"]:
        mc_id = mc["id"]
        lambdas = mc["lambdas"]
        mode = mc.get("train_mode", "independent")
        prev_dir = None
        for lmbda in lambdas:
            run_dir = Path(args.model_dir) / mc_id / lmbda_tag(lmbda)
            if (run_dir / "done").exists():
                logger.info("%s done, skipping", run_dir)
                prev_dir = run_dir
                continue
            cmd = [
                sys.executable, "-m", "pcc_geo_cnn_v2_tpu.cli.train",
                train_glob, str(run_dir),
                "--model_config", mc["config"],
                "--lmbda", str(lmbda),
            ]
            for key in ("alpha", "gamma", "batch_size", "max_steps",
                        "resolution", "num_filters"):
                # per-config value, falling back to the spec-level one
                # (reference tr_train_all.py:42-45 dict.get semantics).
                # EXCEPT resolution: per-config it means the training
                # block size, while the spec-level key is the eval
                # clouds' resolution — never forward the latter.
                val = mc.get(key) if key == "resolution" else (
                    mc.get(key, spec.get(key)))
                if val is not None:
                    cmd += [f"--{key}", str(val)]
            if mode == "warm_seq" and prev_dir is not None:
                cmd += ["--warm_start", str(prev_dir)]
            cmd += extra_args
            logger.info("run: %s", " ".join(cmd))
            subprocess.run(cmd, check=True)
            prev_dir = run_dir


if __name__ == "__main__":
    main()
