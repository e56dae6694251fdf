"""Rehydrate ``models/`` orbax checkpoints from the committed RD assets.

The gitignored ``models/`` tree does not survive container re-images, but
training continuation (``rd_train_all.py --extend``, warm-seq chaining
onto new λs) needs orbax checkpoints + ``done`` markers in the
``models/<root>/<run_id>/<λ>/`` layout. This tool inverts
``tools/export_rd_assets.py``: params come from
``pcc_geo_cnn_v2_tpu/assets/rd/<run_id>/<λ>.msgpack.gz``; the optimizer
state is freshly initialized (Adam moments are not exported — an
``--extend`` from a rehydrated checkpoint restarts moments, which the
manifest's ``rehydrated`` flag records for the artifact trail).

Usage:
  python tools/assets_to_ckpt.py models/rd --runs c3p-a0.75
  python tools/assets_to_ckpt.py models/rd10k --runs c2 c3p-a0.75-10k
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pcc_geo_cnn_v2_tpu.cli.common import load_params_asset
from pcc_geo_cnn_v2_tpu.models.configs import build_model
from pcc_geo_cnn_v2_tpu.training import TrainConfig, create_train_state

ASSET_ROOT = (Path(__file__).resolve().parent.parent
              / "pcc_geo_cnn_v2_tpu/assets/rd")


def run_config(run_id: str) -> str:
    return run_id.split("-a")[0]


def run_alpha(run_id: str) -> float:
    if "-a" in run_id:
        return float(run_id.split("-a")[1].split("-")[0])
    return 0.75 if run_id.startswith("c3p") else 0.9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_root", nargs="?", default="models/rd")
    ap.add_argument("--runs", nargs="*", default=None)
    args = ap.parse_args()

    from tools.rd_train_all import save_ckpt  # orbax layout of record

    asset_dirs = sorted(p for p in ASSET_ROOT.iterdir() if p.is_dir())
    if args.runs:
        asset_dirs = [p for p in asset_dirs if p.name in args.runs]
    assert asset_dirs, f"no matching assets under {ASSET_ROOT}"

    for adir in asset_dirs:
        run_id = adir.name
        model = build_model(run_config(run_id))
        manifest = json.loads((adir / "manifest.json").read_text())
        for asset in sorted(adir.glob("*e-*.msgpack.gz"),
                            key=lambda p: -float(p.name[:-11])):
            tag = asset.name[: -len(".msgpack.gz")]
            run_dir = Path(args.model_root) / run_id / tag
            if (run_dir / "done").exists():
                print(f"skip {run_dir} (done exists)")
                continue
            step = int(manifest.get(tag, {}).get("ckpt_step", 0))
            params = load_params_asset(model, asset)
            cfg = TrainConfig(block_size=64, lmbda=float(tag),
                              alpha=run_alpha(run_id))
            state = create_train_state(model, jax.random.PRNGKey(0), cfg)
            state = state.replace(
                params=jax.tree_util.tree_map(jnp.asarray, params))
            run_dir.mkdir(parents=True, exist_ok=True)
            save_ckpt(run_dir, state, step)
            (run_dir / "done").touch()
            with open(run_dir / "train_log.jsonl", "a") as f:
                f.write(json.dumps({"step": step,
                                    "split": "rehydrated_from_assets"})
                        + "\n")
            print(f"rehydrated {run_dir} at step {step}")


if __name__ == "__main__":
    main()
