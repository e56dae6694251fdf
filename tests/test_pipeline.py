"""Experiment pipeline: ev_experiment reports, sweep fan-out, ev_compare
CSVs/BD matrices, train plots — all idempotent, internal-metrics mode."""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from pcc_geo_cnn_v2_tpu.cli import (
    ev_compare,
    ev_experiment,
    ev_run_compare,
    ev_run_experiment,
    tr_train_all,
    ut_train_plots,
)
from pcc_geo_cnn_v2_tpu.utils import pc_io
from pcc_geo_cnn_v2_tpu.utils.data import synthetic_blocks

RES = 32
LEVEL = 1


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    # dataset: blocks for training + one full cloud for eval
    blocks_dir = root / "blocks"
    blocks_dir.mkdir()
    for i, b in enumerate(synthetic_blocks(16, block_size=16, seed=0)):
        pc_io.write_ply(blocks_dir / f"b{i:02d}.ply", b)
    rng = np.random.default_rng(1)
    cloud = np.unique(rng.integers(0, RES, (800, 3)), axis=0).astype(float)
    cloud_path = root / "cloud.ply"
    pc_io.write_ply(cloud_path, cloud)

    spec = {
        "train_glob": str(blocks_dir / "*.ply"),
        "experiment_dir": str(root / "experiments"),
        "model_dir": str(root / "models"),
        "resolution": RES,
        "octree_level": LEVEL,
        "opt_metrics": ["d1_mse"],
        "data": [{"pc_name": "cloud", "input_pc": str(cloud_path)}],
        "model_configs": [
            {"id": "c1-t", "config": "c1", "num_filters": 8,
             "resolution": 16, "batch_size": 2, "max_steps": 6,
             "lambdas": [1e-4, 3e-4], "train_mode": "warm_seq"},
        ],
    }
    yml = root / "experiment.yml"
    yml.write_text(yaml.safe_dump(spec))
    return root, yml, spec


@pytest.mark.slow
def test_train_sweep_and_experiments(workspace):
    root, yml, spec = workspace
    tr_train_all.main([str(yml), spec["model_dir"],
                       "--extra_args", "--val_every 3 --val_batches 1"])
    ckpts = sorted(Path(spec["model_dir"]).glob("c1-t/*/done"))
    assert len(ckpts) == 2  # both lambdas trained (warm_seq)

    ev_run_experiment.main([str(yml), "--num_parallel", "2"])
    reports = sorted(Path(spec["experiment_dir"]).glob("**/report_d1.json"))
    assert len(reports) == 2
    rep = json.loads(reports[0].read_text())
    assert {"bpp", "d1_psnr", "pos_total_size_in_bytes"} <= set(rep)

    # idempotency: re-run skips everything quickly
    ev_run_experiment.main([str(yml), "--num_parallel", "1"])

    ev_run_compare.main([str(yml), "--metrics", "d1_psnr"])
    results = Path(spec["experiment_dir"]) / "results"
    assert (results / "data.csv").exists()
    assert (results / "cloud_d1_psnr_rd.png").exists()
    assert (results / "bdrate.csv").exists()

    ut_train_plots.main([spec["model_dir"], str(root / "plots")])
    assert (root / "plots" / "train_loss.png").exists()
