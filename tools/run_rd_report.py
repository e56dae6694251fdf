"""L4/L5 pipeline proof on a held-out figure cloud (TPU job).

Drives the REAL CLI pipeline the reference ships (SURVEY §3.4): for each
trained λ, ``ev_experiment`` (compress → merged decode → pc_error-standin
→ report_d1.json), then the builtin octree anchor via ``mp_run``, then
``ev_compare`` RD plots + BD matrices. Output tree::

    results/rd_pipeline/
      pcs/figure_200.ply
      experiments/figure_200/c3p-a0.75/<λ>/report_d1.json
      experiments/figure_200/octree-anchor/r<scale>/report_d1.json
      compare/figure_200_d1_psnr_{rd.png,data.csv,bdrate.csv,bdsnr.csv}

One cloud only: each ev_experiment child is a fresh process paying the
remote-TPU compiles (~minutes); the full 4-cloud × 5-λ RD matrix comes
from ``tools/rd_eval.py``, which shares executables across λs in-process.

Usage: python tools/run_rd_report.py [model_root] [--seed 200]
"""

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

RESOLUTION = 1024
LEVEL = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_root", nargs="?", default="models/rd/c3p-a0.75")
    ap.add_argument("--seed", type=int, default=200)
    ap.add_argument("--out", default="results/rd_pipeline")
    args = ap.parse_args()

    from pcc_geo_cnn_v2_tpu.cli.ev_compare import main as ev_compare_main
    from pcc_geo_cnn_v2_tpu.cli.ev_experiment import main as ev_experiment
    from pcc_geo_cnn_v2_tpu.cli.mp_run import main as mp_run_main
    from pcc_geo_cnn_v2_tpu.utils import pc_io
    from pcc_geo_cnn_v2_tpu.utils.scansim import figure_cloud

    out = Path(args.out)
    pc_name = f"figure_{args.seed}"
    pc_path = out / "pcs" / f"{pc_name}.ply"
    pc_path.parent.mkdir(parents=True, exist_ok=True)
    if not pc_path.exists():
        pts = figure_cloud(args.seed, RESOLUTION, with_normals=False)
        pc_io.write_ply(pc_path, pts)
    print(f"{pc_name}: "
          f"{len(pc_io.read_ply(pc_path, columns=['x','y','z'])[0])} pts",
          flush=True)

    run_dirs = sorted(Path(args.model_root).glob("*e-*"),
                      key=lambda p: float(p.name))
    assert run_dirs, f"no checkpoints under {args.model_root}"
    exp_root = out / "experiments" / pc_name
    for run_dir in run_dirs:
        exp_dir = exp_root / "c3p-a0.75" / run_dir.name
        ev_experiment([
            "--output_dir", str(exp_dir),
            "--model_dir", str(run_dir),
            "--model_config", "c3p",
            "--input_pc", str(pc_path),
            "--resolution", str(RESOLUTION),
            "--octree_level", str(LEVEL),
        ])
        print(f"λ={run_dir.name}: report "
              f"{(exp_dir / 'report_d1.json').exists()}", flush=True)

    # builtin octree anchor at the CTC scales, rehomed into the
    # ev_compare layout (report.json → report_d1.json)
    anchors_tmp = out / "anchors" / pc_name
    mp_run_main([str(pc_path), str(anchors_tmp), "--tmc3", "builtin",
                 "--resolution", str(RESOLUTION)])
    for rdir in sorted((anchors_tmp / "octree").glob("r*")):
        rep = rdir / "report.json"
        if rep.exists():
            dst = exp_root / "octree-anchor" / rdir.name / "report_d1.json"
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy(rep, dst)

    ev_compare_main([str(out / "experiments"), pc_name,
                     str(out / "compare"), "--metric", "d1_psnr"])
    data = (out / "compare" / f"{pc_name}_d1_psnr_bdsnr.csv").read_text()
    print("BD-PSNR matrix:\n" + data, flush=True)


if __name__ == "__main__":
    main()
