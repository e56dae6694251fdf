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
    ap.add_argument("--resolution", type=int, default=RESOLUTION)
    ap.add_argument("--octree_level", type=int, default=LEVEL)
    args = ap.parse_args()

    from pcc_geo_cnn_v2_tpu.cli.ev_compare import main as ev_compare_main
    from pcc_geo_cnn_v2_tpu.cli.ev_experiment import main as ev_experiment
    from pcc_geo_cnn_v2_tpu.cli.mp_run import main as mp_run_main
    from pcc_geo_cnn_v2_tpu.utils import pc_io
    from pcc_geo_cnn_v2_tpu.utils.scansim import figure_cloud

    out = Path(args.out)
    pc_name = f"figure_{args.seed}"
    pc_path = out / "pcs" / f"{pc_name}.ply"
    norm_path = out / "pcs" / f"{pc_name}_n.ply"
    pc_path.parent.mkdir(parents=True, exist_ok=True)
    if not pc_path.exists():
        pts, nrm = figure_cloud(args.seed, args.resolution,
                                with_normals=True)
        pc_io.write_ply(pc_path, pts)
        pc_io.write_ply(norm_path, np.hstack([pts, nrm]),
                        names=("x", "y", "z", "nx", "ny", "nz"))
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
            "--input_norm", str(norm_path),
            "--opt_metrics", "d1_mse", "d2_mse",
            "--resolution", str(args.resolution),
            "--octree_level", str(args.octree_level),
        ])
        print(f"λ={run_dir.name}: report "
              f"{(exp_dir / 'report_d1.json').exists()}", flush=True)

    # builtin octree anchor at the CTC scales, rehomed into the
    # ev_compare layout (report.json → report_d1.json)
    anchors_tmp = out / "anchors" / pc_name
    mp_run_main([str(pc_path), str(anchors_tmp), "--tmc3", "builtin",
                 "--input_norm", str(norm_path),
                 "--resolution", str(args.resolution)])
    for rdir in sorted((anchors_tmp / "octree").glob("r*")):
        rep = rdir / "report.json"
        if rep.exists():
            for group in ("d1", "d2"):
                dst = (exp_root / "octree-anchor" / rdir.name
                       / f"report_{group}.json")
                dst.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy(rep, dst)

    for metric in ("d1_psnr", "d2_psnr"):
        ev_compare_main([str(out / "experiments"), pc_name,
                         str(out / "compare"), "--metric", metric])
        path = out / "compare" / f"{pc_name}_{metric}_bdsnr.csv"
        if path.exists():
            print(f"BD-PSNR matrix ({metric}):\n" + path.read_text(),
                  flush=True)


if __name__ == "__main__":
    main()
