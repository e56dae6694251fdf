"""One full experiment: compress (+merged decode) → recolor → metrics →
report_d1/d2.json for a single (point cloud, model, λ).

Pipeline parity with the reference's ``src/ev_experiment.py``: every stage
is idempotent (skip when outputs exist), reports carry bitstream size +
bpp + D1/D2 metrics, and the encoder-side D1 PSNR is cross-checked against
the report metric to < 0.01 dB (``ev_experiment.py:158-162``).

Metrics come from the external MPEG ``pc_error_d`` binary when
``--pc_error`` (or $PC_ERROR) points at it — same subprocess contract as
the reference — and from the in-repo metrics module otherwise.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def _run(cmd, log_path):
    logger.info("run: %s", " ".join(map(str, cmd)))
    with open(log_path, "w") as f:
        subprocess.run([str(c) for c in cmd], stdout=f,
                       stderr=subprocess.STDOUT, check=True)


def _pc_error_metrics(pc_error_bin, ori, dec, norm, resolution, log_path):
    cmd = [
        pc_error_bin,
        f"--fileA={ori}", f"--fileB={dec}",
        f"--inputNorm={norm}" if norm else "--singlePass=1",
        "--color=0", f"--resolution={resolution - 1}", "--dropdups=0",
        "--neighborsProc=1",
    ]
    _run([c for c in cmd if c], log_path)
    from pcc_geo_cnn_v2_tpu.utils.mpeg_parsing import parse_pcerror

    return parse_pcerror(log_path)


def _internal_metrics(ori, dec, norm, resolution):
    from pcc_geo_cnn_v2_tpu.utils import pc_io
    from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics

    p1, _ = pc_io.read_ply(ori, columns=["x", "y", "z"])
    p2, _ = pc_io.read_ply(dec, columns=["x", "y", "z"])
    p1_n = None
    if norm:
        p1_n, _ = pc_io.read_ply(norm, columns=["nx", "ny", "nz"])
    m = compute_metrics(p1, p2, resolution - 1, p1_n=p1_n)
    out = {"d1_mse": m["d1_mse"], "d1_psnr": m["d1_psnr"]}
    if p1_n is not None:
        out.update({"d2_mse": m["d2_mse"], "d2_psnr": m["d2_psnr"]})
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="ev_experiment",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--model_dir", required=True,
                        help="Checkpoint dir of the trained model.")
    parser.add_argument("--model_config", required=True)
    parser.add_argument("--num_filters", type=int, default=None)
    parser.add_argument("--input_pc", required=True)
    parser.add_argument("--input_norm", default=None)
    parser.add_argument("--opt_metrics", nargs="+", default=["d1_mse"])
    parser.add_argument("--max_deltas", nargs="+", type=float,
                        default=[np.inf])
    parser.add_argument("--fixed_threshold", action="store_true")
    parser.add_argument("--resolution", type=int, default=1024)
    parser.add_argument("--octree_level", type=int, default=4)
    parser.add_argument("--pc_error", default=os.environ.get("PC_ERROR"),
                        help="Path to the MPEG pc_error_d binary (optional).")
    parser.add_argument("--map_color", action="store_true",
                        help="Recolor decoded clouds from the original.")
    args = parser.parse_args(argv)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    pc_name = Path(args.input_pc).stem

    groups = sorted({m[:2] for m in args.opt_metrics})
    bin_files = [out_dir / f"{pc_name}.{g}.bin" for g in groups]
    dec_files = [out_dir / f"{pc_name}.{g}.dec.ply" for g in groups]

    # 1. compress (+ merged decode) — idempotent
    if not all(p.exists() for p in bin_files + dec_files):
        from pcc_geo_cnn_v2_tpu.cli import compress as cli_compress

        argv_c = [
            "--input_files", args.input_pc,
            "--output_files", *map(str, bin_files),
            "--dec_files", *map(str, dec_files),
            "--checkpoint_dir", args.model_dir,
            "--model_config", args.model_config,
            "--opt_metrics", *args.opt_metrics,
            "--max_deltas", *map(str, args.max_deltas),
            "--resolution", str(args.resolution),
            "--octree_level", str(args.octree_level),
        ]
        if args.num_filters:
            argv_c += ["--num_filters", str(args.num_filters)]
        if args.input_norm:
            argv_c += ["--input_normals", args.input_norm]
        if args.fixed_threshold:
            argv_c += ["--fixed_threshold"]
        cli_compress.main(argv_c)
    else:
        logger.info("compress outputs exist, skipping")

    # 2. optional recolor — idempotent
    if args.map_color:
        from pcc_geo_cnn_v2_tpu.cli.map_color import map_color

        for dec in dec_files:
            colored = dec.with_suffix(".color.ply")
            if not colored.exists():
                map_color(args.input_pc, str(dec), str(colored))

    # 3. metrics + reports — idempotent per group
    for g, bin_f, dec_f in zip(groups, bin_files, dec_files):
        report_path = out_dir / f"report_{g}.json"
        if report_path.exists():
            logger.info("%s exists, skipping", report_path)
            continue
        if args.pc_error:
            metrics = _pc_error_metrics(
                args.pc_error, args.input_pc, dec_f, args.input_norm,
                args.resolution, out_dir / f"pc_error_{g}.log")
        else:
            metrics = _internal_metrics(args.input_pc, str(dec_f),
                                        args.input_norm, args.resolution)
        from pcc_geo_cnn_v2_tpu.utils import pc_io

        n_points = len(pc_io.read_ply(args.input_pc,
                                      columns=["x", "y", "z"])[0])
        size = os.path.getsize(bin_f)
        report = {
            "pc_name": pc_name,
            "model_config": args.model_config,
            "opt_group": g,
            "pos_total_size_in_bytes": size,
            "input_point_count": n_points,
            "bpp": size * 8 / n_points,
            **metrics,
        }
        # cross-check vs encoder-side estimate (reference :158-162 asserts
        # D1 < 0.01 dB). D1 is deterministic (same squared distances both
        # sides). D2 depends on WHICH nearest neighbor supplies the
        # normal: the device metric (banded argmin EDT) and the host
        # KD-tree may break exact-distance ties differently — the
        # reference documents the same deviation class vs pc_error
        # (``pc_metric.py:114``) — so d2 gets an empirically bounded
        # tolerance (measured 0.07-0.12 dB at full-cloud scale on the
        # held-out clouds, tests/test_d2_metrics.py::test_full_cloud_*;
        # asserted at 0.3 dB for slack on adversarial content).
        enc_metric = json.loads(
            Path(str(bin_f) + ".enc.metric.json").read_text()
        )
        key = f"{g}_psnr"
        tol = {"d1": 0.01, "d2": 0.3}.get(g)
        if tol and key in enc_metric and key in metrics and not args.pc_error:
            diff = abs(enc_metric[key] - metrics[key])
            assert diff < tol, (
                f"enc-side {key} {enc_metric[key]} vs report {metrics[key]}"
            )
        report_path.write_text(json.dumps(report, sort_keys=True, indent=4))
        logger.info("wrote %s (bpp %.4f)", report_path, report["bpp"])


def run_experiment(params, stdout=None, stderr=None):
    """Popen helper for the sweep driver."""
    cmd = [sys.executable, "-m", "pcc_geo_cnn_v2_tpu.cli.ev_experiment"]
    for k, v in params.items():
        cmd.append(f"--{k}")
        if isinstance(v, (list, tuple)):
            cmd.extend(map(str, v))
        elif v is not True:
            cmd.append(str(v))
    from pcc_geo_cnn_v2_tpu.utils.parallel_process import Popen

    return Popen(cmd, stdout=stdout, stderr=stderr)


if __name__ == "__main__":
    main()
