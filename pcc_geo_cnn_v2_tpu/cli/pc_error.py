"""Drop-in stand-in for the MPEG ``pc_error_d`` binary (internal metrics).

Prints D1/D2 results in the exact log format ``utils/mpeg_parsing.
parse_pcerror`` consumes, so pipelines written against the external binary
(reference ``ev_experiment.py:39-43``) run unchanged where it isn't
installed. Metrics come from ``utils/metrics`` (same symmetric max/min
convention as mpeg-pcc-dmetric).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(prog="pc_error", add_help=True)
    parser.add_argument("--fileA", required=True)
    parser.add_argument("--fileB", required=True)
    parser.add_argument("--inputNorm", default=None)
    parser.add_argument("--resolution", type=float, required=True)
    parser.add_argument("--color", default="0")
    parser.add_argument("--dropdups", default="0")
    parser.add_argument("--neighborsProc", default="1")
    parser.add_argument("--singlePass", default=None)
    args = parser.parse_args(argv)

    from pcc_geo_cnn_v2_tpu.utils import pc_io
    from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics

    p1, _ = pc_io.read_ply(args.fileA, columns=["x", "y", "z"])
    p2, _ = pc_io.read_ply(args.fileB, columns=["x", "y", "z"])
    p1_n = None
    if args.inputNorm:
        p1_n, _ = pc_io.read_ply(args.inputNorm, columns=["nx", "ny", "nz"])
    m = compute_metrics(p1, p2, args.resolution, p1_n=p1_n)
    print(f"infile1: {args.fileA}")
    print(f"infile2: {args.fileB}")
    print("3. Final (symmetric).")
    print(f"   mseF      (p2point): {m['d1_mse']}")
    print(f"   mseF,PSNR (p2point): {m['d1_psnr']}")
    if p1_n is not None:
        print(f"   mseF      (p2plane): {m['d2_mse']}")
        print(f"   mseF,PSNR (p2plane): {m['d2_psnr']}")
    else:  # keep the parser happy: geometry-only run
        print("   mseF      (p2plane): 0.0")
        print("   mseF,PSNR (p2plane): 0.0")


if __name__ == "__main__":
    main()
