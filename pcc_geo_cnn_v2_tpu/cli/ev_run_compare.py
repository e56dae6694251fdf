"""Fan ev_compare over {PCs × metrics} and merge per-PC CSVs into
``results/{data,bdrate,bdsnr}.csv`` (reference ``src/ev_run_compare.py``)."""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import pandas as pd
import yaml

from pcc_geo_cnn_v2_tpu.cli import ev_compare

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="ev_run_compare")
    parser.add_argument("experiment_yml")
    parser.add_argument("--metrics", nargs="+",
                        default=["d1_psnr", "d2_psnr"])
    parser.add_argument("--no_plot", action="store_true")
    args = parser.parse_args(argv)

    spec = yaml.safe_load(Path(args.experiment_yml).read_text())
    exp_dir = Path(spec["experiment_dir"])
    results = exp_dir / "results"
    results.mkdir(parents=True, exist_ok=True)
    bd_ignore = spec.get("bd_ignore", [])

    # global mode list up front: fixes each mode's plot style across all
    # figures so the shared legend strip stays truthful even when a PC is
    # missing a mode
    import glob as _glob
    style_modes = sorted({
        Path(p).parts[-3]
        for p in _glob.glob(str(exp_dir / "*" / "*" / "*" / "report_*.json"))
    })

    for data in spec["data"]:
        for metric in args.metrics:
            try:
                ev_compare.main(
                    [str(exp_dir), data["pc_name"], str(results),
                     "--metric", metric, "--bd_ignore", *bd_ignore]
                    + (["--style_modes", *style_modes] if style_modes
                       else [])
                    + (["--no_plot"] if args.no_plot else [])
                )
            except AssertionError:
                logger.warning("no %s reports for %s", metric,
                               data["pc_name"])

    # shared legend strip for the per-PC RD plot grid
    # (reference ev_run_compare.py:76-102)
    if not args.no_plot:
        modes = set()
        for p in sorted(results.glob("*_data.csv")):
            modes.update(pd.read_csv(p)["mode_id"].unique())
        if modes:
            from pcc_geo_cnn_v2_tpu.utils.plots import (
                render_standalone_legend,
            )

            render_standalone_legend(style_modes or sorted(modes),
                                     results / "legend.png")

    # merge
    for kind in ("data", "bdrate", "bdsnr"):
        parts = sorted(results.glob(f"*_{kind}.csv"))
        if not parts:
            continue
        frames = []
        for p in parts:
            df = pd.read_csv(p)
            df.insert(0, "source", p.stem)
            frames.append(df)
        pd.concat(frames).to_csv(results / f"{kind}.csv", index=False)
        logger.info("merged %d files into %s.csv", len(parts), kind)


if __name__ == "__main__":
    main()
