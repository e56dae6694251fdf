"""Render decoded clouds + visual comparisons for all experiments
(reference ``src/ut_run_render.py``, Open3D-optional — see utils/render)."""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import yaml

from pcc_geo_cnn_v2_tpu.utils import pc_io
from pcc_geo_cnn_v2_tpu.utils.render import render_comparison

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="ut_run_render")
    parser.add_argument("experiment_yml")
    parser.add_argument("--img_size", type=int, default=1024)
    parser.add_argument("--axis", type=int, default=2)
    args = parser.parse_args(argv)

    spec = yaml.safe_load(Path(args.experiment_yml).read_text())
    exp_dir = Path(spec["experiment_dir"])
    originals = {d["pc_name"]: d["input_pc"] for d in spec["data"]}

    n = 0
    for dec in sorted(exp_dir.glob("*/*/*/*.dec.ply")):
        out_png = dec.with_suffix(".render.png")
        if out_png.exists():
            continue
        pc_name = dec.parts[len(exp_dir.parts)]
        ori_path = originals.get(pc_name)
        if ori_path is None:
            logger.warning("no original for %s", pc_name)
            continue
        ori, _ = pc_io.read_ply(ori_path, columns=["x", "y", "z"])
        pts, _ = pc_io.read_ply(dec, columns=["x", "y", "z"])
        if len(pts) == 0:
            continue
        render_comparison(ori, pts, out_png, axis=args.axis,
                          img_size=args.img_size)
        n += 1
    logger.info("rendered %d comparisons", n)


if __name__ == "__main__":
    main()
