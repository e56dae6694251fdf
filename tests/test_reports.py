"""mp_report / ut_build_paper contracts on fabricated logs and CSVs."""

import json

import numpy as np
import pandas as pd

from pcc_geo_cnn_v2_tpu.cli import mp_report, ut_build_paper
from pcc_geo_cnn_v2_tpu.utils import pc_io

TMC3_LOG = """\
uncompressedDataPath  : "loot_vox10_1200.ply"
Slice origin: 0 0 0
positions bitstream size 1234 B (2.5 bpp)
colors bitstream size 55 B (0.11 bpp)
Processing time (user): 1.23 s
Total bitstream size 1289 B
"""

PCERROR_LOG = """\
Job started
1. Use infile1 (A) as reference:
   mse1      (p2point): 0.5
   mse1,PSNR (p2point): 60.1
2. Use infile2 (B) as reference:
   mse2      (p2point): 0.6
   mse2,PSNR (p2point): 59.5
3. Final (symmetric).
   mseF      (p2point): 0.6
   mseF,PSNR (p2point): 59.5
Job done
"""


def test_mp_report(tmp_path):
    pts = np.random.default_rng(0).integers(0, 64, (500, 3))
    ply = tmp_path / "in.ply"
    pc_io.write_ply(ply, np.unique(pts, axis=0).astype(np.float64))
    n = len(pc_io.read_ply(ply)[0])
    (tmp_path / "enc.log").write_text(TMC3_LOG)
    (tmp_path / "pc.log").write_text(PCERROR_LOG)
    out = tmp_path / "report.json"
    mp_report.main([str(ply), str(tmp_path / "enc.log"),
                    str(tmp_path / "pc.log"), str(out)])
    rep = json.loads(out.read_text())
    assert rep["pos_bitstream_size_in_bytes"] == 1234
    assert rep["bpp"] == 1234 * 8 / n
    assert rep["d1_psnr"] == 59.5
    assert rep["input_point_count"] == n


def test_ut_build_paper(tmp_path):
    # produce the merged bdsnr.csv EXACTLY as ev_compare + ev_run_compare
    # do: per-PC matrix CSVs (mode index), then source-tagged concat
    frames = []
    for pc, best in (("loot", 2.5), ("soldier", 2.2)):
        df = pd.DataFrame(
            [[np.nan, 1.5, best], [-1.5, np.nan, 1.0], [-best, -1.0, np.nan]],
            index=["anchor", "c1", "c3p"],
            columns=["anchor", "c1", "c3p"],
        )
        per_pc = tmp_path / f"{pc}_d1_psnr_bdsnr.csv"
        df.to_csv(per_pc)  # same as ev_compare.main
        part = pd.read_csv(per_pc)  # same as ev_run_compare merge
        part.insert(0, "source", per_pc.stem)
        frames.append(part)
    csv = tmp_path / "bdsnr.csv"
    pd.concat(frames).to_csv(csv, index=False)
    out = tmp_path / "table.tex"
    ut_build_paper.main([str(csv), str(out), "--anchor", "anchor"])
    tex = out.read_text()
    assert r"\textbf{2.50}" in tex  # best vs anchor bolded
    assert "loot" in tex and "soldier" in tex
