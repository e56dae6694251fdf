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


def test_rd_ladder_data_csv(tmp_path):
    """tools/rd_ladder.py emits results/data.csv in the reference's
    published-results schema (/root/reference/data.csv:1) from whatever
    subset of rung artifacts exists."""
    import csv
    import subprocess
    import sys
    from pathlib import Path

    def artifact(lmbdas, d2=True, d2_group=False):
        points = [
            {"lmbda": l, "pc_name": pc, "bpp": 0.2 + 0.3 * i + j * 0.01,
             "d1_psnr": 60.0 + 2 * i + j,
             **({"d2_psnr": 62.0 + 2 * i + j} if d2 else {})}
            for i, l in enumerate(lmbdas)
            for j, pc in enumerate(["figure_200", "figure_201"])
        ]
        if d2_group:  # rd_eval --d2_group: a d2-optimized bitstream row
            points += [
                {"lmbda": l, "pc_name": pc, "opt_group": "d2",
                 "bpp": 0.21 + 0.3 * i + j * 0.01,
                 "d2_psnr": 62.5 + 2 * i + j}
                for i, l in enumerate(lmbdas)
                for j, pc in enumerate(["figure_200", "figure_201"])
            ]
        curve = lambda m: [  # noqa: E731
            [0.2 + 0.3 * i, {"d1": 60.5, "d2": 62.5}[m] + 2 * i]
            for i in range(len(lmbdas))]
        anchor_pts = [
            {"scale": s, "pc_name": pc, "bpp": 1.0 + s,
             "d1_psnr": 58.0 + s, **({"d2_psnr": 59.0 + s} if d2 else {})}
            for s in (0.5, 0.75) for pc in ["figure_200", "figure_201"]]
        rep = {"points": points, "avg_curve": curve("d1"),
               "anchor_points": anchor_pts,
               "anchor_avg_curve": [[0.1, 52.0], [0.5, 56.0],
                                     [2.0, 60.0]],
               "train_steps": {f"{l:.2e}": 1000 for l in lmbdas}}
        if d2:
            rep["avg_curve_d2"] = curve("d2")
            rep["anchor_avg_curve_d2"] = [[0.1, 53.0], [0.5, 57.0],
                                          [2.0, 61.0]]
        return rep

    res = tmp_path / "results"
    res.mkdir()
    (res / "rd_c2_fixedthr.json").write_text(
        json.dumps(artifact([1e-5, 5e-5])))
    (res / "rd_c3p_a09_fixedthr.json").write_text(
        json.dumps(artifact([1e-5, 5e-5, 3e-4], d2_group=True)))
    script = Path(__file__).resolve().parent.parent / "tools/rd_ladder.py"
    proc = subprocess.run([sys.executable, str(script)], cwd=tmp_path,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr

    ladder = json.loads((res / "config_ladder.json").read_text())
    by_id = {r["run_id"]: r for r in ladder["rows"]}
    assert by_id["c1 (fixed thr)"]["status"] == "missing"
    c3 = by_id["c3p-a0.9 (fixed thr)"]
    assert isinstance(c3["bd_psnr_vs_builtin_anchor"], float)
    assert isinstance(c3["bd_psnr_d2_vs_builtin_anchor"], float)
    assert c3["train_steps_per_lambda"]["1.00e-05"] == 1000

    with (res / "data.csv").open() as f:
        rows = list(csv.DictReader(f))
    assert list(rows[0].keys()) == [
        "eval_id", "label", "metric", "mode_id", "opt_group",
        "pc_name", "x", "y", "ylabel"]
    # anchor (2 scales x 2 pcs x 2 metrics) + c2 (4 pts x 2 metrics)
    # + c3 (6 pts x 2 metrics + 6 d2-group pts x 1 metric)
    assert len(rows) == 8 + 8 + 12 + 6
    labels = {(r["label"], r["metric"], r["mode_id"], r["opt_group"],
               r["ylabel"]) for r in rows}
    assert ("c3", "d2_psnr", "c3p", "d1", "D2 PSNR (dB)") in labels
    assert ("c3", "d2_psnr", "c3p", "d2", "D2 PSNR (dB)") in labels
    # d2-group points emit ONLY the d2 metric
    assert ("c3", "d1_psnr", "c3p", "d2", "D1 PSNR (dB)") not in labels
    assert ("c2", "d1_psnr", "c2", "d1", "D1 PSNR (dB)") in labels
    assert ("CABAC octree (builtin)", "d1_psnr", "octree-cabac", "d1",
            "D1 PSNR (dB)") in labels
    assert all(float(r["x"]) > 0 and float(r["y"]) > 40 for r in rows)
