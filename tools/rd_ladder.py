"""Config-ladder report: within-repo BD deltas vs the published ordering.

The reference's headline ablation (BASELINE.md, computed from
``/root/reference/data.csv``) is the BD-PSNR ladder vs the G-PCC trisoup
anchor on 4 MPEG clouds: c1 −0.72 → c2 −0.25 → c3 +1.79 → c4 +3.71 →
c5 +5.39 dB. Label↔protocol map (``ev_experiment.yml:10-46``): c1/c2 =
configs c1/c2, c3 = config c3p α0.9, c4 = c3p α0.75 — all evaluated with
the FIXED mid-threshold (the yml's global ``fixed_threshold: True``);
c5 = the c4 checkpoints with the ADAPTIVE threshold sweep. No MPEG cloud
can be mounted here, so the content-independent parity check is the
*config-to-config deltas*: each rung's BD-PSNR vs the SAME builtin
octree anchor on the same 4 held-out synthetic clouds, then successive
differences next to the published ones.

Inputs: ``results/rd_<run_id>[_fixedthr].json`` files produced by
``tools/rd_eval.py`` (any subset works).
Output: ``results/config_ladder.json`` + ``results/data.csv`` (the
reference's published-results schema, ``/root/reference/data.csv:1``:
``eval_id,label,metric,mode_id,opt_group,pc_name,x,y,ylabel``) + a
printed table.

Usage: python tools/rd_ladder.py
"""

import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# ladder rung -> (results file, published BD-PSNR vs trisoup)
# All fixed-thr rungs train at ONE uniform budget (10k base + 1.5k ft
# warm-seq) so successive deltas compare configs, not training budgets
# (advisor r3). The c5 analogue (adaptive threshold on the c4
# checkpoints) appears twice: once on the SAME ladder-budget checkpoints
# as the fixed-thr rung (the controlled delta — published Δ compares c5
# to c4 on identical checkpoints too) and once as the full-protocol
# flagship artifact (absolute positioning; its Δ is training-
# contaminated and reported for context only).
# (rung, results file, published BD-PSNR d1, published BD-PSNR d2).
# The d2 column is computed from data.csv the same way as BASELINE.md's
# d1 column (utils/bd.bdsnr on the 4-PC average curve vs trisoup,
# metric d2_psnr / opt_group d2): c1 −2.39, c2 −1.62, c3 +1.19,
# c4 +3.68, c5 +6.41.
RUNGS = [
    ("c1 (fixed thr)", "results/rd_c1_fixedthr.json", -0.72, -2.39),
    ("c2 (fixed thr)", "results/rd_c2_fixedthr.json", -0.25, -1.62),
    ("c3p-a0.9 (fixed thr)", "results/rd_c3p_a09_fixedthr.json",
     1.79, 1.19),
    ("c3p-a0.75 (fixed thr)", "results/rd_c3p_a075_fixedthr.json",
     3.71, 3.68),
    # α ablation twins of the c3p-a0.75 rung (same uniform budget;
    # reference rows labeled '$\alpha = …$' in data.csv, fixed thr;
    # published BDs computed the same way as the c-rung columns)
    ("c3p-a0.5 (fixed thr)", "results/rd_c3p_a05_fixedthr.json",
     3.70, 6.07),
    ("c3p-a0.25 (fixed thr)", "results/rd_c3p_a025_fixedthr.json",
     -0.22, 3.54),
    # paper c5 = INDEPENDENTLY-trained c3p-a0.75 checkpoints + adaptive
    # sweep (ev_experiment.yml: id 'c4' reuses checkpoint_id
    # 'c3p-a0.75'); paper c6 = the same protocol on WARM-SEQ-trained
    # checkpoints (id 'c4-ws'). Every repo rung trains warm-seq, so the
    # pre-r5 'adaptive, same ckpts' rung is the c6 analogue; the
    # independent arm (models/rd10k_ind) supplies the c5 analogue.
    ("c3p-a0.75 (adaptive, independent ckpts)",
     "results/rd_c3p_a075_ind_adaptive.json", 5.39, 6.42),
    ("c3p-a0.75 (adaptive, warm-seq ckpts)",
     "results/rd_c3p_a075_trim_adaptive.json", 5.50, 6.48),
    ("c3p-a0.75 (adaptive, flagship protocol)",
     "results/rd_c3p_a075.json", 5.50, 6.48),
]


# rung -> (data.csv label, mode_id) following the reference's label map
# (ev_experiment.yml:10-46: c3=c3p-a0.9, c4=c3p-a0.75 fixed-thr,
# c5 = independently-trained c4 checkpoints + adaptive sweep, c6 =
# warm-seq-trained + adaptive). The flagship keeps its own label so the
# uniform-budget c6 rung and the full-protocol artifact are
# distinguishable in the CSV. α ablations use the reference's exact
# label strings.
CSV_LABELS = {
    "c1 (fixed thr)": ("c1", "c1"),
    "c2 (fixed thr)": ("c2", "c2"),
    "c3p-a0.9 (fixed thr)": ("c3", "c3p"),
    "c3p-a0.75 (fixed thr)": ("c4", "c3p-a0.75-10k"),
    "c3p-a0.5 (fixed thr)": ("$\\alpha = 0.50$", "c3p-a0.5"),
    "c3p-a0.25 (fixed thr)": ("$\\alpha = 0.25$", "c3p-a0.25"),
    "c3p-a0.75 (adaptive, independent ckpts)":
        ("c5", "c3p-a0.75-ind+adaptive"),
    "c3p-a0.75 (adaptive, warm-seq ckpts)":
        ("c6", "c3p-a0.75-10k+adaptive"),
    "c3p-a0.75 (adaptive, flagship protocol)":
        ("c6-flagship", "c3p-a0.75"),
}

YLABEL = {"d1_psnr": "D1 PSNR (dB)", "d2_psnr": "D2 PSNR (dB)"}


def write_data_csv(reports):
    """results/data.csv in the reference's published-results schema.

    One row per (rung, metric, cloud, rate point), plus the builtin
    CABAC octree anchor's points (taken from the artifact with the
    most eval clouds — trimmed rungs share seeds, the flagship adds
    one, so the widest anchor is a superset). Points tagged
    ``opt_group: d2`` by ``rd_eval --d2_group`` are true d2-optimized
    bitstreams and emit a (d2_psnr, opt_group=d2) row, matching the
    reference's convention; untagged points are d1-optimized and their
    d2_psnr rows keep opt_group=d1 (measured on the d1 bitstream,
    unlike the reference, which always encodes a second d2 group —
    compress_octree.py:109-118).
    """
    rows = []
    anchor_src = max(
        (rep for _, rep in reports if rep.get("anchor_points")),
        key=lambda rep: len({p["pc_name"] for p in rep["anchor_points"]}),
        default=None,
    )
    if anchor_src is not None:
        for p in anchor_src["anchor_points"]:
            for metric in ("d1_psnr", "d2_psnr"):
                if metric not in p:
                    continue
                rows.append(["main", "CABAC octree (builtin)", metric,
                             "octree-cabac", "d1", p["pc_name"],
                             p["bpp"], p[metric], YLABEL[metric]])
    for run_id, rep in reports:
        label, mode_id = CSV_LABELS.get(run_id, (run_id, run_id))
        for p in rep.get("points", []):
            group = p.get("opt_group", "d1")
            metrics = ("d2_psnr",) if group == "d2" else \
                ("d1_psnr", "d2_psnr")
            for metric in metrics:
                if metric not in p or not np.isfinite(p[metric]):
                    continue
                rows.append(["main", label, metric, mode_id, group,
                             p["pc_name"], p["bpp"], p[metric],
                             YLABEL[metric]])
    out = Path("results/data.csv")
    with out.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["eval_id", "label", "metric", "mode_id", "opt_group",
                    "pc_name", "x", "y", "ylabel"])
        w.writerows(rows)
    print(f"wrote {out} ({len(rows)} rows)")


def main():
    from pcc_geo_cnn_v2_tpu.utils.bd import bdsnr

    # fallback anchor for old artifacts without one (flagship's)
    fallback_anchor = None
    flagship_path = Path("results/rd_c3p_a075.json")
    if flagship_path.exists():
        flagship = json.loads(flagship_path.read_text())
        if flagship.get("anchor_avg_curve"):
            fallback_anchor = [tuple(p) for p in flagship["anchor_avg_curve"]]

    def bd_of(anchor, ours):
        if anchor is None:
            return "n/a (no anchor curve)"
        ours = [q for q in ours if np.isfinite(q[0]) and np.isfinite(q[1])]
        try:
            bd = float(bdsnr([tuple(q) for q in anchor], ours))
            return bd if np.isfinite(bd) else f"n/a (bdsnr={bd})"
        except Exception as e:  # noqa: BLE001 - disjoint ranges etc.
            return f"n/a ({e})"

    rows = []
    reports = []
    for run_id, path, published, published_d2 in RUNGS:
        p = Path(path)
        if not p.exists():
            rows.append({"run_id": run_id, "status": "missing",
                         "published_bd_psnr_vs_trisoup": published})
            continue
        rep = json.loads(p.read_text())
        reports.append((run_id, rep))
        # each rung's BD is against the anchor computed on ITS OWN eval
        # clouds (rd_eval embeds it), so every rung is a same-content
        # comparison; trimmed rungs share seeds 200-202, so their anchor
        # curves — and hence the deltas — are mutually consistent too
        anchor = rep.get("anchor_avg_curve", fallback_anchor)
        bd = bd_of(anchor, [tuple(q) for q in rep["avg_curve"]])
        row = {"run_id": run_id,
               "bd_psnr_vs_builtin_anchor": bd,
               "published_bd_psnr_vs_trisoup": published}
        # d2 columns exist once the rung's artifact was produced by the
        # d2-aware rd_eval (avg_curve_d2 on the d1-group bitstream)
        if rep.get("avg_curve_d2") and rep.get("anchor_avg_curve_d2"):
            row["bd_psnr_d2_vs_builtin_anchor"] = bd_of(
                rep["anchor_avg_curve_d2"],
                [tuple(q) for q in rep["avg_curve_d2"]])
            row["published_bd_psnr_d2_vs_trisoup"] = published_d2
            # True when the d2 curve is from a separately d2-OPTIMIZED
            # bitstream group (rd_eval --d2_group, the reference's
            # published d2 convention) rather than the d1 bitstream
            # scored with d2 (the correct reading for fixed-thr rungs,
            # whose protocol emits a single bitstream)
            row["d2_curve_is_d2_group"] = bool(
                rep.get("d2_group_encoded"))
        # encoder-device vs host-KD d2 agreement bound over the rung's
        # d2-group points — the d2 analogue of the reference's enc-vs-
        # pc_error D1 <0.01 dB cross-check (ev_experiment.py:158-162).
        # Ours is looser by design: the device sweep scores d2 with the
        # own-normal AB approximation (ops/bucket_sweep.py), the
        # published row value is always the host KD-scored one.
        d2pts = [p for p in rep.get("points", [])
                 if p.get("opt_group") == "d2" and "d2_psnr_enc" in p
                 and np.isfinite(p.get("d2_psnr", np.nan))]
        if d2pts:
            row["d2_enc_vs_host_max_abs_db"] = round(
                max(abs(p["d2_psnr_enc"] - p["d2_psnr"])
                    for p in d2pts), 3)
        # advisor r3: publish each rung's per-λ training budget so
        # deltas between rungs trained at different budgets (e.g. the
        # documented c1 10k-base exception) are visibly flagged
        if rep.get("train_steps"):
            row["train_steps_per_lambda"] = rep["train_steps"]
        rows.append(row)

    # successive deltas (the content-independent check)
    for i in range(1, len(rows)):
        a, b = rows[i - 1], rows[i]
        if isinstance(a.get("bd_psnr_vs_builtin_anchor"), float) and \
                isinstance(b.get("bd_psnr_vs_builtin_anchor"), float):
            b["delta_db"] = round(b["bd_psnr_vs_builtin_anchor"]
                                  - a["bd_psnr_vs_builtin_anchor"], 3)
        b["published_delta_db"] = round(
            b["published_bd_psnr_vs_trisoup"]
            - a["published_bd_psnr_vs_trisoup"], 3)
        if isinstance(a.get("bd_psnr_d2_vs_builtin_anchor"), float) and \
                isinstance(b.get("bd_psnr_d2_vs_builtin_anchor"), float):
            b["delta_d2_db"] = round(
                b["bd_psnr_d2_vs_builtin_anchor"]
                - a["bd_psnr_d2_vs_builtin_anchor"], 3)
            b["published_delta_d2_db"] = round(
                b["published_bd_psnr_d2_vs_trisoup"]
                - a["published_bd_psnr_d2_vs_trisoup"], 3)

    report = {
        "note": "within-repo config ladder on 4 held-out synthetic clouds "
                "vs the builtin CABAC octree anchor; 'published' column = "
                "reference data.csv BD-PSNR vs G-PCC trisoup on 4 MPEG "
                "clouds (BASELINE.md). The parity check is the ORDERING "
                "and the successive deltas, not absolute values "
                "(different content, different anchor). Rungs carry "
                "their per-λ training budget (train_steps_per_lambda); "
                "every fixed-thr rung and the same-ckpts adaptive rung "
                "train at the uniform 10k-base + 1.5k-ft warm-seq "
                "budget, so successive deltas compare configs. The "
                "flagship row alone uses the full protocol (40k base, "
                "8k ft, early-stop patience 4000); its delta is "
                "training-contaminated and reported for context. d2 "
                "columns: rows with d2_curve_is_d2_group=true are from "
                "separately d2-OPTIMIZED bitstreams (rd_eval "
                "--d2_group — the reference's published d2 convention "
                "for its adaptive c5/c6 rows); false means the d1 "
                "bitstream scored with the d2 metric, which is the "
                "correct protocol reading for fixed-thr rungs "
                "(reference c1-c4 + alpha rows emit one bitstream, "
                "fixed mid-threshold).",
        "rows": rows,
    }
    out = Path("results/config_ladder.json")
    out.write_text(json.dumps(report, indent=2))
    w = max(len(r["run_id"]) for r in rows)
    print(f"{'rung':<{w}}  {'BD vs anchor':>12}  {'Δ':>7}  "
          f"{'published Δ':>11}")
    for r in rows:
        bd = r.get("bd_psnr_vs_builtin_anchor", "missing")
        bd = f"{bd:.2f}" if isinstance(bd, float) else str(bd)[:12]
        d = r.get("delta_db", "")
        pd = r.get("published_delta_db", "")
        print(f"{r['run_id']:<{w}}  {bd:>12}  {str(d):>7}  {str(pd):>11}")
    print(f"wrote {out}")
    write_data_csv(reports)


if __name__ == "__main__":
    main()
