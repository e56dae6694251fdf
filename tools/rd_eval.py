"""RD evaluation of the c3p-a0.75 λ sweep on held-out figure clouds.

For each λ checkpoint produced by ``tools/rd_train_all.py``, compresses
four held-out 10-bit scan-like clouds (``utils/scansim.py``), records
bpp + full-cloud D1 PSNR (device metric path), and decodes to verify the
bit-exactness contract. Writes ``results/rd_c3p_a075.json`` plus BD-rate/
BD-PSNR of the average curve against the reference's published c3p/c4
curves (``/root/reference/data.csv`` — real scans, so the BD number is a
*positioning* indicator across content, not a same-content comparison;
no MPEG clouds are mountable in this environment).

Usage: python tools/rd_eval.py [model_root] [--out results/rd_c3p_a075.json]
"""

import argparse
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

EVAL_SEEDS = [200, 201, 202, 203]
RESOLUTION = 1024
LEVEL = 4


def reference_curves(metric="d1_psnr", labels=("c3", "c4"), opt_group="d1"):
    """Per-label average RD curve over the 4 MPEG PCs from data.csv.

    Labels per ``ev_experiment.yml``: c3=c3p, c4=c3p-a0.75 (ours), c6=c4-ws.
    data.csv carries d2_psnr rows under opt_group d2 (d2-optimized
    encodes); pass metric="d2_psnr", opt_group="d2" for those.
    """
    import csv

    rows = [r for r in csv.DictReader(open("/root/reference/data.csv"))
            if r["eval_id"] == "main" and r["metric"] == metric
            and r["opt_group"] == opt_group]
    out = {}
    for label in labels:
        per_pc = {}
        for r in rows:
            if r["label"] != label:
                continue
            per_pc.setdefault(r["pc_name"], []).append(
                (float(r["x"]), float(r["y"])))
        if not per_pc:
            continue
        # average curves pointwise by rate rank (all PCs share the λ grid)
        n = min(len(v) for v in per_pc.values())
        pts = np.mean(
            [sorted(v)[:n] for v in per_pc.values()], axis=0)
        out[label] = pts  # [(bpp, psnr)...]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_root", nargs="?", default=None,
                    help="default: models/rd/<config>[-a<alpha>]")
    ap.add_argument("--config", default="c3p",
                    choices=["c1", "c2", "c3", "c3p"])
    ap.add_argument("--run_id", default=None,
                    help="run dir name under models/rd/ (default "
                         "c3p-a0.75 for c3p, else <config>)")
    ap.add_argument("--out", default=None,
                    help="default: results/rd_<run_id>.json")
    ap.add_argument("--fixed_threshold", action="store_true",
                    help="encode with the reference's fixed mid-threshold "
                         "path (its c1..c4 eval protocol) instead of the "
                         "adaptive device sweep; metrics via host oracle")
    ap.add_argument("--d2_group", action="store_true",
                    help="additionally encode a d2-optimized bitstream "
                         "group per cloud (the reference encodes per d1 "
                         "AND d2 opt groups, compress_octree.py:109-118, "
                         "and publishes d2_psnr rows on the d2 group in "
                         "data.csv); adds opt_group='d2' rows to the "
                         "artifact. Adaptive path only.")
    ap.add_argument("--batch_blocks", type=int, default=64)
    ap.add_argument("--resolution", type=int, default=RESOLUTION)
    ap.add_argument("--level", type=int, default=LEVEL)
    ap.add_argument("--seeds", nargs="*", type=int, default=EVAL_SEEDS)
    ap.add_argument("--anchor_only", action="store_true",
                    help="recompute only the anchor curve + BD sections, "
                    "reusing the learned points already in --out (pure "
                    "host work: safe to run on CPU without checkpoints)")
    ap.add_argument("--from-assets", action="store_true", dest="from_assets",
                    help="load params from the committed reboot-proof "
                         "assets (pcc_geo_cnn_v2_tpu/assets/rd/<run_id>/, "
                         "written by tools/export_rd_assets.py) instead "
                         "of models/rd orbax checkpoints — regenerates "
                         "any committed results/rd_*.json with zero "
                         "training")
    args = ap.parse_args()
    assert not (args.d2_group and args.fixed_threshold), \
        "--d2_group needs the adaptive sweep path"
    if args.run_id is None:
        args.run_id = "c3p-a0.75" if args.config == "c3p" else args.config
    if args.model_root is None:
        args.model_root = f"models/rd/{args.run_id}"
    if args.out is None:
        args.out = ("results/rd_c3p_a075.json" if args.run_id == "c3p-a0.75"
                    and not args.fixed_threshold else
                    "results/rd_" + args.run_id.replace("-", "_").replace(
                        ".", "") + ("_fixedthr" if args.fixed_threshold
                                    else "") + ".json")
    resolution, level = args.resolution, args.level
    if args.anchor_only:
        import os

        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        jax.config.update("jax_platforms", "cpu")

    from pcc_geo_cnn_v2_tpu.cli.common import load_params
    from pcc_geo_cnn_v2_tpu.codec import BlockCodec
    from pcc_geo_cnn_v2_tpu.coding.syntax import save_compressed_file
    from pcc_geo_cnn_v2_tpu.models.configs import build_model
    from pcc_geo_cnn_v2_tpu.utils.octree import partition_octree
    from pcc_geo_cnn_v2_tpu.utils.scansim import figure_cloud

    if not args.anchor_only:
        print("devices:", jax.devices(), flush=True)
    # normals give every artifact row a d2_psnr column next to d1_psnr,
    # matching the reference data.csv schema (metric d1_psnr/d2_psnr)
    clouds = {}
    for seed in args.seeds:
        pts, nrm = figure_cloud(seed, resolution, with_normals=True)
        # the d2-group sweep needs normals columns on the blocks and the
        # points array itself (codec._get_normals reads cols 3:6)
        part_pts = np.hstack([pts, nrm]) if args.d2_group else pts
        blocks, binstr = partition_octree(
            part_pts, [0, 0, 0], [resolution] * 3, level)
        clouds[f"figure_{seed}"] = (part_pts, nrm, blocks, binstr)
        print(f"figure_{seed}: {len(pts)} pts, {len(blocks)} blocks",
              flush=True)

    train_steps = {}
    if args.anchor_only:
        prev = json.loads(Path(args.out).read_text())
        results = prev["points"]
        train_steps = prev.get("train_steps", {})
        run_dirs = []
    elif args.from_assets:
        # assets mirror the models/rd run-dir layout (e.g. the α=0.9 run
        # lives under 'c3p' per the trainer's run-id rule, even though
        # its eval run_id is 'c3p-a0.9')
        asset_root = (Path(__file__).resolve().parent.parent
                      / "pcc_geo_cnn_v2_tpu/assets/rd"
                      / Path(args.model_root).name)
        run_dirs = sorted(asset_root.glob("*e-*.msgpack.gz"),
                          key=lambda p: float(p.name[:-len(".msgpack.gz")]))
        assert run_dirs, f"no exported λ assets under {asset_root}"
        manifest = json.loads((asset_root / "manifest.json").read_text())
        train_steps = {tag: m["ckpt_step"] for tag, m in manifest.items()}
        model = build_model(args.config)
        results = []
    else:
        run_dirs = sorted(Path(args.model_root).glob("*e-*"),
                          key=lambda p: float(p.name))
        assert run_dirs, f"no λ checkpoints under {args.model_root}"
        model = build_model(args.config)
        results = []
    codec = None
    for run_dir in run_dirs:
        if args.from_assets:
            from pcc_geo_cnn_v2_tpu.cli.common import load_params_asset

            lmbda = float(run_dir.name[:-len(".msgpack.gz")])
            params = load_params_asset(model, run_dir)
        else:
            lmbda = float(run_dir.name)
            params = load_params(model, run_dir)
            ckpts = sorted(run_dir.glob("ckpt_*"),
                           key=lambda p: int(p.name.split("_")[1]))
            if ckpts:
                train_steps[run_dir.name] = int(
                    ckpts[-1].name.split("_")[1])
        if codec is None:
            codec = BlockCodec(model, params,
                               block_size=resolution // 2 ** level,
                               batch_blocks=args.batch_blocks)
        else:
            # weights are traced args: swapping them keeps every
            # compiled executable warm across the λ sweep
            codec.set_params(params)
        from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics as _cm
        from pcc_geo_cnn_v2_tpu.utils.octree import departition_octree

        for name, (pts, nrm, blocks, binstr) in clouds.items():
            t0 = time.time()
            if args.fixed_threshold:
                data_list, _ = codec.compress_blocks(
                    blocks, binstr, pts, resolution, level,
                    fixed_threshold=True)
            elif args.d2_group:
                data_list, meta = codec.compress_blocks_device_opt(
                    blocks, binstr, pts, resolution, level,
                    opt_metrics=("d1_mse", "d2_mse"), with_normals=True)
            else:
                data_list, meta = codec.compress_blocks_device_opt(
                    blocks, binstr, pts, resolution, level)
            # decode the d1-group bitstream and score it on host with
            # normals: one decode yields both metric columns of the
            # reference's data.csv rows (d1_psnr + d2_psnr). With the
            # adaptive sweep the device-side d1 is authoritative
            # (<0.01 dB host agreement is tested elsewhere); the host
            # value is recorded alongside as d1_psnr_host.
            dec_blocks = codec.decompress_blocks(data_list[0])
            dec = np.vstack(departition_octree(
                dec_blocks, binstr, [0, 0, 0], [resolution] * 3, level))
            m = _cm(pts[:, :3], dec, resolution - 1, p1_n=nrm)
            row = {"lmbda": lmbda, "pc_name": name,
                   "d2_psnr": m["d2_psnr"]}
            if args.fixed_threshold:
                row["d1_psnr"] = m["d1_psnr"]
            else:
                row["d1_psnr"] = meta[0]["metrics"]["d1_psnr"]
                row["d1_psnr_host"] = m["d1_psnr"]
            raw = gzip.compress(
                save_compressed_file(binstr, data_list[0], resolution,
                                     level))
            row["bpp"] = len(raw) * 8 / len(pts)
            results.append(row)
            print(f"λ={lmbda:g} {name}: {row['bpp']:.3f} bpp @ "
                  f"{row['d1_psnr']:.2f} dB d1 / {row['d2_psnr']:.2f} dB "
                  f"d2 ({time.time()-t0:.0f}s)", flush=True)
            if args.d2_group:
                # second row from the d2-optimized bitstream (reference
                # publishes d2_psnr on THIS group, opt_group d2). Device
                # d2 is authoritative; decode + host-score for agreement.
                t0 = time.time()
                dec2_blocks = codec.decompress_blocks(data_list[1])
                assert all(np.array_equal(d, e) for d, e in zip(
                    dec2_blocks, meta[1]["x_hat_list"])), \
                    "d2-group decode != encoder reconstruction"
                dec2 = np.vstack(departition_octree(
                    dec2_blocks, binstr, [0, 0, 0], [resolution] * 3,
                    level))
                m2 = _cm(pts[:, :3], dec2, resolution - 1, p1_n=nrm)
                raw2 = gzip.compress(save_compressed_file(
                    binstr, data_list[1], resolution, level))
                # host KD scoring is authoritative for the published
                # row (the reference's d2_psnr comes from pc_error, KD
                # semantics); the enc-side device value is recorded for
                # the agreement bound — its min-plane-among-ties rule
                # is systematically optimistic on dense integer grids
                # (+0.1-0.4 dB observed, r5 flagship eval)
                row2 = {"lmbda": lmbda, "pc_name": name,
                        "opt_group": "d2",
                        "bpp": len(raw2) * 8 / len(pts),
                        "d2_psnr": m2["d2_psnr"],
                        "d2_psnr_enc": meta[1]["metrics"]["d2_psnr"],
                        "d1_psnr_on_d2_group": m2["d1_psnr"]}
                results.append(row2)
                print(f"λ={lmbda:g} {name} [d2 group]: "
                      f"{row2['bpp']:.3f} bpp @ {row2['d2_psnr']:.2f} dB "
                      f"d2 (host {m2['d2_psnr']:.2f}) "
                      f"({time.time()-t0:.0f}s)", flush=True)

    # builtin octree anchor curve on the same clouds (the reference's
    # headline comparison is learned-vs-G-PCC; tmc3 is absent here, so
    # the in-repo octree anchor stands in — see coding/octree_anchor.py)
    from pcc_geo_cnn_v2_tpu.coding.octree_anchor import (
        anchor_decode,
        anchor_encode,
    )
    from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics

    anchor_results = []
    for name, (pts, nrm, _, _) in clouds.items():
        # near-1 scales extend the curve into the learned curve's PSNR
        # range (67-72 dB) so BD-rate — not just BD-PSNR — is defined
        for scale in (0.96875, 0.9375, 0.875, 0.75, 0.5, 0.25, 0.125,
                      0.0625):
            data = anchor_encode(pts, resolution, scale=scale)
            dec, _ = anchor_decode(data)
            m = compute_metrics(pts[:, :3], dec, resolution - 1, p1_n=nrm)
            anchor_results.append({
                "scale": scale, "pc_name": name,
                "bpp": len(data) * 8 / len(pts),
                "d1_psnr": m["d1_psnr"],
                "d2_psnr": m["d2_psnr"],
            })
            print(f"anchor s={scale} {name}: "
                  f"{anchor_results[-1]['bpp']:.3f} bpp @ "
                  f"{m['d1_psnr']:.2f} dB d1 / {m['d2_psnr']:.2f} dB d2",
                  flush=True)

    # average curve + BD vs reference published curves
    from pcc_geo_cnn_v2_tpu.utils.bd import bdrate, bdsnr

    def bdsnr_safe(ref, ours):
        try:
            return bdsnr([tuple(p) for p in ref], [tuple(p) for p in ours])
        except Exception as e:  # disjoint rate ranges etc.
            return f"n/a ({e})"

    def bdrate_safe(ref, ours):
        try:
            return bdrate([tuple(p) for p in ref], [tuple(p) for p in ours])
        except Exception as e:
            return f"n/a ({e})"

    lambdas = sorted({r["lmbda"] for r in results})
    # rows carry opt_group='d2' when --d2_group encoded a second,
    # d2-optimized bitstream; its curve must not mix with the d1 group's
    rows_d1 = [r for r in results if r.get("opt_group", "d1") == "d1"]
    rows_d2g = [r for r in results if r.get("opt_group") == "d2"]
    # mirror of the reference's bd_ignore mask (ev_experiment.yml:115
    # drops 'c4-ws/1.00e-05'): an undertrained low-λ model can produce an
    # empty reconstruction on a cloud (fixed threshold 0.5 clears nothing
    # → D1 PSNR = −inf). Exclude non-finite cloud-points from the per-λ
    # average — BD interpolation over a −inf point is nan — and record
    # what was dropped. A λ with no finite cloud at all is dropped whole.
    ignored = [
        {"lmbda": r["lmbda"], "pc_name": r["pc_name"], "bpp": r["bpp"]}
        for r in rows_d1 if not np.isfinite(r["d1_psnr"])
    ]

    def avg_curve(rows, key, keyvals, metric):
        # per-key (λ or scale) mean over clouds with a finite metric;
        # rows from pre-d2 artifacts (anchor_only reuse) lack d2_psnr
        # and are skipped wholesale
        return [
            (float(np.mean([r["bpp"] for r in pts])),
             float(np.mean([r[metric] for r in pts])))
            for k in keyvals
            if (pts := [r for r in rows
                        if r[key] == k
                        and np.isfinite(r.get(metric, np.nan))])
        ]

    scales = sorted({r["scale"] for r in anchor_results}, reverse=True)
    avg = avg_curve(rows_d1, "lmbda", lambdas, "d1_psnr")
    # the d2 curve comes from the d2-optimized group when one was
    # encoded (the reference's published convention); otherwise from the
    # d1-group bitstream scored with d2 (documented in data.csv notes)
    avg_d2 = avg_curve(rows_d2g or rows_d1, "lmbda", lambdas, "d2_psnr")
    anchor_avg = avg_curve(anchor_results, "scale", scales, "d1_psnr")
    anchor_avg_d2 = avg_curve(anchor_results, "scale", scales, "d2_psnr")
    report = {"points": results, "avg_curve": avg,
              "avg_curve_d2": avg_d2,
              "d2_group_encoded": bool(rows_d2g),
              "train_steps": train_steps,
              "bd_ignore_points": ignored,
              "anchor_points": anchor_results,
              "anchor_avg_curve": anchor_avg,
              "anchor_avg_curve_d2": anchor_avg_d2,
              "bd_vs_builtin_octree_anchor": {
                  "bd_psnr_db": bdsnr_safe(anchor_avg, avg),
                  "bd_rate_pct": bdrate_safe(anchor_avg, avg),
                  "note": "same-content comparison on the 4 held-out "
                          "figure clouds; anchor entropy backend is the "
                          "context-adaptive binary range coder "
                          "(coding/octree_anchor.py)",
              },
              "bd_vs_reference": {}}
    if avg_d2 and anchor_avg_d2:
        report["bd_vs_builtin_octree_anchor_d2"] = {
            "bd_psnr_db": bdsnr_safe(anchor_avg_d2, avg_d2),
            "bd_rate_pct": bdrate_safe(anchor_avg_d2, avg_d2),
            "note": "point-to-plane (d2) variant of the same-content "
                    "comparison; normals are scansim's analytic ones",
        }
    for label, ref in reference_curves().items():
        ours = [(b, p) for b, p in avg]
        report["bd_vs_reference"][label] = {
            "bd_rate_pct": bdrate_safe(ref.tolist(), ours),
            "bd_psnr_db": bdsnr_safe(ref.tolist(), ours),
            "note": "cross-content positioning (synthetic figures vs MPEG "
                    "scans), not a same-content comparison",
        }
    if avg_d2:
        for label, ref in reference_curves(
                metric="d2_psnr", opt_group="d2").items():
            report["bd_vs_reference"][label + "_d2"] = {
                "bd_rate_pct": bdrate_safe(ref.tolist(), avg_d2),
                "bd_psnr_db": bdsnr_safe(ref.tolist(), avg_d2),
                "note": "cross-content d2 positioning; reference rows "
                        "are d2-optimized encodes (opt_group d2), ours "
                        + ("is the d2-optimized group too" if rows_d2g
                           else "is the d1-group bitstream scored with "
                                "d2"),
            }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps({"avg_curve": avg,
                      "bd_vs_reference": report["bd_vs_reference"]},
                     indent=2), flush=True)


if __name__ == "__main__":
    main()
