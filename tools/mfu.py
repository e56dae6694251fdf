"""Analytic FLOP model + MFU calculator for the codec's conv stacks.

VERDICT r2 #2 asks: make the fused-conv decision from data — either a
Pallas analysis kernel halves encode device time, or a written MFU
analysis shows XLA already saturates the MXU (<2x headroom). This tool
provides the denominator: exact conv FLOPs per 64³ block for any named
config, the speed-of-light ms/block at a given peak, and achieved MFU
for measured per-pass times (from tools/profile_encode.py).

Key structural facts it surfaces (c3p, 64³):
- synthesis (decode) is ~12x the analysis FLOPs — the 64³-resolution
  deconv stages dominate everything;
- the first/last stages run at 1-16 channels, which cannot fill the
  MXU's 128-lane contraction: their speed-of-light is set by HBM
  bandwidth on the 64³ activation tensors, not by FLOPs. The bandwidth
  bound is printed alongside.

Usage: python tools/mfu.py [--config c3p] [--peak_tflops 197]
       [--hbm_gbps 819] [--measured pass=ms_per_block ...]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def conv_flops(out_vox, k, cin, cout):
    return 2 * out_vox * (k ** 3) * cin * cout


def conv_bytes(in_vox, out_vox, cin, cout, k, dtype_bytes=2):
    """HBM traffic lower bound: read input + write output (+ weights)."""
    return dtype_bytes * (in_vox * cin + out_vox * cout) + 4 * k**3 * cin * cout


def stack_cost(config, block=64):
    """Per-block (FLOPs, bytes) per pass for a named config."""
    from pcc_geo_cnn_v2_tpu.models.configs import MODEL_CONFIGS

    cfg = MODEL_CONFIGS[config] if isinstance(config, str) else config
    f = cfg["num_filters"]
    progressive = "Progressive" in cfg["analysis"]
    v2_blocks = "Block" in cfg["analysis"] or "V2" in cfg["analysis"]
    passes = {}

    def seq(entries):
        fl = by = 0
        for (res_in, res_out, k, cin, cout) in entries:
            fl += conv_flops(res_out ** 3, k, cin, cout)
            by += conv_bytes(res_in ** 3, res_out ** 3, cin, cout, k)
        return fl, by

    B = block
    if not v2_blocks:  # V1: k9/k5/k5 stride-2 stacks
        analysis = [(B, B // 2, 9, 1, f), (B // 2, B // 4, 5, f, f),
                    (B // 4, B // 8, 5, f, f)]
        synthesis = [(B // 8, B // 4, 5, f, f), (B // 4, B // 2, 5, f, f),
                     (B // 2, B, 9, f, 1)]
    else:
        fr = (f // 4, f // 2, f) if progressive else (f // 2, f, f)
        analysis, cin, r = [], 1, B
        for w in fr:
            analysis += [(r, r // 2, 3, cin, w), (r // 2, r // 2, 3, w, w),
                         (r // 2, r // 2, 3, w, w)]
            cin, r = w, r // 2
        analysis += [(r, r, 3, cin, f)]
        synthesis, cin, r = [], f, B // 8
        for w in reversed(fr):
            synthesis += [(r, 2 * r, 3, cin, w), (2 * r, 2 * r, 3, w, w),
                          (2 * r, 2 * r, 3, w, w)]
            cin, r = w, 2 * r
        synthesis += [(r, r, 3, cin, 1)]
    passes["analysis"] = seq(analysis)
    passes["synthesis"] = seq(synthesis)
    if cfg["model"] == "v2":
        ry = B // 8
        hyper_a = [(ry, ry, 3, f, f), (ry, ry // 2, 3, f, f),
                   (ry // 2, ry // 2, 3, f, f)]
        hyper_s = [(ry // 2, ry // 2, 3, f, f), (ry // 2, ry, 3, f, f),
                   (ry, ry, 3, f, f)]
        passes["hyper_analysis"] = seq(hyper_a)
        passes["hyper_synthesis"] = seq(hyper_s)
    return passes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="c3p")
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="bf16 peak of the chip (TPU v5e: ~197)")
    ap.add_argument("--hbm_gbps", type=float, default=819.0,
                    help="HBM bandwidth (v5e: ~819 GB/s)")
    ap.add_argument("--measured", nargs="*", default=[],
                    help="pass=ms_per_block entries from profiling")
    args = ap.parse_args()

    measured = dict(kv.split("=") for kv in args.measured)
    passes = stack_cost(args.config, args.block)
    print(f"{args.config} @ {args.block}³ — speed of light per block "
          f"(peak {args.peak_tflops} TF bf16, {args.hbm_gbps} GB/s):")
    tot_fl = tot_by = 0.0
    for name, (fl, by) in passes.items():
        tot_fl += fl
        tot_by += by
        t_mxu = fl / (args.peak_tflops * 1e12) * 1e3
        t_hbm = by / (args.hbm_gbps * 1e9) * 1e3
        line = (f"  {name:<16} {fl/1e9:7.2f} GFLOP {by/1e6:8.1f} MB   "
                f"SoL {max(t_mxu, t_hbm):6.3f} ms "
                f"({'HBM' if t_hbm > t_mxu else 'MXU'}-bound)")
        if name in measured:
            ms = float(measured[name])
            line += (f"   measured {ms:7.2f} ms → "
                     f"{100 * fl / (ms / 1e3) / (args.peak_tflops * 1e12):5.1f}% MFU, "
                     f"{max(t_mxu, t_hbm) / ms:6.1%} of SoL")
        print(line)
    t_mxu = tot_fl / (args.peak_tflops * 1e12) * 1e3
    t_hbm = tot_by / (args.hbm_gbps * 1e9) * 1e3
    print(f"  {'TOTAL':<16} {tot_fl/1e9:7.2f} GFLOP {tot_by/1e6:8.1f} MB   "
          f"SoL {max(t_mxu, t_hbm):6.3f} ms")


if __name__ == "__main__":
    main()
