"""Normalize d2-group rows in rd_*.json artifacts to host-authoritative.

Artifacts produced before the r5 rd_eval change carry the enc-side
device d2 as ``d2_psnr`` and the host KD value as ``d2_psnr_host``.
The published convention (reference pc_error) is host/KD semantics and
the device value's min-plane-among-ties rule is systematically
optimistic, so this tool rewrites such rows in place
(d2_psnr <- host value, d2_psnr_enc <- device value), recomputes
``avg_curve_d2`` accordingly, and prints the enc-vs-host agreement
bound per artifact. Idempotent; artifacts already in the new shape are
untouched.

Usage: python tools/fix_d2_rows.py results/rd_*.json
"""

import json
import sys
from pathlib import Path

import numpy as np


def fix(path: Path) -> None:
    rep = json.loads(path.read_text())
    rows = rep.get("points", [])
    d2g = [r for r in rows if r.get("opt_group") == "d2"]
    changed = 0
    gaps = []
    for r in d2g:
        if "d2_psnr_host" in r:  # old shape
            r["d2_psnr_enc"] = r.pop("d2_psnr")
            r["d2_psnr"] = r.pop("d2_psnr_host")
            changed += 1
        if "d2_psnr_enc" in r:
            gaps.append(abs(r["d2_psnr_enc"] - r["d2_psnr"]))
    if changed:
        lambdas = rep.get("lambdas") or sorted(
            {r["lmbda"] for r in d2g}, reverse=True)
        curve = []
        for lam in lambdas:
            pts = [r for r in d2g if r["lmbda"] == lam]
            if pts:
                curve.append([float(np.mean([p["bpp"] for p in pts])),
                              float(np.mean([p["d2_psnr"] for p in pts]))])
        if curve:
            rep["avg_curve_d2"] = curve
        path.write_text(json.dumps(rep, indent=2))
    bound = f"{max(gaps):.3f} dB" if gaps else "n/a"
    print(f"{path}: {changed} rows normalized, enc-vs-host d2 bound {bound}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        fix(Path(p))
