"""Export an orbax training checkpoint as the committed bench asset.

bench.py loads ``pcc_geo_cnn_v2_tpu/assets/bench_c3p.msgpack.gz`` so the
driver benchmark measures the codec at a realistic RD operating point.
Round 1's asset operated at 3.6 bpp / 52.6 dB — far off the reference's
0.2–0.9 bpp regime (VERDICT r1); re-export from the RD sweep's trained
models instead.

Usage: python tools/export_bench_ckpt.py models/rd/c3p-a0.75/3.00e-04
"""

import gzip
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")

from flax import serialization

from pcc_geo_cnn_v2_tpu.cli.common import load_params
from pcc_geo_cnn_v2_tpu.models.configs import build_model

OUT = (Path(__file__).resolve().parent.parent
       / "pcc_geo_cnn_v2_tpu/assets/bench_c3p.msgpack.gz")


def main():
    ckpt_dir = sys.argv[1]
    model = build_model("c3p")
    params = load_params(model, ckpt_dir)
    with gzip.open(OUT, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"exported {ckpt_dir} -> {OUT} ({OUT.stat().st_size/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
