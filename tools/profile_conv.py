"""Per-transform conv-pass timing on the real TPU → achieved MFU table.

VERDICT r2 #2 decision data: for each conv stack of the flagship config
(analysis, synthesis, hyper_analysis, hyper_synthesis) this times the
jitted XLA pass alone (device arrays in, block_until_ready out — no
tunnel transfer in the timed region) across batch sizes, and reports
achieved MFU / fraction-of-speed-of-light using the analytic FLOP+HBM
model in tools/mfu.py. The fused-Pallas-conv call is made from this
table: if XLA is within ~2x of the per-pass speed of light (or the
passes are a small share of the encode wall time, see
tools/profile_encode.py), a hand-written kernel cannot move the bench.

Replaces measurement of the reference's CUDA Conv3D hot loop
(/root/reference/src/model_transforms.py:3).

Usage: python tools/profile_conv.py [--config c3p] [--batches 8 32 64 128]
       (TPU job — serialize with other tunnel users!)
"""

import argparse
import functools
import gzip
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, reps=5):
    jax.block_until_ready(fn())  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="c3p")
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--batches", type=int, nargs="*", default=[8, 32, 64, 128])
    ap.add_argument("--peak_tflops", type=float, default=197.0)
    ap.add_argument("--hbm_gbps", type=float, default=819.0)
    args = ap.parse_args()

    from pcc_geo_cnn_v2_tpu.models.configs import build_model
    from tools.mfu import stack_cost

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.zeros((8,)))
    print(f"tunnel warmup {time.time() - t0:.0f}s", flush=True)

    model = build_model(args.config, dtype=jnp.bfloat16)
    B = args.block
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, B, B, B, 1), jnp.float32),
                        training=False)

    ckpt = (Path(__file__).resolve().parent.parent
            / "pcc_geo_cnn_v2_tpu/assets/bench_c3p.msgpack.gz")
    if args.config == "c3p" and ckpt.exists():
        from flax import serialization
        params = serialization.from_bytes(
            jax.device_get(params), gzip.decompress(ckpt.read_bytes()))
    params = jax.device_put(params)

    costs = stack_cost(args.config, B)
    f = model.num_filters
    ry = B // 8

    def run(m, sub, x):
        return m.apply(params, x, method=lambda mm, xx: getattr(mm, sub)(xx))

    passes = [("analysis", "analysis_t", (B, B, B, 1))]
    # NB: setup() attributes only exist on bound modules — test the config
    # field, not the submodule
    if hasattr(model, "hyper_analysis"):
        passes += [("hyper_analysis", "hyper_analysis_t", (ry, ry, ry, f)),
                   ("hyper_synthesis", "hyper_synthesis_t",
                    (ry // 2, ry // 2, ry // 2, f))]
    passes += [("synthesis", "synthesis_t", (ry, ry, ry, f))]

    print(f"\n{args.config} @ {B}³ bf16 — per-pass XLA timing "
          f"(peak {args.peak_tflops} TF, {args.hbm_gbps} GB/s)")
    print(f"{'pass':<16} {'batch':>5} {'ms/chunk':>9} {'ms/blk':>8} "
          f"{'SoL ms/blk':>10} {'xSoL':>6} {'MFU%':>6}")
    table = {}
    for name, sub, shape in passes:
        fl, by = costs[name]
        sol = max(fl / (args.peak_tflops * 1e12),
                  by / (args.hbm_gbps * 1e9)) * 1e3
        fn = jax.jit(lambda p, x, sub=sub: model.apply(
            p, x, method=lambda mm, xx: getattr(mm, sub)(xx)))
        for n in args.batches:
            x = jax.device_put(
                jax.random.normal(rng, (n, *shape), jnp.float32) * 0.1)
            dt = timed(lambda: fn(params, x))
            ms_blk = dt * 1e3 / n
            mfu = 100 * fl / (ms_blk / 1e3) / (args.peak_tflops * 1e12)
            print(f"{name:<16} {n:>5} {dt*1e3:>9.2f} {ms_blk:>8.3f} "
                  f"{sol:>10.3f} {ms_blk/sol:>6.1f} {mfu:>6.1f}",
                  flush=True)
            table[(name, n)] = ms_blk

    # pallas fused-stack A/B: the lane-folded kernel vs the flax/XLA pass
    # (ops/pallas_conv.fused_block_stack_apply), same params
    from pcc_geo_cnn_v2_tpu.models.transforms import _BlockStack, TRANSFORMS
    from pcc_geo_cnn_v2_tpu.ops.pallas_conv import fused_block_stack_apply

    t_ana = TRANSFORMS[model.analysis](f)
    if isinstance(t_ana, _BlockStack):
        for name, sub, synth, shape in (
                ("analysis", "analysis_t", False, (B, B, B, 1)),
                ("synthesis", "synthesis_t", True, (ry, ry, ry, f))):
            widths = TRANSFORMS[getattr(model, name)](f).widths
            fn = jax.jit(functools.partial(
                fused_block_stack_apply, filters=f, widths=widths,
                synthesis=synth, dtype=jnp.bfloat16, interpret=False))
            sub_params = params["params"][sub]
            for n in args.batches:
                x = jax.device_put(
                    jax.random.normal(rng, (n, *shape), jnp.float32) * 0.1)
                try:
                    dt = timed(lambda: fn(sub_params, x))
                except Exception as e:
                    print(f"pallas {name} [batch {n}] FAILED: {e!r}"[:300],
                          flush=True)
                    break
                ms_blk = dt * 1e3 / n
                xla_ms = table.get((name, n))
                rel = f"  ({xla_ms/ms_blk:4.1f}x vs XLA)" if xla_ms else ""
                print(f"{'pallas ' + name:<16} {n:>5} {dt*1e3:>9.2f} "
                      f"{ms_blk:>8.3f}{rel}", flush=True)

    # fused-chain check: whole analysis+hyper in one jit vs sum of parts —
    # a large gap means XLA already loses time to HBM round-trips between
    # passes (what a fused Pallas stack would remove).
    if hasattr(model, "encode_syms"):
        full = jax.jit(lambda p, x: model.apply(p, x,
                                                method=model.encode_syms))
        for n in args.batches:
            x = (jax.random.uniform(rng, (n, B, B, B, 1)) < 0.02
                 ).astype(jnp.float32)
            x = jax.device_put(x)
            dt = timed(lambda: full(params, x))
            parts = table[("analysis", n)] + table.get(("hyper_analysis", n), 0)
            print(f"{'enc_syms chain':<16} {n:>5} {dt*1e3:>9.2f} "
                  f"{dt*1e3/n:>8.3f}   (sum of parts {parts:.3f} ms/blk)",
                  flush=True)


if __name__ == "__main__":
    main()
