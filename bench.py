"""Benchmark: 64³ blocks/sec/chip for full encode+decode on the flagship c3p.

Pipeline measured (matches the reference's compress_octree→decompress_octree
hot path, SURVEY §3.2-3.3): octree partition → batched voxelize (device) →
analysis/hyper transforms + quantization + CDF indexes (device) → host rANS
entropy coding → bitstream container → entropy decode → hyper/synthesis
transforms (device) → threshold → points.

Prints ONE JSON line:
  {"metric": "blocks64_enc_dec_per_sec_per_chip", "value": N,
   "unit": "blocks/s", "vs_baseline": R}

vs_baseline divides by BASELINE_BLOCKS_PER_SEC — an estimate of the TF1
reference's per-block throughput on its published hardware (one sess.run
per 64³ block incl. CPU range coding; no wall-clock numbers are published,
see BASELINE.md, so this anchor is an estimate, documented here and held
constant across rounds for comparability).
"""

import gzip
import io
import json
import logging
import os
import sys
import time

_PROC_T0 = time.time()
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
# NOTE: JAX_COMPILATION_CACHE_DIR does NOT help under the axon remote-TPU
# plugin (compiles happen remotely, AOT; nothing lands in the local cache
# dir) — every fresh process pays the full compiles. Kept for CPU runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# --devices N: multi-device codec mode on an N-device virtual CPU mesh.
# Validates BlockCodec's round-robin block parallelism (the dp story for
# a real multi-chip slice) end-to-end; on a single-core host the virtual
# devices share one core, so this measures correctness + distribution,
# not wall-clock scaling. Must configure env BEFORE the first jax import.
N_DEVICES = 0
if "--devices" in sys.argv:
    _idx = sys.argv.index("--devices")
    if _idx + 1 >= len(sys.argv) or not sys.argv[_idx + 1].isdigit():
        sys.exit("usage: bench.py [--devices N]  (N must be an integer)")
    N_DEVICES = int(sys.argv[_idx + 1])
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_DEVICES}"
    ).strip()

BASELINE_BLOCKS_PER_SEC = 5.0  # estimated TF1 reference throughput (see above)


def main():
    import jax
    import jax.numpy as jnp

    from pcc_geo_cnn_v2_tpu.codec import BlockCodec
    from pcc_geo_cnn_v2_tpu.coding.syntax import (
        load_compressed_file,
        save_compressed_file,
    )
    from pcc_geo_cnn_v2_tpu.models.configs import build_model
    from pcc_geo_cnn_v2_tpu.utils.octree import partition_octree

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    # cross-process executable cache (aot.py): a fresh bench process
    # deserializes the compile set in seconds instead of re-paying the
    # 1-3 min remote compiles; tpu-only by default, validated per load
    os.environ.setdefault("PCC_AOT_CACHE", "/tmp/pcc_aot_cache")
    if N_DEVICES:
        jax.config.update("jax_platforms", "cpu")  # axon ignores env var
    log("devices:", jax.devices())

    # warm the device<->host tunnel before timing anything; the cloud
    # build is pure host work, so it runs underneath the (minutes-long
    # on a cold axon link) first fetch
    from concurrent.futures import ThreadPoolExecutor as _TPE

    def _build_clouds():
        if N_DEVICES:
            return None
        from pcc_geo_cnn_v2_tpu.utils.octree import partition_octree
        from pcc_geo_cnn_v2_tpu.utils.scansim import figure_cloud

        out = []
        n_clouds = int(os.environ.get("BENCH_NUM_CLOUDS", 8))
        # d2-optimized encode needs input normals (scansim's are
        # analytic); partition_octree carries the extra columns through
        with_normals = "d2" in os.environ.get("BENCH_OPT_METRICS", "")
        for seed in range(300, 300 + n_clouds):
            if with_normals:
                coords, nrm = figure_cloud(seed, 1024, with_normals=True)
                pts = np.hstack([coords, nrm])
            else:
                pts = figure_cloud(seed, 1024, with_normals=False)
            out.append((pts,) + tuple(partition_octree(
                pts, [0, 0, 0], [1024] * 3, 4)))
        return out

    with _TPE(1) as _pool:
        _clouds_fut = _pool.submit(_build_clouds)
        t0 = time.time()
        np.asarray(jnp.zeros((8,)))
        log(f"tunnel warmup {time.time()-t0:.0f}s")

    if N_DEVICES:
        # CPU-mesh mode: smaller cloud, 32³ blocks (correctness of the
        # multi-device round-robin, not absolute throughput)
        rng = np.random.default_rng(123)
        v = rng.normal(size=(60_000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = np.unique(np.clip(np.round(v * 180 + 256), 0, 511), axis=0)
        resolution, level, block_size = 512, 4, 32
        blocks, binstr = partition_octree(pts, [0, 0, 0],
                                          [resolution] * 3, level)
        log(f"{len(pts)} points -> {len(blocks)} blocks of {block_size}^3")
        clouds = [(pts, blocks, binstr)]
    else:
        # Held-out 10-bit scan-like clouds — the SAME data family the
        # committed checkpoint was trained and RD-validated on
        # (utils/scansim.py; train seeds 0-23, RD eval 200-203), so the
        # benchmark measures the flagship at its real operating point
        # (~0.45 bpp at λ=3e-4) instead of on out-of-distribution
        # geometry. Round-1 benched a surface-patch cloud whose
        # checkpoint operated at 3.6 bpp — VERDICT r1 flagged exactly
        # this mismatch.
        resolution, level, block_size = 1024, 4, 64
        clouds = _clouds_fut.result()
        log(f"{len(clouds)} clouds, "
            f"{sum(len(c[0]) for c in clouds)} points -> "
            f"{sum(len(c[1]) for c in clouds)} blocks of {block_size}^3")

    # Model: use the committed benchmark checkpoint when present (realistic
    # RD operating point, no retraining); otherwise quick-train on
    # synthetic surface blocks.
    # bf16 conv compute (params stay f32; quantization, CDF indexing and
    # thresholding run f32). Bit-exact enc/dec is preserved — both sides
    # run the same decoder executables.
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}[
        os.environ.get("BENCH_DTYPE", "bfloat16")
    ]
    if N_DEVICES:
        # single-core host: small fresh-init model — this mode checks the
        # multi-device round-robin + bit-exact roundtrip, not RD quality
        model = build_model(dict(model="v2", num_filters=16,
                                 analysis="AnalysisTransformProgressiveV2",
                                 synthesis="SynthesisTransformProgressiveV2"))
        params = jax.tree_util.tree_map(
            np.asarray,
            model.init(jax.random.PRNGKey(0),
                       np.zeros((1, 16, 16, 16, 1), np.float32),
                       training=False),
        )
        syn = params["params"]["synthesis_t"]
        last = sorted(k for k in syn if k.startswith("ConvTranspose"))[-1]
        syn[last]["bias"] = syn[last]["bias"] + 0.55
        codec = BlockCodec(model, params, block_size=block_size,
                           n_thresholds=64, batch_blocks=16,
                           sweep_backend="xla",
                           devices=jax.devices()[:N_DEVICES])
        return run_pipeline(codec, clouds, resolution, level, block_size,
                            log)
    model = build_model("c3p", dtype=dtype,
                        conv_backend=os.environ.get("BENCH_CONV_BACKEND",
                                                    "xla"))
    ckpt = (Path(__file__).parent
            / "pcc_geo_cnn_v2_tpu/assets/bench_c3p.msgpack.gz")
    if ckpt.exists():
        from pcc_geo_cnn_v2_tpu.cli.common import load_params_asset

        params = load_params_asset(model, ckpt)
        log(f"loaded benchmark checkpoint {ckpt.name}")
    else:
        from pcc_geo_cnn_v2_tpu.training import (
            TrainConfig,
            create_train_state,
            make_train_step,
        )
        from pcc_geo_cnn_v2_tpu.utils.data import BlockDataset, synthetic_blocks

        cfg = TrainConfig(block_size=64, batch_size=8, lmbda=5e-5)
        state = create_train_state(model, jax.random.PRNGKey(0), cfg)
        step_fn = make_train_step(model, cfg)
        ds = BlockDataset(synthetic_blocks(64, block_size=64, seed=1),
                          max_points=4096)
        it = ds.batches(cfg.batch_size, seed=0)
        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        n_train = int(os.environ.get("BENCH_TRAIN_STEPS", 1200))
        for i in range(n_train):
            rng, k = jax.random.split(rng)
            state, logs = step_fn(state, jnp.asarray(next(it)), k)
        logs = jax.device_get(logs)
        log(f"quick-train {n_train} steps in {time.time()-t0:.0f}s "
            f"(loss {logs['loss']:.3f}, mbpov {logs['mbpov']:.3f})")
        params = jax.device_get(state.params)

    codec = BlockCodec(
        model, params, block_size=block_size,
        # default 128: conv passes are dispatch-floor-bound (~24-28 ms
        # per dispatch, tools/profile_conv.py), so wider chunks halve
        # per-block device cost — the 64->128 A/B measured 29.5->40.2
        # blocks/s end-to-end (r4)
        batch_blocks=int(os.environ.get("BENCH_BATCH_BLOCKS", 128)),
        sweep_backend=os.environ.get("BENCH_SWEEP_BACKEND", "auto"),
    )
    codec.halo_batch = int(os.environ.get("BENCH_HALO_BATCH",
                                          codec.halo_batch))
    codec.halo_width = int(os.environ.get("BENCH_HALO_WIDTH",
                                          codec.halo_width))
    run_pipeline(codec, clouds, resolution, level, block_size, log)


def run_pipeline(codec, clouds, resolution, level, block_size, log):
    from pcc_geo_cnn_v2_tpu.coding.syntax import (
        load_compressed_file,
        save_compressed_file,
    )

    # shared point + flat-stream budgets -> every cloud reuses the same
    # executables
    budget = max(
        int(2 ** np.ceil(np.log2(max(
            len(b) for _, blocks, _ in clouds for b in blocks)))), 64
    )
    flat_budget = 64
    for _, blocks, _ in clouds:
        offs = np.zeros(len(blocks) + 1, np.int64)
        np.cumsum([len(b) for b in blocks], out=offs[1:])
        flat_budget = max(flat_budget, codec._flat_budget(offs))
    n_blocks = sum(len(blocks) for _, blocks, _ in clouds)

    opt_metrics_env = tuple(os.environ.get("BENCH_OPT_METRICS",
                                           "d1_mse").split(","))
    normals_env = any(m.startswith("d2") for m in opt_metrics_env)
    # compile + warm every executable (same shapes as the timed run)
    codec.warmup(clouds[0][1], opt_metrics=opt_metrics_env,
                 with_normals=normals_env, point_budget=budget,
                 flat_budget=flat_budget)
    codec.warmup_cloud_shapes([len(blocks) for _, blocks, _ in clouds],
                              point_budget=budget)
    # elapsed-since-process-start: the cold-start metric the AOT cache
    # ($PCC_AOT_CACHE) targets — compare a fresh process with a
    # populated cache vs without (VERDICT r2 #6b)
    log(f"warmup done ({time.time() - _PROC_T0:.0f}s since process start)")

    # BENCH_PIPELINE=k (default 3): k clouds in flight — one cloud's host
    # phases (rANS, unpack, container) overlap the next cloud's device
    # dispatches. The TPU serializes the actual kernels, so per-cloud
    # numbers are unchanged; only idle host/tunnel gaps are reclaimed.
    # Throughput is measured as wall time over all clouds either way.
    # (r4 A/B at batch 128: pipeline 2 → 40.2 blocks/s, 3 → 44.3.)
    workers = int(os.environ.get("BENCH_PIPELINE", "3"))

    # BENCH_OPT_METRICS=d1_mse,d2_mse encodes per d1 AND d2 groups with
    # normals-bearing clouds (reference protocol,
    # compress_octree.py:109-118); the headline metric stays the d1
    # group's bitstream, d2's phase costs land in the PCC_TIMING log
    opt_metrics, with_normals = opt_metrics_env, normals_env
    # BENCH_NEED_METRICS=0 skips the enc-side full-cloud metric sidecar.
    # The reference encoder computes NO full-cloud metrics for
    # single-candidate groups (model_types.py:128-176 — argmax over one
    # candidate short-circuits), so 0 is the reference-equivalent
    # protocol; 1 (default, the r4 headline protocol) additionally pays
    # the sidecar — nearly free for d1 (overlapped halo sums), ~20-50
    # s/cloud for the d2 group (argmin-EDT NN passes, see
    # ops/cloud_metrics.blockwise_d2_metrics).
    need_metrics = os.environ.get("BENCH_NEED_METRICS", "1") != "0"

    def encode_one(cloud):
        pts, blocks, binstr = cloud
        data_list, metadata = codec.compress_blocks_device_opt(
            blocks, binstr, pts, resolution, level,
            opt_metrics=opt_metrics, point_budget=budget,
            flat_budget=flat_budget, with_normals=with_normals,
            need_metrics=need_metrics,
        )
        # one bitstream per metric group (d1 is group 0, the headline);
        # every group gets decode-verified below
        raw = [gzip.compress(save_compressed_file(
            binstr, dl, resolution, level)) for dl in data_list]
        return raw, metadata

    t0 = time.time()
    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(workers) as ex:
            results = list(ex.map(encode_one, clouds))
    else:
        results = [encode_one(c) for c in clouds]
    t_enc = time.time() - t0
    raws = [r for r, _ in results]
    metas = [m for _, m in results]
    n_pts = sum(len(pts) for pts, _, _ in clouds)
    bpp = sum(len(r[0]) for r in raws) * 8 / n_pts
    log(f"encode {t_enc:.2f}s ({n_blocks/t_enc:.2f} blocks/s), "
        f"{bpp:.3f} bpp [pipeline={workers}]")
    if with_normals:
        # metadata group order is d1-then-d2 (fixed by
        # select_best_per_opt_metric's opt_groups), NOT the env's
        # opt_metrics order — label from the actual group sequence
        groups = [g for g in ("d1", "d2")
                  if any(m.startswith(g) for m in opt_metrics)]
        for g, grp in enumerate(groups):
            ms = [m[g]["metrics"] for m in metas if m[g].get("metrics")]
            for key in ("d1_psnr", "d2_psnr"):
                vals = [m[key] for m in ms if key in m]
                if vals:
                    log(f"enc-side {key} ({grp}-optimized): "
                        f"mean {np.mean(vals):.2f} dB over {len(vals)} "
                        "clouds")

    def decode_one(args):
        raw, metadata = args
        for g, r in enumerate(raw):
            _, _, _, payload = load_compressed_file(
                io.BytesIO(gzip.decompress(r))
            )
            dec_blocks = codec.decompress_blocks(payload)
            ok = all(
                np.array_equal(d, e)
                for d, e in zip(dec_blocks, metadata[g]["x_hat_list"])
            )
            assert ok, ("decoder output != encoder-embedded "
                        f"reconstruction (group {g})")

    t0 = time.time()
    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(workers) as ex:
            list(ex.map(decode_one, zip(raws, metas)))
    else:
        for a in zip(raws, metas):
            decode_one(a)
    t_dec = time.time() - t0
    log(f"decode {t_dec:.2f}s ({n_blocks/t_dec:.2f} blocks/s)")

    value = n_blocks / (t_enc + t_dec)
    if N_DEVICES:
        print(json.dumps({
            "metric": f"blocks{block_size}_enc_dec_per_sec_cpu_mesh",
            "value": round(value, 3), "unit": "blocks/s",
            "devices": N_DEVICES, "vs_baseline": 0.0,
        }))
        return
    print(json.dumps({
        "metric": "blocks64_enc_dec_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "blocks/s",
        "vs_baseline": round(value / BASELINE_BLOCKS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
