"""Distinguish axon eager-dispatch latency from true device compute.

The instrumented single-cloud bench (PCC_TIMING=2) showed 45 of 57 s
of encode wall time in code regions whose _run_chunked buckets measure
~0 s — either eager ops (slice/concat/take outside jit) dispatch
synchronously over the tunnel, or the executables are genuinely slower
than tools/profile_encode.py's staged-input numbers. This microbench
times each primitive in isolation on the real chip.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def t(label, fn, reps=8, sync=None):
    fn()  # warm (compile)
    if sync is not None:
        sync()
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    dt_dispatch = time.time() - t0
    if sync is not None:
        sync()
    last = outs[-1]
    if hasattr(last, "block_until_ready"):
        last.block_until_ready()
    elif isinstance(last, (list, tuple)) and hasattr(last[0], "block_until_ready"):
        last[0].block_until_ready()
    dt = time.time() - t0
    print(f"{label:55s} {dt/reps*1000:9.1f} ms/op "
          f"(dispatch {dt_dispatch/reps*1000:7.1f} ms)", flush=True)
    return outs


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    print(f"tunnel warmup {time.time()-t0:.0f}s", flush=True)

    sync = lambda: np.asarray(jnp.zeros(1))

    # ---- staged device arrays shaped like the codec's per-chunk data
    bs = 64
    occ = jnp.asarray(np.random.randint(0, 255, (4 * bs, 32768), np.uint8))
    pts = jnp.asarray(np.random.randint(0, 64, (4 * bs, 4096, 3), np.int16))
    ysym = jnp.asarray(np.random.randint(-3, 3, (4 * bs, 8, 8, 8, 64), np.int8))
    sync()

    # 1. eager slice of a device array (the _run_chunked chunker)
    t("eager slice occ[0:64]", lambda: occ[0:bs], sync=sync)
    t("eager slice pts[0:64]", lambda: pts[0:bs], sync=sync)
    # 2. eager concat of 4 chunks (the keep_device concat)
    chunks = [occ[i * bs:(i + 1) * bs] for i in range(4)]
    sync()
    t("eager concat 4x[64,32768]u8", lambda: jnp.concatenate(chunks),
      sync=sync)
    # 3. eager take (overflow rerun / mask-row gather)
    idx = jnp.asarray(np.arange(19))
    t("eager take 19 rows of occ", lambda: jnp.take(occ, idx, axis=0),
      sync=sync)
    # 4. jitted versions of the same
    jslice = jax.jit(lambda a: a[0:bs])
    t("jit   slice occ[0:64]", lambda: jslice(occ), sync=sync)
    jconcat = jax.jit(lambda *c: jnp.concatenate(c))
    t("jit   concat 4x[64,32768]u8", lambda: jconcat(*chunks), sync=sync)

    # 5. device_get bandwidth — fresh buffer each rep (a repeated get of
    # the same array returns the cached host copy)
    ctr = iter(range(100))
    t("device_get 2.8MB fresh", lambda: jax.device_get(
        (occ[:86] + np.uint8(next(ctr))).block_until_ready()), reps=4)
    t("device_get 8.4MB fresh", lambda: jax.device_get(
        (occ + np.uint8(next(ctr))).block_until_ready()), reps=4)

    # ---- the real codec executables on staged inputs
    import gzip
    from pathlib import Path

    from flax import serialization
    from pcc_geo_cnn_v2_tpu.codec import BlockCodec
    from pcc_geo_cnn_v2_tpu.models.configs import build_model
    from pcc_geo_cnn_v2_tpu.training import TrainConfig, create_train_state
    from pcc_geo_cnn_v2_tpu.ops.voxel import pack_coords

    model = build_model("c3p", dtype=jnp.bfloat16)
    ckpt = (Path(__file__).resolve().parent.parent
            / "pcc_geo_cnn_v2_tpu/assets/bench_c3p.msgpack.gz")
    from pcc_geo_cnn_v2_tpu.cli.common import load_params_asset

    params = load_params_asset(model, ckpt)
    codec = BlockCodec(model, params, block_size=64, batch_blocks=bs,
                       sweep_backend="bucket")

    # flat-stream syms chunk exactly like the bench (flat_budget 2^19)
    from pcc_geo_cnn_v2_tpu.utils.scansim import figure_cloud
    from pcc_geo_cnn_v2_tpu.utils.octree import partition_octree

    pts_cloud = figure_cloud(300, 1024, with_normals=False)
    blocks, _ = partition_octree(pts_cloud, [0, 0, 0], [1024] * 3, 4)
    from pcc_geo_cnn_v2_tpu.ops.voxel import flatten_blocks
    flat, offsets = flatten_blocks(blocks[:bs])
    flat_budget = 1 << 19
    fc = np.zeros(flat_budget, np.uint32)
    fc[:len(flat)] = pack_coords(flat, 64)
    offs = np.full(bs + 1, len(flat), np.int32)
    offs[:bs + 1] = offsets - offsets[0]
    fc_dev = jnp.asarray(fc)
    offs_dev = jnp.asarray(offs)
    sync()

    syms_fn = codec._encode_syms_fn(False, point_budget=4096)
    t("syms exec (flat chunk of 64 blocks)",
      lambda: syms_fn(codec.params, fc_dev, offs_dev)["picks" if False else
                                                      "y_sym"],
      reps=4, sync=sync)

    out = syms_fn(codec.params, fc_dev, offs_dev)
    y_dev = out["y_sym_full"].astype(jnp.int8)
    occ_dev = out["packed_occ"]
    pts_dev = out["pts16"]
    z_dev = out["z_sym_full"].astype(jnp.int8)
    sync()

    t("decode_z exec", lambda: codec._decode_z(codec.params, z_dev),
      reps=4, sync=sync)

    sweep_mask = codec._sweep_mask_fn(("d1_mse",), (np.inf,), False)

    def dec_sweep():
        x_hat = codec._dec_fn(codec.params, y_dev)
        return sweep_mask(codec.params, occ_dev, x_hat, pts_dev)["picks"]

    t("dec+sweep exec (bucket)", dec_sweep, reps=4, sync=sync)

    # halo d1 chunk as used by select
    from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import blockwise_d1_sums
    origins = np.stack([b[:1, :3] * 0 + i * 64 for i, b in
                        enumerate(blocks[:bs])]).reshape(bs, 3)

    def halo():
        return blockwise_d1_sums(occ_dev, occ_dev, origins, 64,
                                 halo=codec.halo_width, batch=64)

    t0 = time.time()
    halo()
    print(f"halo d1 sums (64 blocks, batch=64, incl compile): "
          f"{time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(4):
        halo()
    print(f"halo d1 sums steady: {(time.time()-t0)/4*1000:.0f} ms "
          f"/ 64 blocks", flush=True)


if __name__ == "__main__":
    main()
