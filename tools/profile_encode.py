"""Per-executable timing of the encode path on the real TPU.

Times each jitted pass of BlockCodec separately with block_until_ready
over identical chunks (the end-to-end log only shows aggregates, and the
tunnel's async dispatch hides per-pass costs): analysis/symbols pass,
canonical decode_z / decode_y, the sweep+mask pass (pallas and xla
backends), and the halo-EDT metric chunk. Prints ms/block per pass so
kernel optimization targets the real hot spot (VERDICT r1 #3).

Usage: python tools/profile_encode.py [n_blocks] (TPU job — serialize
with other tunnel users!)
"""

import gzip
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def timed(label, fn, n_blocks, reps=3):
    fn()  # compile + warm
    t = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn())
        t.append(time.time() - t0)
    best = min(t)
    print(f"{label:28s} {best*1000:8.1f} ms/chunk "
          f"{best*1000/n_blocks:7.2f} ms/block", flush=True)
    return best


def main():
    from pcc_geo_cnn_v2_tpu.codec import BlockCodec
    from pcc_geo_cnn_v2_tpu.models.configs import build_model
    from pcc_geo_cnn_v2_tpu.ops.voxel import pack_points
    from pcc_geo_cnn_v2_tpu.training import TrainConfig, create_train_state
    from pcc_geo_cnn_v2_tpu.utils.data import synthetic_blocks
    from flax import serialization

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.zeros((8,)))
    print(f"tunnel warmup {time.time()-t0:.0f}s", flush=True)

    model = build_model("c3p", dtype=jnp.bfloat16)
    ckpt = (Path(__file__).resolve().parent.parent
            / "pcc_geo_cnn_v2_tpu/assets/bench_c3p.msgpack.gz")
    template = jax.device_get(
        create_train_state(model, jax.random.PRNGKey(0),
                           TrainConfig(block_size=16)).params)
    params = serialization.from_bytes(
        template, gzip.decompress(ckpt.read_bytes()))
    codec = BlockCodec(model, params, block_size=64, batch_blocks=bs)

    blocks = synthetic_blocks(bs, block_size=64, seed=3, kind="mix")
    budget = max(
        int(2 ** np.ceil(np.log2(max(len(b) for b in blocks)))), 64
    )
    pts, _ = pack_points(blocks, max_points=budget)
    pts_dev = jax.device_put(jnp.asarray(pts))
    pparams = jax.device_put(codec.params)

    # pass A: voxelize + analysis + hyper + quantize + compact
    fnA = codec._encode_syms_fn(False)
    outA = fnA(pparams, pts_dev)
    y_feed = outA["y_sym"]  # int8 on device
    z_feed = outA["z_sym"]
    occ = outA["packed_occ"]
    pts16 = outA["pts16"]
    timed("A syms (anl+hyp+quant)", lambda: fnA(pparams, pts_dev), bs)

    # raw transform cost (no voxelize/compact) for comparison
    from pcc_geo_cnn_v2_tpu.ops.voxel import voxelize

    x = jax.block_until_ready(jax.jit(
        lambda p: voxelize(p, 64))(pts_dev))
    anl = jax.jit(lambda pp, x: model.apply(
        pp, x, method=model.encode_syms))
    timed("  analysis+hyper only", lambda: anl(pparams, x), bs)

    timed("B decode_z (y_idx)", lambda: codec._decode_z(pparams, z_feed),
          bs)
    x_hat = jax.block_until_ready(codec._dec_fn(pparams, y_feed))
    timed("C decode_y (synthesis)", lambda: codec._dec_fn(pparams, y_feed),
          bs)

    for backend in ("bucket", "pallas", "xla"):
        codec.sweep_backend = backend
        codec._sweep_mask_cache.clear()
        sm = codec._sweep_mask_fn(("d1_mse",), (np.inf,), False)
        try:
            timed(f"D sweep+mask [{backend}]",
                  lambda: sm(pparams, occ, x_hat, pts16), bs)
        except Exception as e:
            print(f"D sweep+mask [{backend}] FAILED: {e}", flush=True)

    thr = jnp.full((bs,), 0.5, jnp.float32)
    timed("E mask pack only",
          lambda: codec._mask_pack_only(x_hat, thr)["packed"], bs)

    # sweep-path internals: where do the sweep's ms/block actually go?
    from pcc_geo_cnn_v2_tpu.ops.edt import squared_edt
    from pcc_geo_cnn_v2_tpu.ops import pallas_sweep as ps

    xh5 = x_hat[..., 0] if x_hat.ndim == 5 else x_hat
    occ5 = jax.jit(lambda p: voxelize(p, 64)[..., 0])(pts_dev)
    occ5 = jax.block_until_ready(occ5)
    thresholds = jnp.asarray(codec.thresholds, jnp.float32)
    timed("F squared_edt(occ)",
          lambda: squared_edt(occ5 > 0), bs)
    timed("F top_k(257)",
          lambda: jax.lax.top_k(xh5.reshape(bs, -1), 257)[0], bs)
    for sk in (256, 512, 1024):
        timed(f"F sweep sums [sparse_k={sk}]",
              lambda sk=sk: ps.d1_sweep_sums_pallas(
                  xh5, occ5, thresholds, pts=pts16, sparse_k=sk)[0], bs)
    for ck in (4, 16, 32):
        timed(f"F sweep sums [chunk={ck}]",
              lambda ck=ck: ps.d1_sweep_sums_pallas(
                  xh5, occ5, thresholds, chunk=ck, pts=pts16)[0], bs)

    # full-cloud metric chunk, both backends
    from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import _halo_d1_chunk

    nb = jnp.tile(occ[:, None, :], (1, 27, 1))
    for backend in ("pallas", "xla"):
        try:
            timed(f"halo d1 chunk [{backend}]",
                  lambda: _halo_d1_chunk(nb[:16], nb[:16], size=64,
                                         halo=12, backend=backend), 16)
        except Exception as e:
            print(f"halo [{backend}] FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
