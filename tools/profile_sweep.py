"""Focused timing of the Pallas threshold-sweep kernel variants on TPU.

The sweep is the encode hot spot (~14 of ~20 ms/block, see
tools/profile_encode.py); this tool times d1_sweep_sums_pallas across
its static knobs (chunk size, sparse_k) plus its fixed sub-costs, so
kernel changes are judged against a stable baseline.

Usage: python tools/profile_sweep.py [n_blocks] [--variants chunk,sparse]
(TPU job — serialize with other tunnel users!)
"""

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
    print(f"{label:30s} {best*1000:8.1f} ms/chunk "
          f"{best*1000/n_blocks:7.2f} ms/block", flush=True)
    return best


def main():
    import gzip

    from flax import serialization

    from pcc_geo_cnn_v2_tpu.codec import BlockCodec
    from pcc_geo_cnn_v2_tpu.models.configs import build_model
    from pcc_geo_cnn_v2_tpu.ops import pallas_sweep as ps
    from pcc_geo_cnn_v2_tpu.ops.voxel import pack_points, voxelize
    from pcc_geo_cnn_v2_tpu.training import TrainConfig, create_train_state
    from pcc_geo_cnn_v2_tpu.utils.data import synthetic_blocks

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
    outA = codec._encode_syms_fn(False)(pparams, pts_dev)
    pts16 = outA["pts16"]
    x_hat = jax.block_until_ready(codec._dec_fn(pparams, outA["y_sym"]))
    xh = x_hat[..., 0] if x_hat.ndim == 5 else x_hat
    occ = jax.block_until_ready(
        jax.jit(lambda p: voxelize(p, 64)[..., 0])(pts_dev))
    thresholds = jnp.asarray(codec.thresholds, jnp.float32)

    timed("baseline [chunk=8 sk=256]",
          lambda: ps.d1_sweep_sums_pallas(xh, occ, thresholds,
                                          pts=pts16)[0], bs)
    for ck in (4, 16, 32):
        timed(f"chunk={ck}",
              lambda ck=ck: ps.d1_sweep_sums_pallas(
                  xh, occ, thresholds, chunk=ck, pts=pts16)[0], bs)

    # cost isolation (same executable, crafted data — no recompiles):
    # floor: first_empty=1 everywhere -> kernel skips all work
    xh_floor = jnp.full_like(xh, 1e-6)
    timed("isolate: floor (empty sets)",
          lambda: ps.d1_sweep_sums_pallas(xh_floor, occ, thresholds,
                                          pts=pts16)[0], bs)
    # stores-only: 8 voxels near 1.0 -> count<=sparse_k for every t, so
    # t_small=0 and the EDT branch never runs; isolates the per-threshold
    # mask/cnt/ba work (+ sparse tail outside the kernel)
    base = jnp.zeros_like(xh)
    xh_sparse = base.at[:, :2, :2, :2].set(0.999)
    timed("isolate: stores+sparse only",
          lambda: ps.d1_sweep_sums_pallas(xh_sparse, occ, thresholds,
                                          pts=pts16)[0], bs)
    # dense-EDT-heavy: xh == occ -> candidate sets hug the surface, all
    # mid thresholds on the EDT path with tiny kmax
    timed("isolate: xh=occ (tight EDT)",
          lambda: ps.d1_sweep_sums_pallas(
              occ.astype(jnp.float32) * 0.9, occ, thresholds,
              pts=pts16)[0], bs)


if __name__ == "__main__":
    main()
