"""Compiled-kernel parity smoke test on a real TPU.

The pytest suite runs on the CPU backend (Pallas kernels in interpret
mode), so Mosaic lowering differences would escape it. This script runs
the production kernels COMPILED on the attached TPU and checks them
against the XLA oracles:

  1. sweep kernel (ops/pallas_sweep, incl. the pts prefix-min path) vs
     the XLA per-block sweep;
  2. halo-EDT kernel (ops/pallas_halo) vs the XLA banded-EDT direction
     pass;
  3. a codec round trip asserting decoder output == encoder-embedded
     reconstruction bit-exactly.

Run after any kernel change: ``python tools/tpu_smoke.py``. Exits 0 on
success. ~3-6 min including tunnel warmup and compiles (cached after).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(time.strftime("%H:%M:%S"), *a, flush=True)


def make_surface_batch(rng, n, size):
    zz, yy, xx = np.meshgrid(*[np.arange(size)] * 3, indexing="ij")
    x_hat = np.zeros((n, size, size, size), np.float32)
    occ = np.zeros_like(x_hat)
    for i in range(n):
        c = rng.uniform(size / 4, 3 * size / 4, 3)
        r = rng.uniform(size / 5, size / 3)
        d = np.sqrt((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
        x_hat[i] = np.clip(
            1.2 * np.exp(-((d - r) ** 2) / 3)
            + rng.random((size, size, size)) * 0.02,
            0, 0.9996,
        )
        occ[i] = (np.abs(d - r) < 0.6).astype(np.float32)
    return x_hat, occ


def check_sweep(rng):
    from scipy.ndimage import distance_transform_edt

    from pcc_geo_cnn_v2_tpu.ops.pallas_sweep import d1_sweep_sums_pallas

    size, n = 64, 8
    x_hat, occ = make_surface_batch(rng, n, size)
    P = 1 << int(np.ceil(np.log2(max(int(o.sum()) for o in occ))))
    pts = np.full((n, P, 3), -1, np.int32)
    for i in range(n):
        c = np.argwhere(occ[i] > 0)
        pts[i, : len(c)] = c
    thr_np = np.linspace(0, 1, 256, dtype=np.float32)
    thr = jnp.asarray(thr_np)
    dt_occ = {
        b: distance_transform_edt(occ[b] == 0) ** 2 for b in range(0, n, 3)
    }
    for kwargs in ({}, {"pts": jnp.asarray(pts)}):
        ab, ba, cnt, _ = jax.device_get(
            d1_sweep_sums_pallas(jnp.asarray(x_hat), jnp.asarray(occ), thr,
                                 **kwargs)
        )
        # host scipy EDT oracle on sampled (block, threshold) pairs
        for b in range(0, n, 3):
            for t in range(3, 256, 17):
                mask = x_hat[b] > thr_np[t]
                c = int(mask.sum())
                assert cnt[b, t] == c, (b, t, cnt[b, t], c)
                if c == 0:
                    continue
                edt2 = distance_transform_edt(~mask) ** 2
                ab_o = edt2[occ[b] > 0].sum()
                ba_o = dt_occ[b][mask].sum()
                # distances are exact ints in f32, but sums past 2^24
                # round by accumulation order — allow that, nothing more
                np.testing.assert_allclose(ab[b, t], ab_o, rtol=1e-6,
                                           atol=0.5)
                np.testing.assert_allclose(ba[b, t], ba_o, rtol=1e-6,
                                           atol=0.5)
        log(f"sweep kernel parity OK (pts={'pts' in kwargs})")


def check_halo(rng):
    from pcc_geo_cnn_v2_tpu.ops.cloud_metrics import (
        _halo_dir_chunk,
        _halo_dir_chunk_pallas,
    )

    size, halo, bs = 64, 12, 16
    _, occ_a = make_surface_batch(rng, bs, size)
    _, occ_b = make_surface_batch(rng, bs, size)

    def pack(core):
        g = np.zeros((bs, 27, size ** 3), bool)
        g[:, 13] = core.reshape(bs, -1) > 0
        g[:, 4] = np.roll(core.reshape(bs, -1) > 0, 7, axis=-1)
        return jnp.asarray(
            np.packbits(g.reshape(bs, -1), bitorder="big").reshape(
                bs, 27, -1)
        )

    a, b = pack(occ_a), pack(occ_b)
    ref = jax.device_get(_halo_dir_chunk(a, b, size=size, halo=halo))
    new = jax.device_get(_halo_dir_chunk_pallas(a, b, size=size, halo=halo))
    for k in ("sum", "n", "unres_cnt"):
        np.testing.assert_allclose(new[k], ref[k], rtol=1e-6, err_msg=k)
    np.testing.assert_array_equal(new["unres"], ref["unres"])
    log("halo-EDT kernel parity OK")


def check_bucket_d2(rng, interpret_only=False):
    """d1+d2 bucket kernel: Mosaic-compiled vs interpret-mode parity.

    The d2 kernel's CPU tests (interpret mode + numpy/host oracles,
    tests/test_bucket_sweep.py) pin its semantics; the hardware question
    is whether the Mosaic compilation computes the same thing (the r4
    grid-d2 path compiled fine and then miscomputed/crashed at runtime).
    Runs the production-shaped kernel both ways on identical inputs.
    """
    from pcc_geo_cnn_v2_tpu.ops.bucket_sweep import bucket_sweep_sums

    size, n = 64, 4
    x_hat, occ = make_surface_batch(rng, n, size)
    # thin the candidate field so the K=32768 budget holds (the smoke
    # surface batch is diffuse everywhere at the noise floor)
    x_hat = np.where(x_hat > 0.2, x_hat, 0.0).astype(np.float32)
    P = 1 << int(np.ceil(np.log2(max(int(o.sum()) for o in occ))))
    pts = np.full((n, P, 3), -1, np.int32)
    nrm = np.zeros((n, P, 3), np.float32)
    for i in range(n):
        c = np.argwhere(occ[i] > 0)
        pts[i, : len(c)] = c
        v = rng.normal(size=(len(c), 3))
        nrm[i, : len(c)] = v / np.linalg.norm(v, axis=1, keepdims=True)
    thr = jnp.asarray(np.linspace(0, 1, 256, dtype=np.float32))
    args = (jnp.asarray(x_hat), jnp.asarray(pts), thr)
    kw = dict(K=32768, nrm=jnp.asarray(nrm))
    ref = jax.device_get(bucket_sweep_sums(*args, interpret=True, **kw))
    if interpret_only:
        log("bucket-d2 interpret plumbing OK")
        return
    got = jax.device_get(bucket_sweep_sums(*args, **kw))
    names = ("ab", "ba", "cnt", "overflow", "ab2", "ba2")
    assert not np.asarray(ref[3]).any(), "unexpected overflow in smoke data"
    for name, r, g in zip(names, ref, got):
        if name in ("cnt", "overflow"):
            np.testing.assert_array_equal(g, r, err_msg=name)
        else:
            nz = np.isfinite(r) & (np.abs(r) < 1e8)
            np.testing.assert_allclose(g[nz], r[nz], rtol=1e-5,
                                       atol=0.5, err_msg=name)
    log("bucket-d2 kernel Mosaic-vs-interpret parity OK")


def check_codec_roundtrip(rng):
    from pcc_geo_cnn_v2_tpu.codec import BlockCodec
    from pcc_geo_cnn_v2_tpu.models.configs import build_model
    from pcc_geo_cnn_v2_tpu.utils.octree import partition_octree

    v = rng.normal(size=(20_000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = np.unique(np.clip(np.round(v * 100 + 128), 0, 255),
                    axis=0).astype(np.float32)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [256] * 3, 2)
    model = build_model("c3p")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 64, 1)), training=False)
    codec = BlockCodec(model, params, batch_blocks=8)
    data_list, meta = codec.compress_blocks_device_opt(
        blocks, binstr, pts, 256, 2, opt_metrics=("d1_mse",)
    )
    dec = codec.decompress_blocks(data_list[0])
    for i, (a, b) in enumerate(zip(meta[0]["x_hat_list"], dec)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), i
    log(f"codec round trip bit-exact OK ({len(blocks)} blocks)")


def main():
    assert jax.default_backend() == "tpu", (
        f"needs a TPU backend, got {jax.default_backend()}"
    )
    log("devices:", jax.devices())
    np.asarray(jnp.zeros(8))  # tunnel warmup
    rng = np.random.default_rng(0)
    check_sweep(rng)
    check_halo(rng)
    check_bucket_d2(rng)
    check_codec_roundtrip(rng)
    log("ALL TPU SMOKE CHECKS PASSED")


if __name__ == "__main__":
    main()
