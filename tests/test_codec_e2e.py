"""End-to-end codec roundtrips on the CPU mesh: compress → bitstream →
decompress, asserting decoder output is bit-identical to the encoder's
embedded reconstruction (the property the reference could only assert via
its --debug retry loop, decompress_octree.py:64-131)."""

import gzip
import io

import numpy as np
import pytest

import jax

from pcc_geo_cnn_v2_tpu.codec import BlockCodec
from pcc_geo_cnn_v2_tpu.coding.syntax import (
    load_compressed_file,
    save_compressed_file,
)
from pcc_geo_cnn_v2_tpu.models.configs import build_model
from pcc_geo_cnn_v2_tpu.utils.octree import partition_octree
from conftest import reference_module

RESOLUTION = 32
LEVEL = 1
BLOCK = 16


def _random_cloud(seed, n=600):
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, RESOLUTION, size=(n, 3)).astype(np.float64)
    return np.unique(pts, axis=0)


def _init_codec(config, seed=0, **kw):
    model = build_model(config)
    x = np.zeros((1, BLOCK, BLOCK, BLOCK, 1), np.float32)
    params = model.init(jax.random.PRNGKey(seed), x, training=False)
    # Untrained synthesis can output all-zero probabilities; lift the final
    # deconv bias so candidate sets are non-empty and the full selection
    # pipeline is exercised.
    params = jax.tree_util.tree_map(np.asarray, params)
    syn = params["params"]["synthesis_t"]
    last = sorted(k for k in syn if k.startswith("ConvTranspose"))[-1]
    syn[last]["bias"] = syn[last]["bias"] + 0.55
    return BlockCodec(model, params, block_size=BLOCK, batch_blocks=4, **kw)


@pytest.mark.parametrize("config,n_strings", [
    (dict(model="v1", num_filters=8, analysis="AnalysisTransformV1",
          synthesis="SynthesisTransformV1"), 1),
    (dict(model="v2", num_filters=8, analysis="AnalysisTransformV1",
          synthesis="SynthesisTransformV1"), 2),
])
def test_roundtrip_bit_exact(config, n_strings):
    pts = _random_cloud(1)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [RESOLUTION] * 3, LEVEL)
    codec = _init_codec(config)

    data_list, metadata = codec.compress_blocks(
        blocks, binstr, pts, RESOLUTION, LEVEL, opt_metrics=("d1_mse",)
    )
    assert len(data_list) == 1  # one d1 group
    payload = data_list[0]
    assert all(len(strings) == n_strings for strings, _ in payload)

    # container roundtrip (gzipped, as the reference CLI writes it)
    raw = save_compressed_file(binstr, payload, RESOLUTION, LEVEL)
    zipped = gzip.compress(raw)
    res2, lvl2, binstr2, payload2 = load_compressed_file(
        io.BytesIO(gzip.decompress(zipped))
    )
    assert (res2, lvl2) == (RESOLUTION, LEVEL)
    np.testing.assert_array_equal(binstr2, binstr)
    assert [b[1] for b in payload2] == [int(b[1]) for b in payload]

    # decode and compare against the encoder's own selected candidates
    dec_blocks = codec.decompress_blocks(payload2)
    enc_blocks = metadata[0]["x_hat_list"]
    assert len(dec_blocks) == len(enc_blocks)
    for d, e in zip(dec_blocks, enc_blocks):
        np.testing.assert_array_equal(d, e)

    bpp = len(zipped) * 8 / len(pts)
    assert 0 < bpp < 500  # sane size for an untrained model


def test_syntax_matches_reference_oracle():
    ref = reference_module("model_syntax")
    binstr = [3, 128, 255]
    payload = [((b"abc", b"d"), 7), ((b"", b"xy"), 255)]
    mine = save_compressed_file(binstr, payload, 1024, 4)
    theirs = ref.save_compressed_file(
        binstr, [([b"abc", b"d"], 7), ([b"", b"xy"], 255)], 1024, 4
    )
    assert mine == theirs
    res, lvl, b2, blocks2 = load_compressed_file(io.BytesIO(theirs))
    assert res == 1024 and lvl == 4
    np.testing.assert_array_equal(b2, binstr)
    assert blocks2 == [([b"abc", b"d"], 7), ([b"", b"xy"], 255)]


def test_syntax_overflow_raises():
    with pytest.raises(AssertionError):
        save_compressed_file([1], [((b"x",), 0)], 2 ** 16, 4)  # u16 overflow
    with pytest.raises(AssertionError):
        save_compressed_file([1], [((b"x",), 300)], 64, 4)  # u8 overflow


def test_fixed_threshold_path():
    pts = _random_cloud(3, n=300)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [RESOLUTION] * 3, LEVEL)
    codec = _init_codec(
        dict(model="v1", num_filters=8, analysis="AnalysisTransformV1",
             synthesis="SynthesisTransformV1")
    )
    data_list, _ = codec.compress_blocks(
        blocks, binstr, pts, RESOLUTION, LEVEL, opt_metrics=("d1_mse",),
        fixed_threshold=True,
    )
    # fixed threshold = len(thresholds)//2 everywhere
    assert all(t == 128 for _, t in data_list[0])


@pytest.mark.slow
def test_device_opt_path_matches_host_path():
    """compress_blocks_device_opt must produce identical bitstream payloads
    and selections to the exact host threshold path."""
    pts = _random_cloud(5)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [RESOLUTION] * 3, LEVEL)
    codec = _init_codec(
        dict(model="v2", num_filters=8, analysis="AnalysisTransformV1",
             synthesis="SynthesisTransformV1")
    )
    host_data, host_meta = codec.compress_blocks(
        blocks, binstr, pts, RESOLUTION, LEVEL,
        opt_metrics=("d1_mse", "d1_mse_BA"), max_deltas=(np.inf, 3.0),
    )
    dev_data, dev_meta = codec.compress_blocks_device_opt(
        blocks, binstr, pts, RESOLUTION, LEVEL,
        opt_metrics=("d1_mse", "d1_mse_BA"), max_deltas=(np.inf, 3.0),
    )
    assert len(host_data) == len(dev_data) == 1
    for (hs, ht), (ds, dt) in zip(host_data[0], dev_data[0]):
        assert ht == dt, "threshold selection diverged"
        assert hs == ds, "strings diverged"
    for hm, dm in zip(host_meta, dev_meta):
        assert hm["idx"] == dm["idx"]
        for hb, db in zip(hm["x_hat_list"], dm["x_hat_list"]):
            np.testing.assert_array_equal(hb, db)
        # device-side full-cloud metrics (ops/cloud_metrics) must agree
        # with the host KD-tree metrics used by select_best_per_opt_metric
        for key in ("d1_sum_AB", "d1_sum_BA", "d1_mse", "d1_psnr"):
            np.testing.assert_allclose(
                dm["metrics"][key], hm["metrics"][key], rtol=1e-6,
                err_msg=key,
            )


@pytest.mark.slow
def test_multi_device_codec_matches_single():
    """Chunks round-robined over the 8-device CPU mesh must produce the
    same bitstreams and decodes as single-device."""
    import jax

    assert len(jax.devices()) == 8
    pts = _random_cloud(9)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [RESOLUTION] * 3, LEVEL)
    cfg = dict(model="v2", num_filters=8, analysis="AnalysisTransformV1",
               synthesis="SynthesisTransformV1")
    c_single = _init_codec(cfg)
    c_multi = _init_codec(cfg, devices=jax.devices())
    d1, m1 = c_single.compress_blocks_device_opt(
        blocks, binstr, pts, RESOLUTION, LEVEL)
    d2, m2 = c_multi.compress_blocks_device_opt(
        blocks, binstr, pts, RESOLUTION, LEVEL)
    assert [t for _, t in d1[0]] == [t for _, t in d2[0]]
    assert [s for s, _ in d1[0]] == [s for s, _ in d2[0]]
    dec1 = c_single.decompress_blocks(d1[0])
    dec2 = c_multi.decompress_blocks(d2[0])
    for a, b in zip(dec1, dec2):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_device_opt_with_normals_d2():
    """Device path with d1+d2 metrics and normals: two output groups, d1
    payload identical to host path; decode roundtrips both."""
    rng = np.random.default_rng(11)
    pts = _random_cloud(11)
    normals = rng.normal(size=(len(pts), 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pts_n = np.hstack([pts, normals])
    blocks, binstr = partition_octree(pts_n, [0, 0, 0],
                                      [RESOLUTION] * 3, LEVEL)
    codec = _init_codec(
        dict(model="v2", num_filters=8, analysis="AnalysisTransformV1",
             synthesis="SynthesisTransformV1")
    )
    data_list, metadata = codec.compress_blocks_device_opt(
        blocks, binstr, pts_n, RESOLUTION, LEVEL,
        opt_metrics=("d1_mse", "d2_mse"), with_normals=True,
    )
    assert len(data_list) == 2  # d1 and d2 groups
    assert "d2_psnr" in metadata[1]["metrics"]
    host_data, host_meta = codec.compress_blocks(
        blocks, binstr, pts_n, RESOLUTION, LEVEL,
        opt_metrics=("d1_mse", "d2_mse"), with_normals=True,
    )
    # d1 group picks identical to the exact host path
    assert [t for _, t in data_list[0]] == [t for _, t in host_data[0]]
    # device d2 full-cloud metric agrees with the host KD-tree oracle
    # (tie-broken NN identities may differ slightly — documented)
    assert abs(metadata[1]["metrics"]["d2_psnr"]
               - host_meta[1]["metrics"]["d2_psnr"]) < 0.3
    for payload, meta in zip(data_list, metadata):
        dec = codec.decompress_blocks(payload)
        for d, e in zip(dec, meta["x_hat_list"]):
            np.testing.assert_array_equal(d, e)


def test_warmup_compiles_all_paths():
    """BlockCodec.warmup must exercise every executable without error and
    leave the codec usable (regression guard for the bench warm path)."""
    pts = _random_cloud(11)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [RESOLUTION] * 3, LEVEL)
    codec = _init_codec(
        dict(model="v2", num_filters=8, analysis="AnalysisTransformV1",
             synthesis="SynthesisTransformV1")
    )
    codec.warmup(blocks)
    data_list, metadata = codec.compress_blocks_device_opt(
        blocks, binstr, pts, RESOLUTION, LEVEL
    )
    dec = codec.decompress_blocks(data_list[0])
    for d, e in zip(dec, metadata[0]["x_hat_list"]):
        np.testing.assert_array_equal(d, e)


def test_wide_symbol_escape_roundtrip():
    """Blocks with |symbol| > 127 exercise the int16 escape: the encoder
    re-fetches wide rows from the device copy, both sides pick the int16
    executables by the same rule, and decodes stay bit-exact."""
    pts = _random_cloud(5)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [RESOLUTION] * 3,
                                      LEVEL)
    model = build_model(dict(model="v2", num_filters=8,
                             analysis="AnalysisTransformV1",
                             synthesis="SynthesisTransformV1"))
    x = np.zeros((1, BLOCK, BLOCK, BLOCK, 1), np.float32)
    params = model.init(jax.random.PRNGKey(3), x, training=False)
    params = jax.tree_util.tree_map(np.asarray, params)
    syn = params["params"]["synthesis_t"]
    last = sorted(k for k in syn if k.startswith("ConvTranspose"))[-1]
    syn[last]["bias"] = syn[last]["bias"] + 0.55
    # blow up the analysis output so y symbols leave [-128, 127]
    ana = params["params"]["analysis_t"]
    last_conv = sorted(k for k in ana if k.startswith("Conv"))[-1]
    ana[last_conv]["kernel"] = ana[last_conv]["kernel"] * 4000.0
    codec = BlockCodec(model, params, block_size=BLOCK, batch_blocks=4)

    enc = codec.encode_blocks(blocks)
    assert np.abs(enc["y_sym"]).max() > 127, "test setup: no wide symbols"
    assert np.abs(enc["y_sym"]).max() < 2 ** 15, "int16 range exceeded"

    data_list, metadata = codec.compress_blocks_device_opt(
        blocks, binstr, pts, RESOLUTION, LEVEL, opt_metrics=("d1_mse",)
    )
    dec_blocks = codec.decompress_blocks(data_list[0])
    enc_side = metadata[0]["x_hat_list"]
    assert len(dec_blocks) == len(enc_side)
    for a, b in zip(enc_side, dec_blocks):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_set_params_matches_fresh_codec():
    """Swapping weights on a live codec (λ-sweep reuse, tools/rd_eval.py)
    must produce the same bitstream as a freshly constructed codec."""
    pts = _random_cloud(7)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [RESOLUTION] * 3,
                                      LEVEL)
    config = dict(model="v2", num_filters=8,
                  analysis="AnalysisTransformProgressiveV2",
                  synthesis="SynthesisTransformProgressiveV2")
    codec = _init_codec(config, seed=0)
    d_a, _ = codec.compress_blocks_device_opt(blocks, binstr, pts,
                                              RESOLUTION, LEVEL)
    fresh = _init_codec(config, seed=3)
    codec.set_params(fresh.params)
    d_b, meta_b = codec.compress_blocks_device_opt(blocks, binstr, pts,
                                                   RESOLUTION, LEVEL)
    d_f, _ = fresh.compress_blocks_device_opt(blocks, binstr, pts,
                                              RESOLUTION, LEVEL)
    assert d_b[0] == d_f[0], "swapped-params bitstream != fresh codec"
    assert d_a[0] != d_b[0], "distinct params gave identical bitstreams"
    dec = codec.decompress_blocks(d_b[0])
    for a, b in zip(meta_b[0]["x_hat_list"], dec):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_bucket_backend_matches_xla_and_overflow_fallback():
    """sweep_backend='bucket' (the TPU default) must emit identical
    payloads/selections to the exact XLA backend; with a tiny candidate
    budget every block overflows and the splice-back fallback must still
    reproduce the exact result."""
    pts = _random_cloud(13)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [RESOLUTION] * 3,
                                      LEVEL)
    cfg = dict(model="v2", num_filters=8, analysis="AnalysisTransformV1",
               synthesis="SynthesisTransformV1")
    ref_codec = _init_codec(cfg, sweep_backend="xla")
    kw = dict(opt_metrics=("d1_mse", "d1_mse_BA"), max_deltas=(np.inf, 3.0))
    ref_data, ref_meta = ref_codec.compress_blocks_device_opt(
        blocks, binstr, pts, RESOLUTION, LEVEL, **kw)

    bk = _init_codec(cfg, sweep_backend="bucket")
    bk.bucket_k = BLOCK ** 3  # ample: no overflow
    b_data, b_meta = bk.compress_blocks_device_opt(
        blocks, binstr, pts, RESOLUTION, LEVEL, **kw)
    assert b_data[0] == ref_data[0]
    assert [m["idx"] for m in b_meta] == [m["idx"] for m in ref_meta]

    ov = _init_codec(cfg, sweep_backend="bucket")
    ov.bucket_k = 128  # every non-trivial block overflows → XLA fallback
    o_data, o_meta = ov.compress_blocks_device_opt(
        blocks, binstr, pts, RESOLUTION, LEVEL, **kw)
    assert o_data[0] == ref_data[0]
    for om, rm in zip(o_meta, ref_meta):
        for ob, rb in zip(om["x_hat_list"], rm["x_hat_list"]):
            np.testing.assert_array_equal(np.asarray(ob), np.asarray(rb))


@pytest.mark.slow
def test_mask_transport_matches_argwhere():
    """Reconstructions travel as packed 1-bit mask rows decoded by the
    native bit walker (r4; the compact-position transfer and its
    coord_budget fallback were removed). The coordinate lists must equal
    np.argwhere of the thresholded canonical x_hat, in argwhere order,
    on both the encoder (embedded x_hat_list) and the decoder."""
    pts = _random_cloud(17)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [RESOLUTION] * 3,
                                      LEVEL)
    cfg = dict(model="v2", num_filters=8, analysis="AnalysisTransformV1",
               synthesis="SynthesisTransformV1")
    codec = _init_codec(cfg)
    data, meta = codec.compress_blocks_device_opt(blocks, binstr, pts,
                                                  RESOLUTION, LEVEL)
    dec_blocks, debug = codec.decompress_blocks(data[0], return_debug=True)
    for i, (emb, dec) in enumerate(zip(meta[0]["x_hat_list"], dec_blocks)):
        np.testing.assert_array_equal(np.asarray(emb), np.asarray(dec))
        # argwhere-order contract of the bit transport
        bits = np.unpackbits(debug["packed_masks"][i], bitorder="big")
        ref = np.argwhere(
            bits.reshape(BLOCK, BLOCK, BLOCK)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(dec), ref)


def test_rerun_decode_uses_canonical_batch_width():
    """Regression (r3, real-TPU bench 03:38): every _dec_fn call must use
    the one batch_blocks width — a differently-shaped conv executable may
    reassociate accumulations on TPU and flip borderline mask bits,
    breaking decoder bit-exactness. The r4 rerun no longer decodes at all
    (it gathers the kept canonical x_hat and only re-sweeps), so an
    overflowing encode must show exclusively bs-wide decode calls."""
    pts = _random_cloud(19)
    blocks, binstr = partition_octree(pts, [0, 0, 0], [RESOLUTION] * 3,
                                      LEVEL)
    cfg = dict(model="v2", num_filters=8, analysis="AnalysisTransformV1",
               synthesis="SynthesisTransformV1")
    codec = _init_codec(cfg, sweep_backend="bucket")
    codec.bucket_k = 128  # force the rerun on every non-trivial block

    widths = []
    inner = codec._dec_fn

    def spy(params, s):
        widths.append(int(s.shape[0]))
        return inner(params, s)

    codec._dec_fn = spy
    codec.compress_blocks_device_opt(blocks, binstr, pts, RESOLUTION,
                                     LEVEL)
    assert widths, "decode executable never ran"
    assert set(widths) == {codec.batch_blocks}, widths
