"""Smaller surfaces: mpeg_parsing via the pc_error stand-in, renders,
bf16 transform path, parallel_process failure propagation."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from pcc_geo_cnn_v2_tpu.utils import pc_io
from pcc_geo_cnn_v2_tpu.utils.mpeg_parsing import parse_pcerror
from pcc_geo_cnn_v2_tpu.utils.parallel_process import Popen, parallel_process


def test_pc_error_standin_parses(tmp_path, capsys):
    rng = np.random.default_rng(0)
    p1 = np.unique(rng.integers(0, 64, (500, 3)), axis=0).astype(float)
    jitter = rng.integers(-1, 2, p1.shape)
    p2 = np.clip(p1 + jitter, 0, 63)
    n = rng.normal(size=(len(p1), 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    a, b, nf = tmp_path / "a.ply", tmp_path / "b.ply", tmp_path / "n.ply"
    pc_io.write_ply(a, p1)
    pc_io.write_ply(b, p2)
    pc_io.write_ply(nf, np.hstack([p1, n]),
                    ["x", "y", "z", "nx", "ny", "nz"], dtypes=["f4"] * 6)

    from pcc_geo_cnn_v2_tpu.cli.pc_error import main as pc_error_main

    pc_error_main([f"--fileA={a}", f"--fileB={b}", f"--inputNorm={nf}",
                   "--resolution=63"])
    log = tmp_path / "pc_error.log"
    log.write_text(capsys.readouterr().out)
    parsed = parse_pcerror(log)
    assert parsed["d1_psnr"] > 10 and np.isfinite(parsed["d2_psnr"])

    from pcc_geo_cnn_v2_tpu.utils.metrics import compute_metrics

    direct = compute_metrics(p1, p2, 63, p1_n=n)
    np.testing.assert_allclose(parsed["d1_psnr"], direct["d1_psnr"],
                               rtol=1e-6)


def test_render_comparison(tmp_path):
    from pcc_geo_cnn_v2_tpu.utils.render import render_comparison

    rng = np.random.default_rng(1)
    ori = rng.integers(0, 128, (2000, 3)).astype(float)
    dec = np.clip(ori + rng.integers(-2, 3, ori.shape), 0, 127)
    out = tmp_path / "cmp.png"
    render_comparison(ori, dec, out)
    assert out.stat().st_size > 10_000


def test_bf16_transform_path():
    import jax
    import jax.numpy as jnp

    from pcc_geo_cnn_v2_tpu.models.transforms import (
        AnalysisTransformProgressiveV2,
    )

    m = AnalysisTransformProgressiveV2(8, dtype=jnp.bfloat16)
    x = jnp.ones((1, 16, 16, 16, 1), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    # params stay f32, compute in bf16
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    y = m.apply(params, x)
    assert y.dtype == jnp.bfloat16 and y.shape == (1, 2, 2, 2, 8)


def test_parallel_process_propagates_failure(tmp_path):
    def launch(ret):
        log = open(tmp_path / f"log{ret}.txt", "w")
        return Popen([sys.executable, "-c",
                      f"print('child says {ret}'); exit({ret})"],
                     stdout=log, stderr=subprocess.STDOUT)

    parallel_process(launch, [(0,), (0,)], 2, progress=False)
    with pytest.raises(RuntimeError, match="child says 3"):
        parallel_process(launch, [(0,), (3,)], 2, progress=False)


def test_plots_utils(tmp_path):
    from pcc_geo_cnn_v2_tpu.utils.plots import (
        make_colorbar,
        render_standalone_legend,
        set_paper_style,
        style_cycle,
    )

    set_paper_style()
    pairs = [next(c) for c in [style_cycle()] for _ in range(45)]
    assert len(set(pairs)) == 40  # 10 markers x 4 linestyles before repeat
    legend = tmp_path / "legend.png"
    render_standalone_legend(["c1", "c3p", "trisoup"], legend)
    assert legend.stat().st_size > 0
    import matplotlib.pyplot as plt

    fig, cmap_fn = make_colorbar(2.0)
    rgb = cmap_fn([0.0, 1.0, 2.0])
    assert rgb.shape == (3, 3) and np.all((rgb >= 0) & (rgb <= 1))
    plt.close(fig)


def test_pc_to_camera_params_auto(tmp_path):
    import json

    from pcc_geo_cnn_v2_tpu.cli.pc_to_camera_params import main as cam_main

    pts = np.random.default_rng(0).uniform(0, 255, (500, 3)).round()
    ply = tmp_path / "in.ply"
    pc_io.write_ply(ply, pts)
    out = tmp_path / "cam.json"
    cam_main([str(ply), str(out), "--auto"])
    params = json.loads(out.read_text())
    assert params["class_name"] == "PinholeCameraParameters"
    assert len(params["extrinsic"]) == 16
    ext = np.array(params["extrinsic"]).reshape(4, 4).T
    rot, trans = ext[:3, :3], ext[:3, 3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-9)
    # Open3D/OpenCV convention: the cloud center must land on +z, in
    # front of the camera (a look-away extrinsic renders nothing)
    center = (pts.min(0) + pts.max(0)) / 2.0
    cam = rot @ center + trans
    assert cam[2] > 0, cam
    np.testing.assert_allclose(cam[:2], 0.0, atol=1e-6)
