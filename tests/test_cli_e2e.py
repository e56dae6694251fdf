"""Full CLI pipeline on CPU: mesh → dataset → train → compress → decompress
→ recolor, through the same argv surfaces the reference exposes."""

import gzip
import json
from pathlib import Path

import numpy as np
import pytest

from pcc_geo_cnn_v2_tpu.cli import (
    compress as cli_compress,
    decompress as cli_decompress,
    ds_mesh_to_pc,
    ds_pc_octree_blocks,
    ds_select_largest,
    map_color as cli_map_color,
    train as cli_train,
)
from pcc_geo_cnn_v2_tpu.utils import pc_io

RES = 32
LEVEL = 1  # 16³ blocks


def _make_off(path, n=60, seed=0):
    """Random triangle soup around a sphere."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    faces = rng.integers(0, n, size=(2 * n, 3))
    ok = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    faces = faces[ok]
    with open(path, "w") as f:
        f.write(f"OFF\n{n} {len(faces)} 0\n")
        for p in v:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for t in faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    # dataset: meshes -> clouds -> blocks
    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    for i in range(3):
        _make_off(mesh_dir / f"m{i}.off", seed=i)
    ds_select_largest.main([str(mesh_dir), "*.off",
                            str(tmp_path / "sel"), "2"])
    assert len(list((tmp_path / "sel").glob("*.off"))) == 2

    ds_mesh_to_pc.main([str(tmp_path / "sel"), "*.off",
                        str(tmp_path / "pc"), "--vg_size", str(RES),
                        "--n_samples", "20000", "--processes", "1"])
    clouds = sorted((tmp_path / "pc").glob("*.ply"))
    assert len(clouds) == 2

    ds_pc_octree_blocks.main([str(tmp_path / "pc"), "*.ply",
                              str(tmp_path / "blocks"),
                              "--vg_size", str(RES), "--level", str(LEVEL),
                              "--processes", "1"])
    blocks = sorted((tmp_path / "blocks").glob("*.ply"))
    assert blocks

    # train a tiny c1 for a few steps
    ckpt = tmp_path / "ckpt"
    cli_train.main([str(tmp_path / "blocks" / "*.ply"), str(ckpt),
                    "--model_config", "c1", "--num_filters", "8",
                    "--resolution", "16", "--batch_size", "2",
                    "--max_steps", "8", "--val_every", "4",
                    "--val_batches", "1"])
    assert (ckpt / "done").exists()

    # compress one cloud (host threshold path; tiny model)
    pc0 = str(clouds[0])
    bin0 = str(tmp_path / "out.bin")
    dec0 = str(tmp_path / "out.dec.ply")
    cli_compress.main([
        "--input_files", pc0, "--output_files", bin0,
        "--dec_files", dec0,
        "--checkpoint_dir", str(ckpt), "--model_config", "c1",
        "--num_filters", "8", "--resolution", str(RES),
        "--octree_level", str(LEVEL), "--batch_blocks", "4",
    ])
    assert Path(bin0).exists()
    meta = json.loads(Path(bin0 + ".enc.metric.json").read_text())
    assert "d1_psnr" in meta
    with gzip.open(bin0, "rb") as f:
        assert len(f.read()) > 8

    out0 = str(tmp_path / "out.ply")
    cli_decompress.main([
        "--input_files", bin0, "--output_files", out0,
        "--checkpoint_dir", str(ckpt), "--model_config", "c1",
        "--num_filters", "8", "--batch_blocks", "4",
    ])
    decoded, _ = pc_io.read_ply(out0)
    embedded, _ = pc_io.read_ply(dec0)
    # decoder output == encoder-embedded decode, through the CLI surface
    key = lambda a: np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
    np.testing.assert_array_equal(decoded[key(decoded)],
                                  embedded[key(embedded)])

    # recolor the decoded cloud from a colored original
    colored = str(tmp_path / "colored.ply")
    ori, _ = pc_io.read_ply(pc0)
    rgb = np.tile([200, 100, 50], (len(ori), 1))
    pc_io.write_ply(colored, np.hstack([ori, rgb]),
                    ["x", "y", "z", "red", "green", "blue"],
                    dtypes=["f4"] * 3 + ["u1"] * 3)
    recolored = str(tmp_path / "recolored.ply")
    cli_map_color.main([colored, out0, recolored])
    back, names = pc_io.read_ply(recolored)
    assert names == ["x", "y", "z", "red", "green", "blue"]
    assert (back[:, 3:] == [200, 100, 50]).all()


@pytest.mark.slow
def test_compress_cli_d2_groups(tmp_path):
    """d1+d2 opt-metric encode through the CLI surface: separate normals
    PLY (reference --input_normals contract, compress_octree.py:56-59),
    one bitstream per metric group, decode of the d2 group matches its
    encoder-embedded decode."""
    from pcc_geo_cnn_v2_tpu.utils.scansim import figure_cloud

    coords, nrm = figure_cloud(7, RES, with_normals=True)
    pc = str(tmp_path / "in.ply")
    pc_io.write_ply(pc, coords, ["x", "y", "z"], dtypes=["f4"] * 3)
    nrm_ply = str(tmp_path / "in.nrm.ply")
    pc_io.write_ply(nrm_ply, np.hstack([coords, nrm]),
                    ["x", "y", "z", "nx", "ny", "nz"], dtypes=["f4"] * 6)

    pc_dir = tmp_path / "pc"
    pc_dir.mkdir()
    pc_io.write_ply(str(pc_dir / "in.ply"), coords, ["x", "y", "z"],
                    dtypes=["f4"] * 3)
    ds_pc_octree_blocks.main([str(pc_dir), "*.ply",
                              str(tmp_path / "blocks"),
                              "--vg_size", str(RES), "--level", str(LEVEL),
                              "--processes", "1"])
    ckpt = tmp_path / "ckpt"
    cli_train.main([str(tmp_path / "blocks" / "*.ply"), str(ckpt),
                    "--model_config", "c1",
                    "--num_filters", "8", "--resolution", "16",
                    "--batch_size", "2", "--max_steps", "600",
                    "--val_every", "300", "--val_batches", "1"])

    outs = [str(tmp_path / "out.d1.bin"), str(tmp_path / "out.d2.bin")]
    decs = [str(tmp_path / "out.d1.dec.ply"), str(tmp_path / "out.d2.dec.ply")]
    cli_compress.main([
        "--input_files", pc, "--input_normals", nrm_ply,
        "--output_files", *outs, "--dec_files", *decs,
        "--opt_metrics", "d1_mse", "d2_mse",
        "--checkpoint_dir", str(ckpt), "--model_config", "c1",
        "--num_filters", "8", "--resolution", str(RES),
        "--octree_level", str(LEVEL), "--batch_blocks", "4",
    ])
    for o in outs:
        assert Path(o).exists()
        meta = json.loads(Path(o + ".enc.metric.json").read_text())
        assert "d1_psnr" in meta or "d2_psnr" in meta

    out_ply = str(tmp_path / "out.d2.ply")
    cli_decompress.main([
        "--input_files", outs[1], "--output_files", out_ply,
        "--checkpoint_dir", str(ckpt), "--model_config", "c1",
        "--num_filters", "8", "--batch_blocks", "4",
    ])
    decoded, _ = pc_io.read_ply(out_ply)
    embedded, _ = pc_io.read_ply(decs[1])
    key = lambda a: np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
    np.testing.assert_array_equal(decoded[key(decoded)],
                                  embedded[key(embedded)])
