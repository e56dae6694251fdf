"""Encode point clouds: octree partition + batched block compression.

CLI/file-contract parity with the reference's ``src/compress_octree.py``:
gzipped bitstreams per (input × opt-metric-group), ``.enc.metric.json``
sidecars, optional merged decode via ``--dec_files``. TPU path: all blocks
batched through one jitted executable; adaptive thresholds swept on device
for d1 metrics (host path for d2/with-normals).
"""

from __future__ import annotations

import argparse
import gzip
import json
import logging
import os

import numpy as np

from pcc_geo_cnn_v2_tpu.cli.common import (
    add_model_args,
    build_model_from_args,
    load_params,
)
from pcc_geo_cnn_v2_tpu.codec import BlockCodec
from pcc_geo_cnn_v2_tpu.coding.syntax import save_compressed_file
from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import D1_METRICS
from pcc_geo_cnn_v2_tpu.utils import pc_io
from pcc_geo_cnn_v2_tpu.utils.metrics import validate_opt_metrics
from pcc_geo_cnn_v2_tpu.utils.octree import partition_octree

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="compress",
        description="Compress point clouds.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--input_files", nargs="+", required=True)
    parser.add_argument("--output_files", nargs="+", required=True,
                        help="One per input x opt-metric (when several).")
    parser.add_argument("--input_normals", nargs="+",
                        help="Enables d2 opt metrics.")
    parser.add_argument("--dec_files", nargs="*",
                        help="Write merged-decode PLYs at encode time.")
    parser.add_argument("--checkpoint_dir", required=True)
    add_model_args(parser)
    parser.add_argument("--opt_metrics", nargs="+", default=["d1_mse"])
    parser.add_argument("--max_deltas", nargs="+", default=[np.inf],
                        type=float)
    parser.add_argument("--fixed_threshold", action="store_true")
    parser.add_argument("--resolution", type=int, default=64)
    parser.add_argument("--octree_level", type=int, default=4)
    parser.add_argument("--batch_blocks", type=int, default=32)
    parser.add_argument("--threshold_mode", default="auto",
                        choices=["auto", "device", "host"])
    parser.add_argument("--debug", action="store_true",
                        help="Dump encoder-side symbols for the decoder's "
                             "bit-exactness check.")
    args = parser.parse_args(argv)

    with_normals = args.input_normals is not None
    validate_opt_metrics(args.opt_metrics, with_normals=with_normals)
    files_mult = len(args.opt_metrics) if len(args.opt_metrics) > 1 else 1
    assert files_mult * len(args.input_files) == len(args.output_files)
    if args.dec_files:
        assert files_mult * len(args.input_files) == len(args.dec_files)

    model = build_model_from_args(args)
    params = load_params(model, args.checkpoint_dir)

    block_size = args.resolution // (2 ** args.octree_level)
    codec = BlockCodec(model, params, block_size=block_size,
                       batch_blocks=args.batch_blocks)

    points = pc_io.load_points(args.input_files)
    if with_normals:
        normals = [
            pc_io.read_ply(p, columns=["nx", "ny", "nz"])[0]
            for p in args.input_normals
        ]
        points = [np.hstack((p, n)) for p, n in zip(points, normals)]

    def _dedup_voxels(p):
        # voxel-grid inputs must be unique integer coordinates: the
        # codec's occupancy grids dedup implicitly, and the device
        # sweep's points×candidates path (_sparse_ab_sums) requires the
        # point list and the grid to agree exactly. Keeps the first
        # occurrence (with its attribute columns).
        p = p.copy()
        p[:, :3] = np.round(p[:, :3])
        _, idx = np.unique(p[:, :3], axis=0, return_index=True)
        return p[np.sort(idx)] if len(idx) < len(p) else p

    points = [_dedup_voxels(p) for p in points]

    from pcc_geo_cnn_v2_tpu.ops.threshold_sweep import D2_METRICS

    use_device = (
        args.threshold_mode != "host"
        and not args.fixed_threshold
        and all(m in D1_METRICS + D2_METRICS for m in args.opt_metrics)
        and (with_normals or all(m in D1_METRICS
                                 for m in args.opt_metrics))
    )
    if args.threshold_mode == "device":
        assert use_device, "device sweep needs d1/d2 metrics"

    for i, (infile, pts) in enumerate(zip(args.input_files, points)):
        blocks, binstr = partition_octree(
            pts, [0, 0, 0], [args.resolution] * 3, args.octree_level
        )
        logger.info("%s: %d blocks (device sweep: %s)", infile, len(blocks),
                    use_device)
        if use_device:
            data_list, metadata = codec.compress_blocks_device_opt(
                blocks, binstr, pts, args.resolution, args.octree_level,
                opt_metrics=tuple(args.opt_metrics),
                max_deltas=tuple(args.max_deltas),
                with_normals=with_normals,
            )
        else:
            data_list, metadata = codec.compress_blocks(
                blocks, binstr, pts, args.resolution, args.octree_level,
                with_normals=with_normals,
                opt_metrics=tuple(args.opt_metrics),
                max_deltas=tuple(args.max_deltas),
                fixed_threshold=args.fixed_threshold,
            )
        assert len(data_list) == files_mult, (
            f"{len(data_list)} metric groups != {files_mult} output files"
        )
        outs = [args.output_files[i * files_mult + j]
                for j in range(files_mult)]
        for j, (of, payload, meta) in enumerate(zip(outs, data_list,
                                                    metadata)):
            os.makedirs(os.path.dirname(of) or ".", exist_ok=True)
            with gzip.open(of, "wb") as f:
                f.write(save_compressed_file(binstr, payload,
                                             args.resolution,
                                             args.octree_level))
            with open(of + ".enc.metric.json", "w") as f:
                json.dump({k: v for k, v in meta["metrics"].items()
                           if np.isfinite(v)}, f, sort_keys=True, indent=4)
            if args.dec_files:
                pc_io.write_ply(args.dec_files[i * files_mult + j],
                                meta["blocks_full"][:, :3])
        if args.debug:
            enc_out = codec.encode_blocks(blocks)
            np.savez_compressed(
                outs[0] + ".enc.debug.npz",
                **{k: v for k, v in enc_out.items()
                   if isinstance(v, np.ndarray)},
            )
        logger.info("%s done -> %s", infile, ", ".join(outs))


if __name__ == "__main__":
    main()
