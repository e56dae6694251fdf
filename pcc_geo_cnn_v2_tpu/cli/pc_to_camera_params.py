"""Pick (or synthesize) camera parameters for a point cloud
(reference ``src/utils/pc_to_camera_params.py``).

With Open3D installed this opens the interactive viewer: frame the cloud,
close the window, and the final camera is written as an Open3D
``PinholeCameraParameters`` JSON — the exact contract ``ut_run_render``
consumes. Headless (no Open3D / no display), ``--auto`` derives a
deterministic front-facing camera from the cloud's bounding box so render
pipelines stay runnable end-to-end.
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np

from pcc_geo_cnn_v2_tpu.utils import pc_io
from pcc_geo_cnn_v2_tpu.utils.render import have_open3d

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def auto_camera_params(points, img_size=1024, axis=2):
    """Deterministic bbox-framed orthographic-ish pinhole camera dict."""
    pts = np.asarray(points, np.float64)[:, :3]
    center = (pts.min(0) + pts.max(0)) / 2.0
    span = float((pts.max(0) - pts.min(0)).max())
    eye = center.copy()
    eye[axis] += 2.5 * span
    f = img_size  # ~22° fov
    # look-at extrinsic in Open3D/OpenCV convention: camera +z points AT
    # the cloud, y down, x right (rot @ (center - eye) lands on +z)
    fwd = (center - eye) / np.linalg.norm(center - eye)
    up = np.array([0.0, 1.0, 0.0]) if axis != 1 else np.array([0.0, 0.0, 1.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    rot = np.stack([right, down, fwd])  # world→camera
    trans = -rot @ eye
    extrinsic = np.eye(4)
    extrinsic[:3, :3] = rot
    extrinsic[:3, 3] = trans
    return {
        "class_name": "PinholeCameraParameters",
        "intrinsic": {
            "width": img_size,
            "height": img_size,
            "intrinsic_matrix": [f, 0, 0, 0, f, 0,
                                 img_size / 2 - 0.5, img_size / 2 - 0.5, 1],
        },
        "extrinsic": list(extrinsic.T.reshape(-1)),  # column-major
        "version_major": 1,
        "version_minor": 0,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(prog="pc_to_camera_params")
    parser.add_argument("input_pc")
    parser.add_argument("output_json")
    parser.add_argument("--img_size", type=int, default=1024)
    parser.add_argument("--axis", type=int, default=2,
                        help="viewing axis for --auto")
    parser.add_argument("--auto", action="store_true",
                        help="skip the interactive picker; derive the "
                             "camera from the bounding box")
    args = parser.parse_args(argv)

    data, _ = pc_io.read_ply(args.input_pc)
    if not args.auto and have_open3d():
        import open3d as o3d

        pc = o3d.geometry.PointCloud()
        pc.points = o3d.utility.Vector3dVector(data[:, :3])
        vis = o3d.visualization.Visualizer()
        vis.create_window(width=args.img_size, height=args.img_size)
        vis.add_geometry(pc)
        vis.run()  # user frames the cloud, then closes the window
        params = vis.get_view_control().convert_to_pinhole_camera_parameters()
        vis.destroy_window()
        o3d.io.write_pinhole_camera_parameters(args.output_json, params)
    else:
        if not args.auto:
            logger.warning("Open3D unavailable; falling back to --auto")
        with open(args.output_json, "w") as f:
            json.dump(auto_camera_params(data, args.img_size, args.axis), f,
                      indent=1)
    logger.info("wrote %s", args.output_json)


if __name__ == "__main__":
    main()
