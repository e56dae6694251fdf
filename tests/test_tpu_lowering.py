"""TPU (Mosaic) lowering regression tests for every Pallas kernel family.

Pallas kernels pass CPU interpret-mode tests and still fail MLIR
verification when lowered for real TPUs (r5 incident: a float32
``broadcasted_iota`` in the d2 bucket kernel — legal in interpret mode,
rejected by Mosaic as "'tpu.iota' op result #0 must be vector of integer
values" — crashed every uncached hardware eval while the CPU suite
stayed green). Mosaic lowering is a host-side transformation, so
``jax.export.export(..., platforms=["tpu"])`` reproduces that failure
class on a CPU-only test host: these tests lower each kernel at its
PRODUCTION shapes (tile-size dependent verification means toy shapes
can pass where real ones fail) and assert the export succeeds.

This catches lowering-time faults only; runtime miscompiles (e.g. the r4
argmin-EDT-under-``lax.map`` worker crash) still need hardware runs.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

B = 64  # production block size
T = 256  # production threshold-grid size
P = 4096  # codec point budget per block (codec.warmup_cloud_shapes)


def _export_tpu(fn, *args):
    """Lower ``fn`` for the TPU platform; raises on Mosaic verification
    failures exactly like the hardware compile path does."""
    return jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)


def _sweep_args(n):
    xh = jnp.zeros((n, B, B, B), jnp.float32)
    pts = jnp.full((n, P, 3), -1, jnp.int32)
    thr = jnp.linspace(0.0, 1.0, T).astype(jnp.float32)
    return xh, pts, thr


def test_bucket_sweep_d1_lowers():
    from pcc_geo_cnn_v2_tpu.ops.bucket_sweep import (
        select_thresholds_d1_bucket,
    )

    xh, pts, thr = _sweep_args(16)
    _export_tpu(
        lambda a, b, c: select_thresholds_d1_bucket(
            a, b, c, opt_metrics=("d1_mse",), max_deltas=(np.inf,),
            K=32768),
        xh, pts, thr)


def test_bucket_sweep_d2_lowers():
    """The d1+d2 kernel at the production (K=32768, pc=512, kc=1024)
    tiling — the exact configuration whose f32 iota failed on hardware."""
    from pcc_geo_cnn_v2_tpu.ops.bucket_sweep import (
        select_thresholds_d1_bucket,
    )

    xh, pts, thr = _sweep_args(16)
    nrm = jnp.zeros((16, P, 3), jnp.float32)
    _export_tpu(
        lambda a, b, c, d: select_thresholds_d1_bucket(
            a, b, c, opt_metrics=("d1_mse", "d2_mse"),
            max_deltas=(np.inf,), K=32768, nrm=d),
        xh, pts, thr, nrm)


def test_bucket_sweep_d2_exact_lowers():
    """The K=B³ 'bucket_exact' variant (normals overflow-rerun path)."""
    from pcc_geo_cnn_v2_tpu.ops.bucket_sweep import (
        select_thresholds_d1_bucket,
    )

    xh, pts, thr = _sweep_args(4)
    nrm = jnp.zeros((4, P, 3), jnp.float32)
    _export_tpu(
        lambda a, b, c, d: select_thresholds_d1_bucket(
            a, b, c, opt_metrics=("d1_mse", "d2_mse"),
            max_deltas=(np.inf,), K=B ** 3, nrm=d),
        xh, pts, thr, nrm)


def test_edt_sweep_lowers():
    from pcc_geo_cnn_v2_tpu.ops.pallas_sweep import d1_sweep_sums_pallas

    xh, pts, thr = _sweep_args(4)
    occ = jnp.zeros((4, B, B, B), jnp.float32)
    _export_tpu(
        lambda a, b, c, d: d1_sweep_sums_pallas(a, b, c, pts=d),
        xh, occ, thr, pts)


def test_halo_kernel_lowers():
    """blockwise_d1_sums' bounded-EDT direction kernel at the production
    (size=64, halo=12, batch=16) configuration (the halo_nn_64_12 AOT
    executable)."""
    from pcc_geo_cnn_v2_tpu.ops.pallas_halo import halo_d1_dir_pallas

    H = B + 2 * 12
    qry = jnp.zeros((16, H, H, H), jnp.float32)
    tgt = jnp.zeros((16, H, H, H), jnp.float32)
    _export_tpu(
        lambda a, b: halo_d1_dir_pallas(a, b, size=B, halo=12),
        qry, tgt)


@pytest.mark.parametrize("spatial,channels", [(8, 64), (32, 32), (64, 16)])
def test_fused_residual_tail_lowers(spatial, channels):
    """The fused conv tail at each transform-stack (spatial, channels)
    stage the c3p synthesis/analysis blocks use."""
    from pcc_geo_cnn_v2_tpu.ops.pallas_conv import fused_residual_tail

    x = jnp.zeros((1, spatial, spatial, spatial, channels), jnp.float32)
    w = jnp.zeros((3, 3, 3, channels, channels), jnp.float32)
    b = jnp.zeros((channels,), jnp.float32)
    _export_tpu(
        functools.partial(fused_residual_tail, spatial=spatial,
                          channels=channels),
        x, w, b, w, b)
