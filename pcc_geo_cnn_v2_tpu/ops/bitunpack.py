"""Host-side packed-mask -> coordinate-list unpack (native C++ fast path).

The decoder's dense blocks (over the compact position budget) turn
1-bit occupancy rows into [n_i, 3] float32 voxel lists on the host.
The numpy route (np.unpackbits -> np.nonzero -> div/mod) measured
1.6-5.6 s/cloud on the single-core bench host; the C++ single pass
(``native/voxel_bits.cpp``) does the same work in ~50 ms. Falls back
to numpy when the toolchain is unavailable — bit-identical output.

Reference analogue: the host argwhere over thresholded volumes in
``decompress_octree.py`` / ``compress_octree.py``.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["unpack_mask_coords", "native_available"]

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SRC = _NATIVE_DIR / "voxel_bits.cpp"
_SO_PATH = _NATIVE_DIR / "libvoxel_bits.so"

_lib = None
_lib_lock = threading.Lock()


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        try:
            if not _SO_PATH.exists() or (
                _SO_PATH.stat().st_mtime < _SRC.stat().st_mtime
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", str(_SO_PATH), str(_SRC)],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(str(_SO_PATH))
        except subprocess.CalledProcessError as e:
            logger.error(
                "voxel_bits failed to BUILD; numpy fallback in use "
                "(slow):\n%s",
                (e.stderr or b"").decode(errors="replace")[-2000:])
            return None
        except OSError as e:
            logger.error("voxel_bits failed to load (%s); numpy fallback "
                         "in use (slow)", e)
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.pcc_popcount.restype = ctypes.c_int64
        lib.pcc_popcount.argtypes = [u8p, ctypes.c_int64]
        lib.pcc_unpack_mask_coords.restype = ctypes.c_int64
        lib.pcc_unpack_mask_coords.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, f32p,
            ctypes.c_int64, i64p,
        ]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def _unpack_numpy(rows: np.ndarray, bsz: int):
    bits = np.unpackbits(rows, axis=-1, bitorder="big")
    blk, flat = np.nonzero(bits)
    coords = np.empty((len(flat), 3), np.float32)
    coords[:, 0] = flat // (bsz * bsz)
    coords[:, 1] = (flat // bsz) % bsz
    coords[:, 2] = flat % bsz
    splits = np.searchsorted(blk, np.arange(1, len(rows)))
    return np.split(coords, splits)


def unpack_mask_coords(rows: np.ndarray, bsz: int) -> list[np.ndarray]:
    """[n, bsz^3/8] packed-bit rows -> n arrays of [n_i, 3] f32 coords.

    Coordinate order matches ``np.argwhere`` of the unpacked volume
    (x-major flat order, bitorder "big").
    """
    rows = np.ascontiguousarray(rows, np.uint8)
    n, fbytes = rows.shape
    lib = _get_lib()
    if lib is None:
        return _unpack_numpy(rows, bsz)
    total = lib.pcc_popcount(rows.reshape(-1), rows.size)
    out = np.empty((total, 3), np.float32)
    counts = np.empty(n, np.int64)
    wrote = lib.pcc_unpack_mask_coords(
        rows.reshape(-1), n, fbytes, bsz, out, total, counts)
    assert wrote == total, (wrote, total)
    return np.split(out, np.cumsum(counts[:-1]))
