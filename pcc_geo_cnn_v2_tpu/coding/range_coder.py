"""Python interface to the native rANS range coder, with a numpy twin.

The C++ library (``native/range_coder.cpp``) is compiled on demand with g++
and loaded via ctypes (foreign calls release the GIL, so a thread pool gives
true parallelism across blocks). The pure-Python implementation below is the
executable specification: tests assert the two produce identical bitstreams.

API contract (shared with the reference's tfc range coder usage, see
``/root/reference/src/utils/patch_gaussian_conditional.py:27-31``): each
element carries an index selecting a CDF row; symbols outside a row's
regular buckets are escape-coded with ``overflow_width``-bit units.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from pcc_geo_cnn_v2_tpu.models.entropy import CdfTable

__all__ = ["encode", "decode", "encode_batch", "decode_batch",
           "encode_py", "decode_py", "native_available"]

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "librange_coder.so"
_OVERFLOW_WIDTH = 4
_RANS_L = 1 << 31

_lib = None
_lib_lock = threading.Lock()


def _build_native():
    src = _NATIVE_DIR / "range_coder.cpp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_SO_PATH), str(src)]
    subprocess.run(cmd, check=True, capture_output=True)


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        try:
            if not _SO_PATH.exists() or (
                _SO_PATH.stat().st_mtime
                < (_NATIVE_DIR / "range_coder.cpp").stat().st_mtime
            ):
                _build_native()
            lib = ctypes.CDLL(str(_SO_PATH))
        except subprocess.CalledProcessError as e:
            # fall back to the (orders-of-magnitude slower) Python twins,
            # but LOUDLY — a silent fallback once masked a broken build
            import logging

            logging.getLogger(__name__).error(
                "native range coder failed to BUILD, falling back to the "
                "pure-Python twins (slow!):\n%s",
                (e.stderr or b"").decode(errors="replace")[-2000:],
            )
            return None
        except OSError as e:
            import logging

            logging.getLogger(__name__).error(
                "native range coder failed to load (%s); pure-Python "
                "twins in use (slow!)", e)
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.pcc_rc_encode.restype = ctypes.c_int64
        lib.pcc_rc_encode.argtypes = [
            i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, i32p,
            ctypes.c_int32, ctypes.c_int32, u8p, ctypes.c_int64,
        ]
        lib.pcc_rc_decode.restype = ctypes.c_int64
        lib.pcc_rc_decode.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, ctypes.c_int64,
            i32p, i32p, ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        lib.pcc_rc_decode_lut.restype = ctypes.c_int64
        lib.pcc_rc_decode_lut.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, ctypes.c_int64,
            i32p, i32p, ctypes.c_int32, ctypes.c_int32, u16p, i32p,
        ]
        try:  # batch entry points (absent only in a stale prebuilt .so)
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.pcc_rc_encode_batch.restype = ctypes.c_int64
            lib.pcc_rc_encode_batch.argtypes = [
                i32p, i32p, ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
                i32p, ctypes.c_int64, i32p, i32p, ctypes.c_int32,
                ctypes.c_int32, u8p, ctypes.c_int64, i64p,
            ]
            lib.pcc_rc_decode_lut_batch.restype = ctypes.c_int64
            lib.pcc_rc_decode_lut_batch.argtypes = [
                u8p, i64p, i32p, ctypes.c_int32, ctypes.c_int64,
                ctypes.c_int64, i32p, ctypes.c_int64, i32p, i32p,
                ctypes.c_int32, ctypes.c_int32, u16p, i32p,
            ]
        except AttributeError:
            pass  # encode_batch/decode_batch fall back to per-block calls
        _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def _as_c(table: CdfTable):
    # cached: encode/decode run once per block, and the contiguous-copy
    # of a 64-row Gaussian CDF is ~128 KB -- per-call copies added tens
    # of MB of memcpy per cloud on the single-core bench host
    cached = getattr(table, "_c_arrays", None)
    if cached is not None:
        return cached
    cdf = np.ascontiguousarray(table.cdf, np.int32)
    out = (cdf, np.ascontiguousarray(table.cdf_length, np.int32),
           np.ascontiguousarray(table.offset, np.int32))
    try:
        object.__setattr__(table, "_c_arrays", out)
    except AttributeError:
        pass
    return out


def _get_lut(table: CdfTable, cdf, cdf_len):
    """slot -> bucket lookup rows (uint16 [rows, 2^precision]).

    Replaces the decoder's per-symbol CDF binary search with one load
    (~3x y-stream decode throughput); built once per table (~10 ms for
    the 64-row Gaussian table, 8 MB) and cached on the table object.
    """
    lut = getattr(table, "_slot_lut", None)
    if lut is not None:
        return lut
    size = 1 << table.precision
    lut = np.empty((cdf.shape[0], size), np.uint16)
    for r in range(cdf.shape[0]):
        length = int(cdf_len[r])
        row = cdf[r, :length]
        # bucket b covers slots [row[b], row[b+1])
        lut[r] = np.repeat(
            np.arange(length - 1, dtype=np.uint16), np.diff(row))
    try:
        object.__setattr__(table, "_slot_lut", lut)
    except AttributeError:
        pass  # slotted table: rebuild per call (correct, just slower)
    return lut


def encode(symbols, indexes, table: CdfTable,
           overflow_width=_OVERFLOW_WIDTH) -> bytes:
    """Range-encode int32 ``symbols`` (any shape) against CDF rows."""
    symbols = np.ascontiguousarray(np.asarray(symbols, np.int32).ravel())
    indexes = np.ascontiguousarray(np.asarray(indexes, np.int32).ravel())
    assert symbols.shape == indexes.shape
    lib = _get_lib()
    if lib is None:
        return encode_py(symbols, indexes, table, overflow_width)
    cdf, cdf_len, offset = _as_c(table)
    capacity = 16 + symbols.size * 16  # worst case: deep escapes
    out = np.empty(capacity, np.uint8)
    n = lib.pcc_rc_encode(symbols, indexes, symbols.size, cdf, cdf.shape[1],
                          cdf_len, offset, table.precision, overflow_width,
                          out, capacity)
    if n < 0:
        raise RuntimeError("range encoder overflow")
    return out[:n].tobytes()


def encode_batch(symbols, indexes, table: CdfTable,
                 overflow_width=_OVERFLOW_WIDTH):
    """Range-encode ``n`` same-shape symbol blocks in ONE native call.

    The bench host has a single core, so the per-block thread pool around
    :func:`encode` gains nothing from parallelism — its cost is n× Python
    dispatch, array conversion, and a 0.5 MB allocation per call, all
    competing for the GIL with the codec's fetch threads. This path does
    the dtype conversion once for the whole batch and stays inside the
    C++ loop (GIL released) for every stream.

    :param symbols: [n, ...] array — one stream per leading row.
    :param indexes: CDF-row indexes, either one shared row shaped like
        ``symbols[0]`` (channel indexes) or per-stream rows shaped like
        ``symbols``.
    :return: list of n ``bytes``, each byte-identical to
        ``encode(symbols[i], indexes_i, table)``.
    """
    symbols = np.ascontiguousarray(np.asarray(symbols, np.int32))
    n = symbols.shape[0]
    if n == 0:
        return []
    stream_len = int(np.prod(symbols.shape[1:], dtype=np.int64))
    indexes = np.ascontiguousarray(np.asarray(indexes, np.int32))
    shared = indexes.size == stream_len
    assert shared or indexes.size == symbols.size, \
        (indexes.shape, symbols.shape)
    lib = _get_lib()
    if lib is None or not hasattr(lib, "pcc_rc_encode_batch"):
        return [encode(symbols[i], indexes if shared else indexes[i],
                       table, overflow_width) for i in range(n)]
    cdf, cdf_len, offset = _as_c(table)
    capacity = 16 * n + symbols.size * 16  # worst case: deep escapes
    out = np.empty(capacity, np.uint8)  # lazy pages; streams are ~KB
    offs = np.empty(n + 1, np.int64)
    total = lib.pcc_rc_encode_batch(
        symbols.reshape(-1), indexes.reshape(-1), int(shared), n,
        stream_len, cdf, cdf.shape[1], cdf_len, offset, table.precision,
        overflow_width, out, capacity, offs)
    if total < 0:
        raise RuntimeError("range encoder overflow")
    return [out[offs[i]:offs[i + 1]].tobytes() for i in range(n)]


def decode_batch(datas, indexes, table: CdfTable,
                 overflow_width=_OVERFLOW_WIDTH,
                 per_stream=None) -> np.ndarray:
    """Inverse of :func:`encode_batch`: decode ``n`` streams in ONE
    native call.

    :param datas: sequence of n ``bytes`` streams.
    :param indexes: one shared row (any shape) or per-stream rows
        ``[n, ...]``.
    :param per_stream: True when ``indexes`` is [n, *row], False for one
        shared row. None infers [n, *row] from the leading dim — WRONG
        for a shared multi-dim row whose leading dim happens to equal n
        (e.g. a v1 y-index row with 8 leading voxels and 8 streams), so
        call sites that can hit that pass it explicitly.
    :return: int32 ``[n, *row_shape]`` symbols.
    """
    n = len(datas)
    indexes = np.asarray(indexes, np.int32)
    if per_stream is None:
        per_stream = indexes.ndim >= 2 and indexes.shape[0] == n
    if per_stream:
        shared = False
        row_shape = indexes.shape[1:]
    else:
        shared = True
        row_shape = indexes.shape
    stream_len = int(np.prod(row_shape, dtype=np.int64)) if row_shape else 1
    lib = _get_lib()
    if n == 0:
        return np.empty((0,) + tuple(row_shape), np.int32)
    if lib is None or not hasattr(lib, "pcc_rc_decode_lut_batch"):
        rows = [decode(datas[i], indexes if shared else indexes[i],
                       table, overflow_width) for i in range(n)]
        return np.stack(rows).astype(np.int32)
    cdf, cdf_len, offset = _as_c(table)
    lens = np.fromiter((len(d) for d in datas), np.int64, count=n)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    buf = np.frombuffer(b"".join(datas), np.uint8)
    if buf.size == 0:
        buf = np.empty(1, np.uint8)  # valid pointer for ctypes
    flat_idx = np.ascontiguousarray(indexes.reshape(-1))
    out = np.empty(n * stream_len, np.int32)
    lut = _get_lut(table, cdf, cdf_len)
    rc = lib.pcc_rc_decode_lut_batch(
        buf, offs, flat_idx, int(shared), n, stream_len, cdf, cdf.shape[1],
        cdf_len, offset, table.precision, overflow_width, lut, out)
    if rc != 0:
        raise ValueError("malformed range-coded stream")
    return out.reshape((n,) + tuple(row_shape))


def decode(data: bytes, indexes, table: CdfTable,
           overflow_width=_OVERFLOW_WIDTH) -> np.ndarray:
    """Inverse of :func:`encode`; returns int32 symbols shaped like indexes."""
    indexes = np.asarray(indexes, np.int32)
    flat = np.ascontiguousarray(indexes.ravel())
    lib = _get_lib()
    if lib is None:
        return decode_py(data, indexes, table, overflow_width)
    cdf, cdf_len, offset = _as_c(table)
    out = np.empty(flat.size, np.int32)
    buf = np.frombuffer(data, np.uint8)
    lut = _get_lut(table, cdf, cdf_len)
    rc = lib.pcc_rc_decode_lut(buf, len(data), flat, flat.size, cdf,
                               cdf.shape[1], cdf_len, offset,
                               table.precision, overflow_width, lut, out)
    if rc != 0:
        raise ValueError("malformed range-coded stream")
    return out.reshape(indexes.shape)


# ---------------------------------------------------------------------------
# Pure-Python twin (specification + fallback)
# ---------------------------------------------------------------------------


def _events(symbols, indexes, table: CdfTable, w):
    cont = 1 << w
    for s, r in zip(symbols.tolist(), indexes.tolist()):
        row = table.cdf[r]
        num_regular = int(table.cdf_length[r]) - 2
        b = s - int(table.offset[r])
        if 0 <= b < num_regular:
            yield int(row[b]), int(row[b + 1] - row[b]), table.precision
        else:
            esc = num_regular
            yield int(row[esc]), int(row[esc + 1] - row[esc]), table.precision
            v = ((-b - 1) << 1) if b < 0 else (((b - num_regular) << 1) | 1)
            while True:
                unit = v & (cont - 1)
                v >>= w
                if v:
                    unit |= cont
                yield unit, 1, w + 1
                if not v:
                    break


def encode_py(symbols, indexes, table, overflow_width=_OVERFLOW_WIDTH):
    symbols = np.asarray(symbols, np.int32).ravel()
    indexes = np.asarray(indexes, np.int32).ravel()
    x = _RANS_L
    words = []
    for start, freq, bits in reversed(list(_events(symbols, indexes, table,
                                                   overflow_width))):
        x_max = ((_RANS_L >> bits) << 32) * freq
        while x >= x_max:
            words.append(x & 0xFFFFFFFF)
            x >>= 32
        x = ((x // freq) << bits) + (x % freq) + start
    out = x.to_bytes(8, "little")
    for word in reversed(words):
        out += int(word).to_bytes(4, "little")
    return out


def decode_py(data, indexes, table, overflow_width=_OVERFLOW_WIDTH):
    indexes = np.asarray(indexes, np.int32)
    flat = indexes.ravel()
    w = overflow_width
    cont = 1 << w
    x = int.from_bytes(data[:8], "little")
    words = [int.from_bytes(data[8 + 4 * i: 12 + 4 * i], "little")
             for i in range((len(data) - 8) // 4)]
    pos = 0

    def advance(start, freq, bits):
        nonlocal x, pos
        x = freq * (x >> bits) + (x & ((1 << bits) - 1)) - start
        while x < _RANS_L:
            x = (x << 32) | words[pos]
            pos += 1

    out = np.empty(flat.size, np.int32)
    for i, r in enumerate(flat.tolist()):
        row = table.cdf[r]
        length = int(table.cdf_length[r])
        num_regular = length - 2
        slot = x & ((1 << table.precision) - 1)
        b = int(np.searchsorted(row[:length], slot, side="right")) - 1
        advance(int(row[b]), int(row[b + 1] - row[b]), table.precision)
        if b == num_regular:
            v = 0
            shift = 0
            while True:
                unit = x & (2 * cont - 1)
                advance(unit, 1, w + 1)
                v |= (unit & (cont - 1)) << shift
                shift += w
                if not (unit & cont):
                    break
            b = (num_regular + (v >> 1)) if (v & 1) else (-(v >> 1) - 1)
        out[i] = b + int(table.offset[r])
    return out.reshape(indexes.shape)
