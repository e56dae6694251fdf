"""Built-in octree anchor codec (G-PCC-octree-style, in lieu of tmc3).

The reference compares against the external MPEG G-PCC binary
(``/root/reference/src/mp_run.py:33-41``); no such binary exists in this
environment, so this module provides a genuine, self-contained anchor of
the same family: positions are quantized by ``positionQuantizationScale``
(the CTC octree rate control), deduplicated, and coded as the
breadth-first stream of 8-bit child-occupancy masks of the full octree —
the core of G-PCC's octree geometry mode — entropy-coded with DEFLATE.

DEFLATE is weaker than G-PCC's context-adaptive arithmetic coder, so
anchor rates are *pessimistic* by roughly 10–30%; BD gains of the learned
codec over this anchor are therefore an upper bound and are labeled as
"octree anchor (builtin)" rather than G-PCC in reports.

Everything is vectorized numpy (one pass per octree level, no per-node
Python), encoding ~1 M points in well under a second.
"""

from __future__ import annotations

import gzip
import struct

import numpy as np

__all__ = ["anchor_encode", "anchor_decode", "write_tmc3_style_log"]

_MAGIC = b"OCTA"


def _interleave(coords, bits):
    """[N,3] int → Morton codes (int64), x most significant."""
    c = np.asarray(coords, np.int64)
    out = np.zeros(len(c), np.int64)
    for b in range(bits):
        for ax in range(3):
            out |= ((c[:, ax] >> b) & 1) << (3 * b + (2 - ax))
    return out


def _deinterleave(codes, bits):
    codes = np.asarray(codes, np.int64)
    out = np.zeros((len(codes), 3), np.int64)
    for b in range(bits):
        for ax in range(3):
            out[:, ax] |= ((codes >> (3 * b + (2 - ax))) & 1) << b
    return out


def octree_mask_stream(codes, bits):
    """Sorted unique Morton codes → breadth-first child-mask bytes."""
    codes = np.unique(codes)
    levels = []
    for level in range(bits):
        shift = 3 * (bits - level - 1)
        pc = np.unique(codes >> shift)  # unique (parent<<3 | child)
        par = pc >> 3
        upar, inv = np.unique(par, return_inverse=True)
        masks = np.zeros(len(upar), np.uint8)
        np.bitwise_or.at(masks, inv,
                         (1 << (pc & 7)).astype(np.uint8))
        levels.append(masks)
    return np.concatenate(levels)


def octree_mask_decode(masks, bits):
    """Inverse of :func:`octree_mask_stream` → sorted Morton codes."""
    masks = np.asarray(masks, np.uint8)
    pos = 0
    nodes = np.zeros(1, np.int64)  # root
    for _ in range(bits):
        m = masks[pos:pos + len(nodes)]
        pos += len(nodes)
        parts = [((nodes[((m >> b) & 1).astype(bool)] << 3) | b)
                 for b in range(8)]
        nodes = np.sort(np.concatenate(parts))
    return nodes


def anchor_encode(points, resolution, scale=1.0):
    """Quantize + octree-code geometry; returns the bitstream bytes.

    :param points: [N, ≥3] integer voxel coordinates.
    :param scale: positionQuantizationScale (≤ 1); rate control.
    """
    q = np.unique(np.round(np.asarray(points)[:, :3] * scale), axis=0)
    q = q[np.all(q >= 0, axis=1)].astype(np.int64)
    max_c = int(q.max()) if len(q) else 0
    bits = max(int(np.ceil(np.log2(max_c + 1))), 1)
    masks = octree_mask_stream(_interleave(q, bits), bits)
    payload = gzip.compress(masks.tobytes(), 9)
    header = _MAGIC + struct.pack("<HdB", resolution, scale, bits)
    return header + payload


def anchor_decode(data):
    """Bitstream → [N, 3] float64 reconstructed coordinates."""
    assert data[:4] == _MAGIC, "not a builtin-anchor bitstream"
    resolution, scale, bits = struct.unpack("<HdB", data[4:4 + 11])
    masks = np.frombuffer(gzip.decompress(data[4 + 11:]), np.uint8)
    q = _deinterleave(octree_mask_decode(masks, bits), bits)
    return np.round(q / scale).astype(np.float64), resolution


def write_tmc3_style_log(path, in_path, n_points, n_bytes):
    """Emit an encoder log in tmc3's format so ``parse_bin_log`` (and any
    downstream tooling written against real tmc3 logs) consumes builtin
    anchor runs unchanged."""
    bpp = n_bytes * 8 / max(n_points, 1)
    with open(path, "w") as f:
        f.write(
            f'uncompressedDataPath  : "{in_path}"\n'
            "Slice number: 1\n"
            f"positions bitstream size {n_bytes} B ({bpp:.6g} bpp)\n"
            "colors bitstream size 0 B (0 bpp)\n"
            f"Total bitstream size {n_bytes} B\n"
        )
