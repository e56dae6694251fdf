"""A/B harness for octree-anchor context models (encoder-side only).

Variants:
  v1: (b, nprev, 3-bit side-neighbour, sib-bucket)          1536 ctx
  v2: (b, nprev, 6-bit neighbour pattern, sib-bucket)      36864 ctx
  v3: v2 + per-axis adjacent-child ternary (no sib)       110592 ctx
  v4: (b, nprev, 6-bit pattern, adj ternary, sib)         331776 ctx
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from pcc_geo_cnn_v2_tpu.coding.binary_coder import abc_encode
from pcc_geo_cnn_v2_tpu.coding.octree_anchor import (
    _deinterleave,
    _interleave,
    _neighbour_occ,
    _sib_bucket,
)


def _nbr_index(nodes, level):
    """Index of the +x/+y/+z neighbour node (or -1) per node."""
    out = np.full((len(nodes), 3), -1, np.int64)
    if level == 0:
        return out
    coords = _deinterleave(nodes, level)
    lim = np.int64(1) << level
    for ax in range(3):
        nc = coords.copy()
        nc[:, ax] += 1
        valid = nc[:, ax] < lim
        ncodes = _interleave(nc[valid], level)
        idx = np.searchsorted(nodes, ncodes)
        idx_c = np.minimum(idx, len(nodes) - 1)
        hit = nodes[idx_c] == ncodes
        rows = np.nonzero(valid)[0]
        out[rows[hit], ax] = idx_c[hit]
    return out


def encode_variant(codes, bits, variant):
    codes = np.unique(codes)
    all_bits, all_ctx = [], []
    prev_masks = prev_nodes = None
    for level in range(bits):
        shift = 3 * (bits - level - 1)
        pc = np.unique(codes >> shift)
        nodes, inv = np.unique(pc >> 3, return_inverse=True)
        masks = np.zeros(len(nodes), np.uint8)
        np.bitwise_or.at(masks, inv, (1 << (pc & 7)).astype(np.uint8))
        nocc = _neighbour_occ(nodes, level)
        sib = _sib_bucket(nodes, prev_masks, prev_nodes).astype(np.int32)
        n6 = (nocc * (1 << np.arange(6, dtype=np.uint8))).sum(1).astype(np.int32)
        nbr = _nbr_index(nodes, level) if variant in ("v3", "v4") else None
        n_prev = np.zeros(len(nodes), np.uint8)
        partial = np.zeros(len(nodes), np.uint8)
        for b in range(8):
            bitvec = ((masks >> b) & 1).astype(np.uint8)
            side = (nocc[:, 0 if (b >> 2) & 1 else 1]
                    | (nocc[:, 2 if (b >> 1) & 1 else 3] << 1)
                    | (nocc[:, 4 if b & 1 else 5] << 2)).astype(np.int32)
            base = np.int32(b) * 8 + n_prev.astype(np.int32)
            if variant == "v1":
                ctx = (base * 8 + side) * 3 + sib
            elif variant == "v2":
                ctx = (base * 64 + n6) * 3 + sib
            else:
                adj = np.zeros(len(nodes), np.int32)
                for ax, bitmask in enumerate((4, 2, 1)):
                    if b & bitmask:
                        nb = nbr[:, ax]
                        bb = b & ~bitmask
                        val = np.ones(len(nodes), np.int32)
                        known = nb >= 0
                        val[known] += ((partial[nb[known]] >> bb) & 1)
                    else:
                        val = np.zeros(len(nodes), np.int32)
                    adj = adj * 3 + val
                ctx = (base * 64 + n6) * 27 + adj
                if variant == "v4":
                    ctx = ctx * 3 + sib
            all_bits.append(bitvec)
            all_ctx.append(ctx)
            n_prev = n_prev + bitvec
            partial = partial | (bitvec << b).astype(np.uint8)
        prev_masks, prev_nodes = masks, nodes
    nctx = {"v1": 1536, "v2": 36864, "v3": 110592, "v4": 331776}[variant]
    return abc_encode(np.concatenate(all_bits), np.concatenate(all_ctx),
                      nctx)


def main():
    from pcc_geo_cnn_v2_tpu.utils.scansim import figure_cloud

    clouds = {}
    for seed in (200, 202):
        clouds[f"fig{seed}"] = figure_cloud(seed, 1024,
                                            with_normals=False)[:, :3]
    rng = np.random.default_rng(2)
    v = rng.normal(size=(20000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    clouds["sphere8bit"] = np.unique(
        np.clip(np.round(v * 85 + 128), 0, 255), axis=0)

    for name, pts in clouds.items():
        q = np.unique(pts.astype(np.int64), axis=0)
        bits = max(int(np.ceil(np.log2(q.max() + 1))), 1)
        codes = _interleave(q, bits)
        line = [f"{name} ({len(q)} pts)"]
        for variant in ("v1", "v2", "v3", "v4"):
            t0 = time.time()
            data = encode_variant(codes, bits, variant)
            line.append(f"{variant}: {len(data) * 8 / len(q):.3f} bpp "
                        f"({time.time() - t0:.1f}s)")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
