"""Exact squared Euclidean distance transform on voxel grids, in XLA.

The reference's threshold search and metrics run on host KD-trees
(``/root/reference/src/model_opt.py:38``, ``utils/pc_metric.py:70-81``).
For ≤64³ blocks a KD-tree is the wrong tool on TPU; instead we use the
separable min-plus decomposition of the squared EDT:

    edt(p) = min_v ||p - v||²  =  three 1-D passes of
    out[i] = min_j (g[j] + (i-j)²)

Each 1-D pass is a dense [L, L] broadcast + min-reduction — perfectly
regular VPU work, batchable over blocks and thresholds. Exact (no chamfer
approximation): distances are integers ≤ 3(L-1)², exactly representable
in float32.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["INF", "squared_edt", "minplus_1d"]

INF = 1e12


def minplus_1d(g, axis=-1):
    """out[i] = min_j g[j] + (i-j)² along ``axis``."""
    gm = jnp.moveaxis(g, axis, -1)
    L = gm.shape[-1]
    i = jnp.arange(L, dtype=gm.dtype)
    d2 = (i[:, None] - i[None, :]) ** 2  # [out, in]
    out = jnp.min(gm[..., None, :] + d2, axis=-1)
    return jnp.moveaxis(out, -1, axis)


def squared_edt(occ):
    """Squared distance to the nearest occupied voxel.

    :param occ: [..., X, Y, Z] boolean (or {0,1} float) occupancy; leading
        dims are batch. Empty grids yield INF everywhere.
    :return: float32 squared distances.
    """
    g = jnp.where(jnp.asarray(occ, bool), 0.0, INF).astype(jnp.float32)
    for ax in (-3, -2, -1):
        g = minplus_1d(g, ax)
    return g
