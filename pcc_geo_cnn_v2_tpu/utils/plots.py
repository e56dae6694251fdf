"""Shared matplotlib styling for RD figures and paper artifacts.

Covers the reference's ``src/utils/matplotlib_utils.py`` (rcParams presets,
marker/linestyle cycles, standalone shared legends, ``:32-55``) and
``src/utils/colorbar.py`` (colorbar + cmap factory, ``:6-22``) with a
figure-style contract the rest of the CLI layer shares.
"""

from __future__ import annotations

import itertools
import logging

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "set_paper_style",
    "style_cycle",
    "style_for",
    "render_standalone_legend",
    "make_colorbar",
]

MARKERS = "osv^D<>ph*"
LINESTYLES = ["-", "--", "-.", ":"]


def set_paper_style(latex=False, font_size=9):
    """Apply the shared rcParams preset (serif fonts, tight grids).

    ``latex=True`` enables TeX text rendering like the reference's paper
    figures; keep it off unless a TeX toolchain is installed.
    """
    import matplotlib

    matplotlib.rcParams.update({
        "font.family": "serif",
        "font.size": font_size,
        "axes.grid": True,
        "grid.alpha": 0.4,
        "legend.framealpha": 0.8,
        "figure.dpi": 150,
        "savefig.bbox": "tight",
        "text.usetex": bool(latex),
    })


def style_cycle():
    """Infinite (marker, linestyle) pairs; stable order across figures so a
    mode keeps its marker in every plot of a comparison sweep."""
    return itertools.cycle(
        [(m, ls) for ls in LINESTYLES for m in MARKERS]
    )


def style_for(mode, style_order=None):
    """(marker, linestyle) for ``mode``, keyed by its position in
    ``style_order`` (the sweep's GLOBAL sorted mode list) so a mode keeps
    its style in every figure even when some figures miss some modes."""
    table = [(m, ls) for ls in LINESTYLES for m in MARKERS]
    if style_order and mode in style_order:
        return table[list(style_order).index(mode) % len(table)]
    return table[hash(mode) % len(table)]


def render_standalone_legend(labels, out_path, ncol=None, figsize=None):
    """Write a legend-only figure shared by a grid of RD plots.

    Mirrors the reference's shared-legend rendering
    (``matplotlib_utils.py:32-55``, used by ``ev_run_compare.py:76-102``):
    one horizontal strip with each mode's marker+linestyle, cropped to the
    legend's bbox.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = list(labels)
    ncol = ncol or min(len(labels), 5)
    fig = plt.figure(figsize=figsize or (max(2, 1.6 * ncol), 0.6))
    ax = fig.add_subplot(111)
    handles = []
    for label in labels:
        marker, ls = style_for(label, labels)
        (h,) = ax.plot([], [], marker=marker, linestyle=ls, label=label,
                       markersize=4)
        handles.append(h)
    ax.axis("off")
    legend = ax.legend(handles, labels, loc="center", ncol=ncol,
                       frameon=False, fontsize=8)
    fig.canvas.draw()
    bbox = legend.get_window_extent().transformed(
        fig.dpi_scale_trans.inverted()
    )
    fig.savefig(out_path, dpi=200, bbox_inches=bbox)
    plt.close(fig)
    logger.info("wrote %s", out_path)


def make_colorbar(vmax, cmap="inferno", label="squared error",
                  figsize=(0.5, 3.2)):
    """Standalone vertical colorbar figure for error-map renders
    (reference ``colorbar.py:6-22``). Returns (fig, cmap_fn) — caller saves
    and closes; cmap_fn maps [0, vmax] errors to RGB rows."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colorbar import ColorbarBase
    from matplotlib.colors import Normalize

    fig, ax = plt.subplots(figsize=figsize)
    norm = Normalize(vmin=0.0, vmax=vmax)
    ColorbarBase(ax, cmap=plt.get_cmap(cmap), norm=norm, label=label)
    fig.tight_layout()
    cmap_fn = lambda err: plt.get_cmap(cmap)(
        norm(np.asarray(err, np.float64))
    )[..., :3]
    return fig, cmap_fn
