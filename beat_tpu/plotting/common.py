"""Shared plotting utilities (reference ``beat/plotting/common.py``)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


@dataclass
class PlotOptions:
    """Reference ``PlotOptions``: output format/dpi, stage selection,
    point of reference."""

    outformat: str = "png"
    dpi: int = 150
    load_stage: int = -1
    force: bool = False
    reference: dict | None = None


def figures_dir(outfolder: str) -> str:
    d = os.path.join(outfolder, "figures")
    os.makedirs(d, exist_ok=True)
    return d


def save_figure(fig, outfolder: str, name: str, po: PlotOptions | None = None) -> str:
    po = po or PlotOptions()
    path = os.path.join(figures_dir(outfolder), f"{name}.{po.outformat}")
    fig.savefig(path, dpi=po.dpi, bbox_inches="tight")
    plt.close(fig)
    return path


def format_axes(ax):
    ax.spines["top"].set_visible(False)
    ax.spines["right"].set_visible(False)


def histplot_op(ax, samples, reference=None, color="#2c7fb8", bins=40):
    """Marginal histogram with optional reference line
    (reference ``plotting/common.py`` histplot_op)."""
    ax.hist(samples, bins=bins, color=color, alpha=0.8, density=True)
    if reference is not None:
        ax.axvline(reference, color="crimson", lw=1.5)
    format_axes(ax)
