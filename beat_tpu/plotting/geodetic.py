"""Geodetic fit plots (reference ``beat/plotting/geodetic.py``)."""

from __future__ import annotations

import numpy as np

from beat_tpu.plotting.common import PlotOptions, save_figure


def plot_scene_fits(problem, po: PlotOptions | None = None, point=None):
    """
    Data / synthetic / residual triptych per geodetic dataset at the MAP
    (or given) point — matplotlib analogue of the reference's kite-based
    ``scene_fits``; GNSS datasets get quiver-style scatter.
    """
    import matplotlib.pyplot as plt

    from beat_tpu.backend import SampleStage

    po = po or PlotOptions()
    comp = problem.composites.get("geodetic")
    if comp is None:
        raise ValueError("Problem has no geodetic composite")

    if point is None:
        handler = SampleStage(problem.outfolder, ordering=problem.ordering)
        trace = handler.load_trace(po.load_stage)
        pop, llks = trace.end_points()
        point = problem.ordering.to_point(pop[int(np.argmax(llks))])

    synths = comp.get_synthetics(point)
    n_ds = len(comp.datasets)
    fig, axes = plt.subplots(n_ds, 3, figsize=(12, 3.4 * n_ds), squeeze=False)
    for i, ds in enumerate(comp.datasets):
        obs = ds.displacement
        syn = synths[ds.name]
        res = obs - syn
        vmax = np.abs(obs).max()
        for j, (vals, title) in enumerate(
                ((obs, "data"), (syn, "synthetic"), (res, "residual"))):
            ax = axes[i][j]
            sc = ax.scatter(ds.coords[:, 0] / 1e3, ds.coords[:, 1] / 1e3,
                            c=vals, s=14, cmap="RdBu_r", vmin=-vmax, vmax=vmax)
            ax.set_title(f"{ds.name} {title}", fontsize=9)
            ax.set_aspect("equal")
            if j == 2:
                fig.colorbar(sc, ax=ax, shrink=0.8, label="LOS disp [m]")
    fig.tight_layout()
    return save_figure(fig, problem.outfolder, "scene_fits", po)
