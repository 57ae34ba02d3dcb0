"""Seismic fit plots (reference ``beat/plotting/seismic.py``)."""

from __future__ import annotations

import numpy as np

from beat_tpu.plotting.common import PlotOptions, format_axes, save_figure


def _map_point(problem, po):
    from beat_tpu.backend import SampleStage

    handler = SampleStage(problem.outfolder, ordering=problem.ordering)
    trace = handler.load_trace(po.load_stage)
    pop, llks = trace.end_points()
    return problem.ordering.to_point(pop[int(np.argmax(llks))])


def plot_waveform_fits(problem, po: PlotOptions | None = None, point=None):
    """Observed vs synthetic windows per station/channel
    (reference ``waveform_fits``)."""
    import matplotlib.pyplot as plt

    po = po or PlotOptions()
    comp = problem.composites.get("seismic")
    if comp is None:
        raise ValueError("Problem has no seismic composite")
    if point is None:
        point = _map_point(problem, po)

    synths = comp.get_synthetics(point)
    wavemaps = getattr(comp, "wavemaps", None) or [w for w, _ in comp.wavemaps_libs]
    for wmap in wavemaps:
        syn = synths[wmap.name]
        obs = wmap.data_windows
        nt = wmap.ntargets
        ncols = 2
        nrows = (nt + ncols - 1) // ncols
        fig, axes = plt.subplots(nrows, ncols, figsize=(10, 1.6 * nrows),
                                 squeeze=False)
        t = np.arange(wmap.nsamples_win) * wmap.table.dt + wmap.taper.a
        for i in range(nt):
            ax = axes[i // ncols][i % ncols]
            ax.plot(t, obs[i], "k", lw=0.8, label="data")
            ax.plot(t, syn[i], "r", lw=0.8, label="synth")
            ds = wmap.datasets[i]
            ax.text(0.02, 0.85, f"{ds.station}.{ds.channel}", fontsize=7,
                    transform=ax.transAxes)
            format_axes(ax)
            ax.set_yticks([])
        axes[0][0].legend(fontsize=7, loc="upper right")
        for j in range(nt, nrows * ncols):
            axes[j // ncols][j % ncols].axis("off")
        fig.suptitle(f"waveform fits — {wmap.name}", fontsize=10)
        fig.tight_layout()
        return save_figure(fig, problem.outfolder, f"waveform_fits_{wmap.name}", po)


def plot_station_variance_reductions(problem, po: PlotOptions | None = None, point=None):
    """Bar chart of per-station variance reductions
    (reference ``station_variance_reductions``)."""
    import matplotlib.pyplot as plt

    po = po or PlotOptions()
    comp = problem.composites.get("seismic")
    if point is None:
        point = _map_point(problem, po)
    synths = comp.get_synthetics(point)
    wavemaps = getattr(comp, "wavemaps", None) or [w for w, _ in comp.wavemaps_libs]
    fig, axes = plt.subplots(len(wavemaps), 1,
                             figsize=(8, 2.5 * len(wavemaps)), squeeze=False)
    for k, wmap in enumerate(wavemaps):
        syn = synths[wmap.name]
        obs = wmap.data_windows
        vrs = 1.0 - ((obs - syn) ** 2).sum(axis=1) / np.maximum(
            (obs**2).sum(axis=1), 1e-30)
        ax = axes[k][0]
        ax.bar(range(len(vrs)), vrs, color="#2c7fb8")
        ax.set_xticks(range(len(vrs)))
        ax.set_xticklabels([ds.station for ds in wmap.datasets],
                           rotation=60, fontsize=7)
        ax.set_ylabel("VR")
        ax.set_title(wmap.name, fontsize=9)
        format_axes(ax)
    fig.tight_layout()
    return save_figure(fig, problem.outfolder, "station_variance_reductions", po)
