"""Posterior marginal plots (reference ``beat/plotting/marginals.py``)."""

from __future__ import annotations

import numpy as np

from beat_tpu.plotting.common import PlotOptions, histplot_op, save_figure


def plot_stage_posteriors(problem, po: PlotOptions | None = None, stages=None):
    """One marginal histogram panel per variable, optionally overlaying
    several SMC stages (reference ``stage_posteriors``)."""
    import matplotlib.pyplot as plt

    from beat_tpu.backend import SampleStage

    po = po or PlotOptions()
    handler = SampleStage(problem.outfolder, ordering=problem.ordering)
    stages = stages or [po.load_stage]

    specs = [(spec, k) for spec in problem.ordering.vmap
             for k in range(max(1, int(np.prod(spec.shape, dtype=int))))]
    n = len(specs)
    ncols = min(4, n)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(3.2 * ncols, 2.4 * nrows),
                             squeeze=False)
    colors = plt.cm.viridis(np.linspace(0.2, 0.9, len(stages)))
    for si, stage in enumerate(stages):
        trace = handler.load_trace(stage)
        flat = trace.q_trace.reshape(-1, trace.q_trace.shape[-1])
        for i, (spec, k) in enumerate(specs):
            ax = axes[i // ncols][i % ncols]
            samples = flat[:, spec.slc][:, k]
            ref = None
            if po.reference and spec.name in po.reference:
                ref = np.atleast_1d(po.reference[spec.name])[k]
            histplot_op(ax, samples, reference=ref, color=colors[si])
            name = spec.name if spec.shape == () else f"{spec.name}[{k}]"
            ax.set_title(name, fontsize=9)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    return save_figure(fig, problem.outfolder, "stage_posteriors", po)


def plot_correlation_hist(problem, po: PlotOptions | None = None, varnames=None,
                          max_vars: int = 8):
    """Corner plot: marginals on the diagonal, 2-d density off-diagonal
    (reference ``correlation_hist``)."""
    import matplotlib.pyplot as plt

    from beat_tpu.backend import SampleStage

    po = po or PlotOptions()
    handler = SampleStage(problem.outfolder, ordering=problem.ordering)
    trace = handler.load_trace(po.load_stage)
    flat = trace.q_trace.reshape(-1, trace.q_trace.shape[-1])

    specs = []
    for spec in problem.ordering.vmap:
        if varnames and spec.name not in varnames:
            continue
        for k in range(max(1, int(np.prod(spec.shape, dtype=int)))):
            specs.append((spec, k))
    specs = specs[:max_vars]
    n = len(specs)
    fig, axes = plt.subplots(n, n, figsize=(2.2 * n, 2.2 * n), squeeze=False)
    for i, (si, ki) in enumerate(specs):
        xi = flat[:, si.slc][:, ki]
        for j, (sj, kj) in enumerate(specs):
            ax = axes[i][j]
            if i == j:
                histplot_op(ax, xi)
            elif j < i:
                xj = flat[:, sj.slc][:, kj]
                ax.hist2d(xj, xi, bins=30, cmap="Blues")
            else:
                ax.axis("off")
            if i == n - 1:
                name = sj.name if sj.shape == () else f"{sj.name}[{kj}]"
                ax.set_xlabel(name, fontsize=8)
            if j == 0:
                name = si.name if si.shape == () else f"{si.name}[{ki}]"
                ax.set_ylabel(name, fontsize=8)
    fig.tight_layout()
    return save_figure(fig, problem.outfolder, "correlation_hist", po)
