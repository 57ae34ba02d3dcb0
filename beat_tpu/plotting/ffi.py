"""FFI plots: slip distribution and moment rate
(reference ``beat/plotting/ffi.py``)."""

from __future__ import annotations

import numpy as np

from beat_tpu.plotting.common import PlotOptions, format_axes, save_figure


def plot_slip_distribution(problem, po: PlotOptions | None = None, point=None,
                           fault=None):
    """
    Posterior-mean slip on the fault plane grid with rupture-onset
    contours when kinematic variables are present
    (reference ``slip_distribution``).
    """
    import matplotlib.pyplot as plt

    from beat_tpu.backend import SampleStage

    po = po or PlotOptions()
    if fault is None:
        for comp in problem.composites.values():
            if hasattr(comp, "fault"):
                fault = comp.fault
                break
    if fault is None:
        raise ValueError("No fault geometry in problem composites")

    handler = SampleStage(problem.outfolder, ordering=problem.ordering)
    trace = handler.load_trace(po.load_stage)
    flat = trace.q_trace.reshape(-1, trace.q_trace.shape[-1])
    mean_point = problem.ordering.to_point(flat.mean(axis=0))
    if point is not None:
        mean_point.update(point)

    uparr = np.asarray(mean_point.get("uparr", np.zeros(fault.npatches)))
    uperp = np.asarray(mean_point.get("uperp", np.zeros(fault.npatches)))
    slip = np.sqrt(uparr**2 + uperp**2)

    n_sf = fault.nsubfaults
    fig, axes = plt.subplots(n_sf, 1, figsize=(8, 4 * n_sf), squeeze=False)
    from beat_tpu.plotting.colormap import slip_colormap

    for i in range(n_sf):
        sf = fault.get_subfault(i)
        slc = fault.ordering.slices[i]
        ax = axes[i][0]
        if not hasattr(sf, "n_strike"):
            # irregular (resolution-discretized) subfault: per-patch
            # rectangles in fault-plane coordinates
            from matplotlib.collections import PatchCollection
            from matplotlib.patches import Rectangle

            centers = sf.patch_centers_local() / 1e3
            rects = [Rectangle((c[0] - p.length / 2e3, c[1] - p.width / 2e3),
                               p.length / 1e3, p.width / 1e3)
                     for c, p in zip(centers, sf.patches)]
            pc = PatchCollection(rects, cmap=slip_colormap(),
                                 edgecolor="k", linewidth=0.3)
            pc.set_array(slip[slc])
            im = ax.add_collection(pc)
            ax.set_xlim(0, sf.plane.length / 1e3)
            ax.set_ylim(sf.plane.width / 1e3, 0)
        else:
            grid = slip[slc].reshape(sf.n_dip, sf.n_strike)
            im = ax.imshow(grid, cmap=slip_colormap(), aspect="auto",
                           extent=[0, sf.plane.length / 1e3,
                                   sf.plane.width / 1e3, 0])
            # slip-direction arrows (along-strike uparr, up-dip uperp —
            # the reference draws per-patch slip vectors)
            if np.any(uperp[slc]) and np.any(uparr[slc]):
                s = (np.arange(sf.n_strike) + 0.5) * sf.patch_length / 1e3
                d = (np.arange(sf.n_dip) + 0.5) * sf.patch_width / 1e3
                ss, dd = np.meshgrid(s, d)
                ax.quiver(ss, dd, uparr[slc].reshape(sf.n_dip, sf.n_strike),
                          -uperp[slc].reshape(sf.n_dip, sf.n_strike),
                          color="w", width=0.003, scale_units="width",
                          scale=max(np.abs(slip[slc]).max() * 25, 1e-9))
        fig.colorbar(im, ax=ax, label="slip [m]")
        # rupture-onset contours if kinematic variables sampled
        # (kinematic mode uses regular grids)
        if "velocities" in mean_point and "nucleation_strike" in mean_point \
                and hasattr(sf, "n_strike"):
            import jax.numpy as jnp

            times = np.asarray(fault.point2starttimes(
                i, jnp.asarray(mean_point["velocities"][slc]),
                float(np.atleast_1d(mean_point["nucleation_strike"])[i]),
                float(np.atleast_1d(mean_point["nucleation_dip"])[i]),
            )).reshape(sf.n_dip, sf.n_strike)
            s = (np.arange(sf.n_strike) + 0.5) * sf.patch_length / 1e3
            d = (np.arange(sf.n_dip) + 0.5) * sf.patch_width / 1e3
            cs = ax.contour(s, d, times, colors="k", linewidths=0.7)
            ax.clabel(cs, fontsize=6, fmt="%.1f s")
        ax.set_xlabel("along strike [km]")
        ax.set_ylabel("down dip [km]")
    fig.tight_layout()
    return save_figure(fig, problem.outfolder, "slip_distribution", po)


def plot_moment_rate(problem, po: PlotOptions | None = None, fault=None,
                     shear_modulus=33e9, n_samples: int = 100):
    """
    Posterior ensemble of moment-rate functions from slip + durations +
    rupture onsets (reference ``moment_rate``).
    """
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from beat_tpu.backend import SampleStage
    from beat_tpu.sources import half_sinusoid_stf

    po = po or PlotOptions()
    if fault is None:
        for comp in problem.composites.values():
            if hasattr(comp, "fault"):
                fault = comp.fault
                break
    handler = SampleStage(problem.outfolder, ordering=problem.ordering)
    trace = handler.load_trace(po.load_stage)
    flat = trace.q_trace.reshape(-1, trace.q_trace.shape[-1])
    idx = np.linspace(0, flat.shape[0] - 1, min(n_samples, flat.shape[0])).astype(int)

    t = np.linspace(0, 30, 300)
    fig, ax = plt.subplots(figsize=(7, 4))
    areas = fault.patch_areas()
    for q in flat[idx]:
        point = problem.ordering.to_point(q)
        uparr = np.asarray(np.atleast_1d(point.get("uparr", 0.0)))
        durations = np.asarray(np.atleast_1d(point.get("durations",
                                                       np.ones(fault.npatches))))
        if "velocities" in point:
            # per-subfault slices: velocities/nucleation are vector-
            # valued on multi-subfault faults (hypo_vars per subfault)
            nuc_s = np.atleast_1d(np.asarray(
                point.get("nucleation_strike", 0.0)))
            nuc_d = np.atleast_1d(np.asarray(
                point.get("nucleation_dip", 0.0)))
            parts = []
            for i in range(fault.nsubfaults):
                vel_i = fault.ordering.vector2subfault(
                    i, jnp.asarray(point["velocities"]))
                parts.append(np.asarray(fault.point2starttimes(
                    i, vel_i,
                    float(nuc_s[min(i, nuc_s.size - 1)]),
                    float(nuc_d[min(i, nuc_d.size - 1)]))))
            st = np.concatenate(parts)
        else:
            st = np.zeros(fault.npatches)
        rate = np.zeros_like(t)
        for p in range(fault.npatches):
            m0 = shear_modulus * areas[p] * abs(uparr[p]) if uparr.size > 1 \
                else shear_modulus * areas[p] * abs(float(uparr))
            rate += m0 * np.asarray(half_sinusoid_stf(
                jnp.asarray(t - st[p]), float(durations[p] if durations.size > 1 else durations)))
        ax.plot(t, rate, color="grey", alpha=0.2, lw=0.6)
    ax.set_xlabel("time after origin [s]")
    ax.set_ylabel("moment rate [Nm/s]")
    format_axes(ax)
    return save_figure(fig, problem.outfolder, "moment_rate", po)
