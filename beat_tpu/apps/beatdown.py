"""
``beat-tpu-down`` — waveform data acquisition and preparation.

Re-design of the reference ``beatdown`` app (``beat/apps/beatdown.py``):
FDSN event/waveform mass download, station weeding, restitution to
displacement, rotation to RTZ, and persistence into the project's native
seismic dataset format.

Network access and obspy/pyrocko are environment-dependent, so every
stage is import-gated; the local-file preparation path
(:func:`prepare_local_traces`) is always available and is what the
hermetic pipeline uses.
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

logger = logging.getLogger("beat_tpu.beatdown")


def get_events(time_range, magmin=5.5, catalog="GCMT"):
    """Query an event catalog (reference ``beatdown.get_events`` :80;
    requires pyrocko's catalog clients)."""
    try:
        from pyrocko.client import catalog as pcatalog
    except ImportError as e:
        raise ImportError("pyrocko is required for catalog queries") from e
    cat = pcatalog.GlobalCMT() if catalog == "GCMT" else pcatalog.Geofon()
    return cat.get_events(time_range=time_range, magmin=magmin)


def download_waveforms(event, project_dir, radius_deg=(3.0, 90.0),
                       channels=("BHZ", "BHN", "BHE"), padding=600.0):
    """FDSN mass download around an event (reference ``beatdown.main``
    :248; requires obspy's mass downloader or pyrocko fdsn)."""
    try:
        from obspy.clients.fdsn.mass_downloader import (  # noqa: F401
            CircularDomain, MassDownloader, Restrictions)
    except ImportError as e:
        raise ImportError(
            "obspy is required for FDSN downloads; in offline environments "
            "use prepare_local_traces on existing files") from e
    raise NotImplementedError(
        "Network download is disabled in this environment; use "
        "prepare_local_traces with locally available data")


def rotate_to_rtz(north, east, back_azimuth_rad):
    """NE -> RT rotation (R away from event; reference restitution+
    rotation pipeline)."""
    ba = back_azimuth_rad
    r = -north * np.cos(ba) - east * np.sin(ba)
    t = north * np.sin(ba) - east * np.cos(ba)
    return r, t


def prepare_local_traces(traces, stations, event, table, project_dir,
                         datadir="./"):
    """
    Prepare locally available traces into the native seismic format:
    resample to the GF-table grid, rotate horizontals to (R, T), align the
    time axis to ``table.t0`` after origin, persist via
    :func:`beat_tpu.inputf.save_seismic_datasets`.

    traces : dict station -> {channel: (tmin_epoch, dt, ydata)}
    stations : dict station -> (east, north) local coordinates [m]
    event : dict with 'time' epoch [s]
    """
    from beat_tpu.heart.seismic import SeismicDataset
    from beat_tpu.inputf import save_seismic_datasets

    datasets = []
    for station, chans in traces.items():
        e, n = stations[station]
        back_az = np.arctan2(-e, -n)  # station -> event azimuth
        comps = {}
        for channel, (tmin, dt, ydata) in chans.items():
            grid = _to_table_grid(ydata, tmin, dt, event["time"], table)
            comps[channel[-1].upper()] = grid
        if "N" in comps and "E" in comps:
            r, t = rotate_to_rtz(comps.pop("N"), comps.pop("E"), back_az)
            comps["R"], comps["T"] = r, t
        for channel, ydata in comps.items():
            datasets.append(SeismicDataset(station=station, channel=channel,
                                           east=e, north=n, ydata=ydata))
    path = save_seismic_datasets(datasets, project_dir, datadir)
    logger.info("Prepared %i traces -> %s", len(datasets), path)
    return datasets


def _to_table_grid(ydata, tmin, dt, event_time, table):
    """Resample/align one trace onto the GF table time grid."""
    t_src = tmin - event_time + np.arange(len(ydata)) * dt
    t_dst = table.t0 + np.arange(table.nt) * table.dt
    return np.interp(t_dst, t_src, ydata, left=0.0, right=0.0)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="beat-tpu-down",
        description="waveform download & preparation (FDSN access gated)")
    parser.add_argument("project_dir")
    parser.add_argument("--magmin", type=float, default=5.5)
    args = parser.parse_args(argv)
    try:
        download_waveforms(None, args.project_dir)
    except (ImportError, NotImplementedError) as e:
        print(f"beat-tpu-down: {e}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
