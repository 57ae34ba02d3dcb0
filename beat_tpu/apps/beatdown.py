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


def get_events(time_range, magmin=5.5, catalog="IRIS"):
    """Query an FDSN event catalog (reference ``beatdown.get_events``
    :80, there via pyrocko GCMT; here via obspy FDSN — gated).

    time_range : (start, end) UTC strings or epoch floats.
    Returns a list of dicts with time/lat/lon/depth/magnitude.
    """
    try:
        from obspy import UTCDateTime
        from obspy.clients.fdsn import Client
    except ImportError as e:
        raise ImportError("obspy is required for catalog queries") from e
    client = Client(catalog)
    cat = client.get_events(starttime=UTCDateTime(time_range[0]),
                            endtime=UTCDateTime(time_range[1]),
                            minmagnitude=magmin)
    out = []
    for ev in cat:
        o = ev.preferred_origin() or ev.origins[0]
        m = ev.preferred_magnitude() or ev.magnitudes[0]
        out.append({"time": float(o.time.timestamp), "lat": o.latitude,
                    "lon": o.longitude, "depth": o.depth,
                    "magnitude": m.mag})
    return out


def download_waveforms(event, project_dir, radius_deg=(3.0, 90.0),
                       channels="BH[ZNE]", padding=600.0,
                       duration=3600.0, datadir="raw"):
    """
    FDSN mass download around an event (reference ``beatdown.main``
    ``apps/beatdown.py:248-1227``; gated on obspy + network egress):
    circular station domain, one chunked request per provider, StationXML
    inventories next to the waveforms.  Afterwards run
    :func:`beat_tpu.inputf.load_obspy_traces` + :func:`prepare_local_traces`.

    event : dict with time [epoch s], lat, lon (e.g. from
        :func:`get_events`).
    """
    try:
        from obspy import UTCDateTime
        from obspy.clients.fdsn.mass_downloader import (
            CircularDomain, MassDownloader, Restrictions)
    except ImportError as e:
        raise ImportError(
            "obspy is required for FDSN downloads; in offline environments "
            "use prepare_local_traces on existing files") from e
    import os

    t0 = UTCDateTime(event["time"])
    domain = CircularDomain(latitude=event["lat"], longitude=event["lon"],
                            minradius=radius_deg[0], maxradius=radius_deg[1])
    restrictions = Restrictions(
        starttime=t0 - padding, endtime=t0 + duration + padding,
        chunklength_in_sec=duration + 2 * padding,
        channel_priorities=[channels], reject_channels_with_gaps=True,
        minimum_length=0.9, minimum_interstation_distance_in_m=1e3)
    wf_dir = os.path.join(project_dir, datadir, "waveforms")
    inv_dir = os.path.join(project_dir, datadir, "stations")
    mdl = MassDownloader()
    mdl.download(domain, restrictions, mseed_storage=wf_dir,
                 stationxml_storage=inv_dir)
    logger.info("Downloaded waveforms -> %s, inventories -> %s",
                wf_dir, inv_dir)
    return wf_dir, inv_dir


def bandpass_and_decimate(ydata, dt, target_dt, lower=0.01, upper=None,
                          order=4):
    """Anti-aliased resampling onto ``target_dt`` + zero-phase band
    limiting (the reference's restitution-stage filtering/downsampling).

    Resampling first: ``resample_poly`` applies its own FIR anti-alias
    low-pass, and the IIR corners are then specified at the TARGET rate
    — a single Butterworth bandpass at the raw rate has normalized
    corners of ~1e-3 and is numerically unstable (it can pass, even
    amplify, far-out-of-band energy).  Low-pass and high-pass apply as
    separate stable sections."""
    from fractions import Fraction

    from scipy.signal import butter, resample_poly, sosfiltfilt

    frac = Fraction(dt / target_dt).limit_denominator(1000)
    out = resample_poly(np.asarray(ydata, dtype=np.float64),
                        frac.numerator, frac.denominator)
    ny = 0.5 / target_dt
    hi = min((upper if upper is not None else 0.4 / target_dt) / ny, 0.99)
    out = sosfiltfilt(butter(order, hi, btype="low", output="sos"), out)
    lo = lower / ny
    if lo > 1e-3:
        out = sosfiltfilt(butter(order, lo, btype="high", output="sos"), out)
    return out


def weed_stations(traces, stations, event_time, snr_min=2.0,
                  noise_window=60.0, blacklist=()):
    """
    Station weeding (reference ``beatdown`` quality control): drop
    blacklisted stations and those whose peak signal amplitude after the
    event is below ``snr_min`` × the pre-event RMS noise.

    traces : dict station -> {channel: (tmin_epoch, dt, ydata)}.
    Returns the filtered (traces, stations).
    """
    keep_traces, keep_stations = {}, {}
    for sta, chans in traces.items():
        if sta in set(blacklist):
            logger.info("Weeding %s: blacklisted", sta)
            continue
        ok = True
        for channel, (tmin, dt, ydata) in chans.items():
            ydata = np.asarray(ydata, dtype=np.float64)
            # noise = the noise_window immediately BEFORE the event
            # onset; signal = everything from the onset on (comparing
            # against the whole pre-event span would let early noise
            # bursts masquerade as signal)
            n_onset = int(np.clip((event_time - tmin) / dt, 0, ydata.size))
            n_noise0 = max(int(n_onset - noise_window / dt), 0)
            pre = ydata[n_noise0:max(n_onset, 1)]
            if pre.size < 2 or n_onset >= ydata.size:
                logger.info("Weeding %s.%s: no usable pre-event noise or "
                            "signal window", sta, channel)
                ok = False
                break
            noise = np.sqrt(np.mean(pre**2)) + 1e-30
            snr = np.abs(ydata[n_onset:]).max() / noise
            if snr < snr_min:
                logger.info("Weeding %s.%s: SNR %.2f < %.2f",
                            sta, channel, snr, snr_min)
                ok = False
                break
        if ok:
            keep_traces[sta] = chans
            if sta in stations:
                keep_stations[sta] = stations[sta]
    logger.info("Weeding kept %i / %i stations", len(keep_traces), len(traces))
    return keep_traces, keep_stations


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
    """Resample/align one trace onto the GF table time grid.  When
    downsampling, the trace is first anti-alias filtered + decimated
    (:func:`bandpass_and_decimate`) so energy above the table Nyquist
    does not fold into the fit band; the final alignment interpolation
    then happens near the target rate."""
    ydata = np.asarray(ydata, dtype=np.float64)
    if table.dt > 1.5 * dt:
        ydata = bandpass_and_decimate(ydata, dt, table.dt)
        dt = table.dt  # resample_poly lands on the target rate
    t_src = tmin - event_time + np.arange(len(ydata)) * dt
    t_dst = table.t0 + np.arange(table.nt) * table.dt
    return np.interp(t_dst, t_src, ydata, left=0.0, right=0.0)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="beat-tpu-down",
        description="waveform acquisition & preparation "
                    "(reference beatdown; FDSN access gated on obspy)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_dl = sub.add_parser("download", help="FDSN mass download around an event")
    p_dl.add_argument("project_dir")
    p_dl.add_argument("--time", required=True, help="event time (UTC ISO)")
    p_dl.add_argument("--lat", type=float, required=True)
    p_dl.add_argument("--lon", type=float, required=True)
    p_dl.add_argument("--radius", type=float, nargs=2, default=(3.0, 90.0))

    p_pr = sub.add_parser("prepare", help="prepare downloaded/local data "
                          "into the native seismic format")
    p_pr.add_argument("project_dir")
    p_pr.add_argument("--datadir", default="raw/waveforms")
    p_pr.add_argument("--inventory", default=None)
    p_pr.add_argument("--event-time", type=float, required=True)
    p_pr.add_argument("--snr-min", type=float, default=2.0)

    args = parser.parse_args(argv)
    try:
        if args.cmd == "download":
            download_waveforms({"time": args.time, "lat": args.lat,
                                "lon": args.lon}, args.project_dir,
                               radius_deg=tuple(args.radius))
        elif args.cmd == "prepare":
            import os

            from beat_tpu.inputf import load_obspy_traces

            # datadir is relative to the project dir the download wrote
            # into (unless given absolute)
            datadir = (args.datadir if os.path.isabs(args.datadir)
                       else os.path.join(args.project_dir, args.datadir))
            traces, stations = load_obspy_traces(datadir, args.inventory)
            traces, stations = weed_stations(traces, stations,
                                             args.event_time,
                                             snr_min=args.snr_min)
            print(f"prepared {len(traces)} stations; finish with "
                  "prepare_local_traces once the GF table exists")
    except ImportError as e:
        print(f"beat-tpu-down: {e}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
