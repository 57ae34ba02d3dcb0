"""
Minimal in-memory obspy stand-in for exercising the import-gated
acquisition paths offline (``inputf.load_obspy_traces``,
``apps.beatdown.get_events`` / ``download_waveforms``).

Implements exactly the API surface those functions call, with real
module objects so ``from obspy.clients.fdsn import Client`` resolves
through ``sys.modules``.  Waveform "files" are npz archives with keys
``station, channel, starttime, delta, data``; "StationXML" inventories
are json ``{trace_id: {longitude, latitude, gain}}``.

The FDSN pieces are driven by two module-level scenario hooks the test
seeds: ``CATALOG`` (list of event dicts for ``Client.get_events``) and
``DOWNLOAD_STATIONS`` (station specs ``MassDownloader.download`` writes
as fake waveforms + inventory).  ``LAST_DOWNLOAD`` captures the domain /
restrictions the code under test passed in.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import sys
import types

import numpy as np

# ---------------------------------------------------------------------------
# core objects
# ---------------------------------------------------------------------------


class UTCDateTime:
    def __init__(self, value):
        if isinstance(value, UTCDateTime):
            self._ts = value._ts
        elif isinstance(value, str):
            self._ts = _dt.datetime.fromisoformat(
                value.replace("Z", "+00:00")).timestamp()
        else:
            self._ts = float(value)

    @property
    def timestamp(self) -> float:
        return self._ts

    def __add__(self, other):
        return UTCDateTime(self._ts + float(other))

    def __sub__(self, other):
        if isinstance(other, UTCDateTime):
            return self._ts - other._ts
        return UTCDateTime(self._ts - float(other))

    def __repr__(self):
        return f"UTCDateTime({self._ts})"


class _Stats:
    def __init__(self, station, channel, starttime, delta, network="XX"):
        self.network = network
        self.station = station
        self.channel = channel
        self.starttime = UTCDateTime(starttime)
        self.delta = float(delta)


class Trace:
    def __init__(self, data, station, channel, starttime, delta):
        self.data = np.asarray(data, dtype=np.float64)
        self.stats = _Stats(station, channel, starttime, delta)

    @property
    def id(self):
        s = self.stats
        return f"{s.network}.{s.station}..{s.channel}"


class Stream:
    def __init__(self, traces=None):
        self.traces = list(traces or [])
        self.response_removed = False

    def __iadd__(self, other):
        self.traces.extend(other.traces if isinstance(other, Stream)
                           else list(other))
        return self

    def __iter__(self):
        return iter(self.traces)

    def __len__(self):
        return len(self.traces)

    def merge(self, method=1, fill_value=None):
        # single-segment fixtures: nothing to merge
        return self

    def remove_response(self, inventory=None, output="DISP",
                        water_level=60.0):
        if inventory is None:
            raise ValueError("inventory required")
        if output != "DISP":
            raise ValueError("fixture models displacement output only")
        for tr in self.traces:
            tr.data = tr.data / inventory.gain_of(tr.id)
        self.response_removed = True
        return self


class Inventory:
    def __init__(self, table: dict):
        self._table = table

    def gain_of(self, trace_id: str) -> float:
        return float(self._table[trace_id]["gain"])

    def get_coordinates(self, trace_id: str, time=None) -> dict:
        e = self._table[trace_id]
        return {"longitude": float(e["longitude"]),
                "latitude": float(e["latitude"])}


def read(path):
    """Parse one fake-mseed npz into a single-trace Stream; raise on
    anything else (exercises the skip-non-waveform branch)."""
    with np.load(path) as z:
        return Stream([Trace(z["data"], str(z["station"]),
                             str(z["channel"]), float(z["starttime"]),
                             float(z["delta"]))])


def read_inventory(path):
    with open(path) as f:
        return Inventory(json.load(f))


def write_waveform(path, station, channel, starttime, delta, data):
    np.savez(path, station=station, channel=channel,
             starttime=float(starttime), delta=float(delta),
             data=np.asarray(data, dtype=np.float64))


# ---------------------------------------------------------------------------
# FDSN client (catalog queries)
# ---------------------------------------------------------------------------

#: test-seeded: list of dicts time/lat/lon/depth/magnitude (epoch floats)
CATALOG: list = []


class _Origin:
    def __init__(self, ev):
        self.time = UTCDateTime(ev["time"])
        self.latitude = ev["lat"]
        self.longitude = ev["lon"]
        self.depth = ev["depth"]


class _Magnitude:
    def __init__(self, ev):
        self.mag = ev["magnitude"]


class _Event:
    def __init__(self, ev):
        self._ev = ev
        self.origins = [_Origin(ev)]
        self.magnitudes = [_Magnitude(ev)]

    def preferred_origin(self):
        return self.origins[0]

    def preferred_magnitude(self):
        return self.magnitudes[0]


#: test-seeded: sites that raise on Client construction (unreachable)
DEAD_SITES: set = set()
#: captured Client constructions: [(site, user, password)]
CLIENTS_MADE: list = []


class Client:
    def __init__(self, catalog="IRIS", user=None, password=None):
        if catalog in DEAD_SITES:
            raise ConnectionError(f"fake site {catalog} is down")
        self.catalog = catalog
        self.user, self.password = user, password
        self.eida_token = None
        CLIENTS_MADE.append((catalog, user, password))

    def set_eida_token(self, token):
        self.eida_token = token

    def get_events(self, starttime=None, endtime=None, minmagnitude=0.0):
        out = []
        for ev in CATALOG:
            if ev.get("site") not in (None, self.catalog):
                continue
            if starttime is not None and ev["time"] < starttime.timestamp:
                continue
            if endtime is not None and ev["time"] > endtime.timestamp:
                continue
            if ev["magnitude"] < minmagnitude:
                continue
            out.append(_Event(ev))
        return out


# ---------------------------------------------------------------------------
# mass downloader
# ---------------------------------------------------------------------------

#: test-seeded: station specs the fake downloader "downloads"
#: [{station, channel prefix ignored, east offset → lon, ...}]
DOWNLOAD_STATIONS: list = []
#: captured (domain, restrictions) of the last download() call
LAST_DOWNLOAD: dict = {}


class CircularDomain:
    def __init__(self, latitude, longitude, minradius, maxradius):
        self.latitude, self.longitude = latitude, longitude
        self.minradius, self.maxradius = minradius, maxradius


class Restrictions:
    def __init__(self, starttime, endtime, **kw):
        self.starttime, self.endtime = starttime, endtime
        self.__dict__.update(kw)


class MassDownloader:
    def __init__(self, providers=None):
        self.providers = providers

    def download(self, domain, restrictions, mseed_storage,
                 stationxml_storage):
        LAST_DOWNLOAD.clear()
        LAST_DOWNLOAD.update(domain=domain, restrictions=restrictions,
                             providers=self.providers)
        os.makedirs(mseed_storage, exist_ok=True)
        os.makedirs(stationxml_storage, exist_ok=True)
        inv = {}
        t0 = restrictions.starttime.timestamp
        for spec in DOWNLOAD_STATIONS:
            dt = spec.get("delta", 0.5)
            n = int((restrictions.endtime.timestamp - t0) / dt)
            rng = np.random.default_rng(abs(hash(spec["station"])) % 2**31)
            for chan in spec.get("channels", ("BHZ", "BHN", "BHE")):
                data = rng.normal(0.0, spec.get("noise", 1e-9), n)
                i_on = int(spec.get("onset_after", 700.0) / dt)
                data[i_on:i_on + 40] += spec.get("amp", 1e-6)
                data *= spec.get("gain", 1.0)
                write_waveform(
                    os.path.join(mseed_storage,
                                 f'{spec["station"]}.{chan}.npz'),
                    spec["station"], chan, t0, dt, data)
                inv[f'XX.{spec["station"]}..{chan}'] = {
                    "longitude": spec.get("lon", 0.0),
                    "latitude": spec.get("lat", 0.0),
                    "gain": spec.get("gain", 1.0)}
        with open(os.path.join(stationxml_storage, "inventory.json"),
                  "w") as f:
            json.dump(inv, f)


# ---------------------------------------------------------------------------
# module wiring: build real module objects for sys.modules injection
# ---------------------------------------------------------------------------


def build_modules():
    """Return {dotted_name: module} ready for sys.modules injection."""
    this = sys.modules[__name__]
    obspy = types.ModuleType("obspy")
    for name in ("UTCDateTime", "Trace", "Stream", "Inventory",
                 "read", "read_inventory"):
        setattr(obspy, name, getattr(this, name))

    clients = types.ModuleType("obspy.clients")
    fdsn = types.ModuleType("obspy.clients.fdsn")
    fdsn.Client = Client
    md = types.ModuleType("obspy.clients.fdsn.mass_downloader")
    md.CircularDomain = CircularDomain
    md.MassDownloader = MassDownloader
    md.Restrictions = Restrictions
    fdsn.mass_downloader = md
    clients.fdsn = fdsn
    obspy.clients = clients
    return {"obspy": obspy, "obspy.clients": clients,
            "obspy.clients.fdsn": fdsn,
            "obspy.clients.fdsn.mass_downloader": md}
