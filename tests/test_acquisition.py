"""
Acquisition-path tests with an in-memory obspy stand-in: the
import-gated FDSN catalog/download and mseed/StationXML restitution
code (reference ``beat/apps/beatdown.py:80-247``, ``inputf.py:278-399``)
actually executes offline — asserting payload correctness, not just the
ImportError gate.
"""

import json
import os
import sys

import numpy as np
import pytest

import fake_obspy


@pytest.fixture
def obspy_env(monkeypatch):
    for name, mod in fake_obspy.build_modules().items():
        monkeypatch.setitem(sys.modules, name, mod)
    fake_obspy.CATALOG.clear()
    fake_obspy.DOWNLOAD_STATIONS.clear()
    fake_obspy.LAST_DOWNLOAD.clear()
    fake_obspy.DEAD_SITES.clear()
    fake_obspy.CLIENTS_MADE.clear()
    return fake_obspy


EVENT_TIME = 1.6e9  # epoch seconds


class TestGetEvents:
    def test_catalog_query_filters_and_maps(self, obspy_env):
        from beat_tpu.apps.beatdown import get_events

        obspy_env.CATALOG.extend([
            dict(time=EVENT_TIME, lat=42.3, lon=13.4, depth=9e3,
                 magnitude=6.3),
            dict(time=EVENT_TIME + 86400, lat=0.0, lon=0.0, depth=10e3,
                 magnitude=4.0),              # below magmin
            dict(time=EVENT_TIME - 1e6, lat=1.0, lon=1.0, depth=5e3,
                 magnitude=7.0),              # before window
        ])
        evs = get_events((EVENT_TIME - 3600, EVENT_TIME + 2 * 86400),
                         magmin=5.5)
        assert len(evs) == 1
        ev = evs[0]
        assert ev["lat"] == 42.3 and ev["magnitude"] == 6.3
        assert abs(ev["time"] - EVENT_TIME) < 1e-6


class TestDownloadWaveforms:
    def test_domain_window_and_files(self, obspy_env, tmp_path):
        from beat_tpu.apps.beatdown import download_waveforms

        obspy_env.DOWNLOAD_STATIONS.extend([
            dict(station="AAA", lon=13.0, lat=42.0, gain=2.0e9),
            dict(station="BBB", lon=14.0, lat=43.0, gain=5.0e8),
        ])
        event = dict(time=EVENT_TIME, lat=42.3, lon=13.4)
        wf_dir, inv_dir = download_waveforms(
            event, str(tmp_path), radius_deg=(2.0, 50.0),
            padding=600.0, duration=3600.0)

        dom = obspy_env.LAST_DOWNLOAD["domain"]
        assert (dom.latitude, dom.longitude) == (42.3, 13.4)
        assert (dom.minradius, dom.maxradius) == (2.0, 50.0)
        res = obspy_env.LAST_DOWNLOAD["restrictions"]
        assert abs(res.starttime.timestamp - (EVENT_TIME - 600.0)) < 1e-6
        assert abs(res.endtime.timestamp - (EVENT_TIME + 4200.0)) < 1e-6
        # 2 stations x 3 channels of waveforms + one inventory
        assert len(os.listdir(wf_dir)) == 6
        assert os.path.exists(os.path.join(inv_dir, "inventory.json"))


class TestLoadObspyTraces:
    def _write_station(self, datadir, station, gain, inv, amp=1e-6):
        rng = np.random.default_rng(abs(hash(station)) % 2**31)
        for chan in ("BHZ", "BHN", "BHE"):
            data = rng.normal(0.0, 1e-9, 2000)
            data[1400:1440] += amp
            fake_obspy.write_waveform(
                os.path.join(datadir, f"{station}.{chan}.npz"),
                station, chan, EVENT_TIME - 600.0, 0.5, data * gain)
            inv[f"XX.{station}..{chan}"] = {
                "longitude": 13.0, "latitude": 42.0, "gain": gain}

    def test_restitution_removes_gain_and_skips_junk(self, obspy_env,
                                                     tmp_path):
        from beat_tpu.inputf import load_obspy_traces

        datadir = str(tmp_path / "raw")
        os.makedirs(datadir)
        inv = {}
        self._write_station(datadir, "AAA", gain=2.0e9, inv=inv)
        self._write_station(datadir, "BBB", gain=5.0e8, inv=inv)
        with open(os.path.join(datadir, "README.txt"), "w") as f:
            f.write("not a waveform")      # must be skipped, not fatal
        inv_path = str(tmp_path / "inv.json")
        with open(inv_path, "w") as f:
            json.dump(inv, f)

        traces, stations = load_obspy_traces(datadir, inv_path)
        assert set(traces) == {"AAA", "BBB"}
        assert set(traces["AAA"]) == {"Z", "N", "E"}
        # response removed: displacement amplitudes back at the 1e-6
        # signal level regardless of the per-station gain
        for sta in ("AAA", "BBB"):
            tmin, dt, y = traces[sta]["Z"]
            assert abs(tmin - (EVENT_TIME - 600.0)) < 1e-6 and dt == 0.5
            assert 0.5e-6 < np.abs(y).max() < 2e-6
        assert stations["AAA"] == (13.0, 42.0)

    def test_channel_filter(self, obspy_env, tmp_path):
        from beat_tpu.inputf import load_obspy_traces

        datadir = str(tmp_path / "raw")
        os.makedirs(datadir)
        inv = {}
        self._write_station(datadir, "AAA", gain=1.0, inv=inv)
        traces, _ = load_obspy_traces(datadir, None, channels=("Z",))
        assert set(traces["AAA"]) == {"Z"}


class TestFullAcquisitionChain:
    def test_download_to_native_datasets(self, obspy_env, tmp_path):
        """download → restitution → weeding → table-grid preparation →
        native seismic_data.npz (the reference beatdown pipeline
        end-to-end, offline)."""
        from beat_tpu.apps.beatdown import (download_waveforms,
                                            prepare_local_traces,
                                            weed_stations)
        from beat_tpu.heart.gftable import build_homogeneous_table
        from beat_tpu.inputf import load_obspy_traces, load_seismic_datasets

        obspy_env.DOWNLOAD_STATIONS.extend([
            dict(station="AAA", lon=0.4, lat=0.2, gain=2.0e9),
            dict(station="BBB", lon=-0.3, lat=0.5, gain=5.0e8),
            dict(station="DEAD", lon=0.1, lat=-0.4, gain=1.0e9,
                 amp=0.0),                 # no signal: weeded out
        ])
        event = dict(time=EVENT_TIME, lat=0.0, lon=0.0)
        wf_dir, inv_dir = download_waveforms(event, str(tmp_path))
        traces, stations_ll = load_obspy_traces(
            wf_dir, os.path.join(inv_dir, "inventory.json"))

        # restitution happened through the inventory: both live stations
        # land at the common displacement level
        assert 0.5e-6 < np.abs(traces["AAA"]["Z"][2]).max() < 2e-6
        assert 0.5e-6 < np.abs(traces["BBB"]["Z"][2]).max() < 2e-6

        # live stations: SNR ~1000; noise-only: ~5 (Gaussian extreme
        # over the window) — threshold between them
        traces, stations_ll = weed_stations(traces, stations_ll,
                                            EVENT_TIME, snr_min=20.0)
        assert set(traces) == {"AAA", "BBB"}   # DEAD weeded

        # local ENU conversion (small angles: deg → m)
        stations = {s: (lon * 111e3, lat * 111e3)
                    for s, (lon, lat) in stations_ll.items()}
        table = build_homogeneous_table(np.array([30e3, 90e3]),
                                        np.array([5e3, 15e3]),
                                        nt=128, dt=0.5)
        datasets = prepare_local_traces(traces, stations,
                                        dict(time=EVENT_TIME), table,
                                        str(tmp_path))
        # horizontals rotated: channels are Z/R/T now
        chans = {(d.station, d.channel) for d in datasets}
        assert chans == {(s, c) for s in ("AAA", "BBB")
                         for c in ("Z", "R", "T")}
        loaded = load_seismic_datasets(str(tmp_path))
        assert len(loaded) == 6
        assert all(d.ydata.shape == (table.nt,) for d in loaded)

    def test_beatdown_cli_download_and_prepare(self, obspy_env, tmp_path):
        from beat_tpu.apps.beatdown import main

        obspy_env.DOWNLOAD_STATIONS.append(
            dict(station="AAA", lon=0.4, lat=0.2, gain=1.0))
        rc = main(["download", str(tmp_path), "--time", "2020-09-13T12:00:00",
                   "--lat", "42.3", "--lon", "13.4"])
        assert rc == 0
        assert os.path.isdir(os.path.join(str(tmp_path), "raw", "waveforms"))

        t0 = obspy_env.UTCDateTime("2020-09-13T12:00:00").timestamp
        rc = main(["prepare", str(tmp_path),
                   "--inventory", os.path.join(str(tmp_path), "raw",
                                               "stations", "inventory.json"),
                   "--event-time", str(t0)])
        assert rc == 0


class TestEventLookup:
    """Event-by-name/date resolution with catalog fallback (reference
    ``beatdown.py:120-158``)."""

    def test_alias_and_nearest(self, obspy_env):
        from beat_tpu.apps.beatdown import (EVENT_ALIASES, _to_epoch,
                                            get_events_by_name_or_date)

        t_laquila = _to_epoch(EVENT_ALIASES["2009_laquila"])
        obspy_env.CATALOG.extend([
            dict(time=t_laquila + 30.0, lat=42.3, lon=13.4, depth=9e3,
                 magnitude=6.3),                       # within ±60 s
            dict(time=t_laquila + 55.0, lat=0.0, lon=0.0, depth=1e3,
                 magnitude=5.0),                       # farther in time
        ])
        evs = get_events_by_name_or_date(["2009_laquila"])
        assert len(evs) == 1 and evs[0]["lat"] == 42.3  # nearest wins

    def test_catalog_fallback(self, obspy_env):
        from beat_tpu.apps.beatdown import get_events_by_name_or_date

        t = 1.6e9
        # primary catalog has nothing; a fallback site carries the event
        obspy_env.CATALOG.append(
            dict(time=t + 10.0, lat=1.0, lon=2.0, depth=5e3,
                 magnitude=6.0, site="USGS"))
        evs = get_events_by_name_or_date(["2020-09-13 12:26:40"],
                                         catalog="IRIS")
        assert len(evs) == 1 and evs[0]["lon"] == 2.0

        with pytest.raises(LookupError, match="no event"):
            get_events_by_name_or_date(["1999-01-01 00:00:00"])

    def test_file_catalog(self, obspy_env, tmp_path):
        from beat_tpu.apps.beatdown import get_events_by_name_or_date

        path = str(tmp_path / "events.json")
        with open(path, "w") as f:
            json.dump([dict(time=1.0, lat=5.0, lon=6.0, depth=1e3,
                            magnitude=7.0)], f)
        evs = get_events_by_name_or_date([path])
        assert evs[0]["lat"] == 5.0


class TestMultiSiteCredentials:
    """Multi-site FDSN with per-site credentials (reference
    ``beatdown.py:215-247``): dead sites are skipped, credentialed
    clients carry user/password or EIDA tokens."""

    def test_sites_and_credentials(self, obspy_env, tmp_path):
        from beat_tpu.apps.beatdown import download_waveforms

        obspy_env.DOWNLOAD_STATIONS.append(
            dict(station="AAA", lon=13.0, lat=42.0, gain=1e9))
        obspy_env.DEAD_SITES.add("ORFEUS")
        event = dict(time=EVENT_TIME, lat=42.3, lon=13.4)
        download_waveforms(
            event, str(tmp_path), sites=("IRIS", "ORFEUS", "GEOFON"),
            credentials={"GEOFON": {"user": "u", "passwd": "p"},
                         "IRIS": {"token": "tok"}})
        providers = obspy_env.LAST_DOWNLOAD["providers"]
        assert [c.catalog for c in providers] == ["IRIS", "GEOFON"]
        assert providers[0].eida_token == "tok"
        assert (providers[1].user, providers[1].password) == ("u", "p")

    def test_all_sites_dead(self, obspy_env, tmp_path):
        from beat_tpu.apps.beatdown import download_waveforms

        obspy_env.DEAD_SITES.update({"IRIS", "GEOFON"})
        with pytest.raises(RuntimeError, match="none of the FDSN sites"):
            download_waveforms(dict(time=EVENT_TIME, lat=0, lon=0),
                               str(tmp_path), sites=("IRIS", "GEOFON"))


class TestCutWindows:
    """Velocity/fixed/phase time-window selection (reference
    ``beatdown.py:163-203`` + ``cut_n_dump`` ``:100``)."""

    def _table(self):
        from beat_tpu.heart.gftable import build_homogeneous_table

        return build_homogeneous_table(
            distances=np.linspace(20e3, 200e3, 5),
            depths=np.array([8e3]), nt=256, dt=0.5)

    def test_velocity_window_zeroes_outside(self, tmp_path):
        from beat_tpu.apps.beatdown import VelocityWindow, prepare_local_traces

        table = self._table()
        n = 256
        ydata = np.ones(n)
        traces = {"STA": {"BHZ": (EVENT_TIME, 0.5, ydata)}}
        stations = {"STA": (60e3, 0.0)}
        event = dict(time=EVENT_TIME, depth=8e3)
        win = VelocityWindow(vmin=3000.0, vmax=6000.0, tpad=2.0)
        datasets = prepare_local_traces(traces, stations, event, table,
                                        str(tmp_path), cut_window=win)
        y = datasets[0].ydata
        t = table.t0 + np.arange(table.nt) * table.dt
        t_lo = (8e3 + 60e3) / 6000.0 - 2.0
        t_hi = (8e3 + 60e3) / 3000.0 + 2.0
        assert np.all(y[(t > t_lo + 1.0) & (t < t_hi - 1.0)] == 1.0)
        assert np.all(y[t < t_lo - 1.0] == 0.0)
        assert np.all(y[t > t_hi + 1.0] == 0.0)

    def test_fixed_window(self, tmp_path):
        from beat_tpu.apps.beatdown import FixedWindow, prepare_local_traces

        table = self._table()
        traces = {"STA": {"BHZ": (EVENT_TIME, 0.5, np.ones(256))}}
        stations = {"STA": (40e3, 0.0)}
        win = FixedWindow(EVENT_TIME + 10.0, EVENT_TIME + 30.0)
        datasets = prepare_local_traces(traces, stations,
                                        dict(time=EVENT_TIME), table,
                                        str(tmp_path), cut_window=win)
        y = datasets[0].ydata
        t = table.t0 + np.arange(table.nt) * table.dt
        assert np.all(y[(t > 11) & (t < 29)] == 1.0)
        assert np.all(y[t > 31] == 0.0) and np.all(y[t < 9] == 0.0)

    def test_phase_window_tracks_moveout_and_skips_no_arrival(self, tmp_path):
        from beat_tpu.apps.beatdown import (NoArrival, PhaseWindow,
                                            prepare_local_traces)
        from beat_tpu.heart.velocity_model import LayeredModel, first_arrival

        model = LayeredModel.homogeneous(vp=6000.0, vs=3464.0, rho=2700.0)
        table = self._table()
        win = PhaseWindow(model, phase="p", omin=-1.0, omax=20.0)
        t_arr = first_arrival(model, 8e3, 100e3, "p")[0]
        lo, hi = win(EVENT_TIME, 100e3, 8e3)
        assert lo == pytest.approx(EVENT_TIME + t_arr - 1.0)
        assert hi == pytest.approx(EVENT_TIME + t_arr + 20.0)

        traces = {"STA": {"BHZ": (EVENT_TIME, 0.5, np.ones(256))}}
        stations = {"STA": (100e3, 0.0)}
        datasets = prepare_local_traces(traces, stations,
                                        dict(time=EVENT_TIME, depth=8e3),
                                        table, str(tmp_path), cut_window=win)
        y = datasets[0].ydata
        t = table.t0 + np.arange(table.nt) * table.dt
        assert np.all(y[(t > t_arr + 1) & (t < t_arr + 19)] == 1.0)
        assert np.all(y[t < t_arr - 3] == 0.0)

        # a window raising NoArrival skips the station entirely
        class Never:
            def __call__(self, *a):
                raise NoArrival("nope")

        datasets = prepare_local_traces(traces, stations,
                                        dict(time=EVENT_TIME), table,
                                        str(tmp_path), cut_window=Never())
        assert datasets == []


def test_gate_message_without_obspy(tmp_path):
    """Without obspy the gate raises the actionable ImportError."""
    from beat_tpu.inputf import load_obspy_traces

    if "obspy" in sys.modules:
        pytest.skip("real obspy present")
    with pytest.raises(ImportError, match="native"):
        load_obspy_traces(str(tmp_path))
