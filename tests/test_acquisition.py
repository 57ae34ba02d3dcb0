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


def test_gate_message_without_obspy(tmp_path):
    """Without obspy the gate raises the actionable ImportError."""
    from beat_tpu.inputf import load_obspy_traces

    if "obspy" in sys.modules:
        pytest.skip("real obspy present")
    with pytest.raises(ImportError, match="native"):
        load_obspy_traces(str(tmp_path))
