"""Importer tests (native CSV/npz formats; reference ``test`` coverage of
``inputf`` is indirect — here the LOS convention and round trips are
checked explicitly)."""

import numpy as np
import pytest

from beat_tpu.inputf import (
    load_gnss_csv,
    load_sar_csv,
    load_seismic_datasets,
    save_seismic_datasets,
)


def test_sar_csv_los_convention(tmp_path):
    p = tmp_path / "scene.csv"
    p.write_text("east,north,displacement\n0,0,0.01\n1000,0,0.02\n")
    ds = load_sar_csv(str(p), incidence=30.0, heading=190.0)
    assert ds.typ == "SAR" and ds.samples == 2
    # LOS: E=-sin(inc)cos(head), N=sin(inc)sin(head), U=cos(inc)
    inc, head = np.deg2rad(30.0), np.deg2rad(190.0)
    np.testing.assert_allclose(ds.los_vector[0],
                               [-np.sin(inc) * np.cos(head),
                                np.sin(inc) * np.sin(head),
                                np.cos(inc)], atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(ds.los_vector, axis=1), 1.0)


def test_gnss_csv_components(tmp_path):
    p = tmp_path / "gnss.csv"
    p.write_text(
        "station,lat,lon,east,north,up,sigma_east,sigma_north,sigma_up\n"
        "AAAA,10.0,20.0,0.01,-0.02,0.005,0.001,0.002,0.003\n"
        "BBBB,10.1,20.1,0.03,0.01,-0.001,0.001,0.002,0.003\n")
    datasets = load_gnss_csv(str(p))
    assert [d.name for d in datasets] == ["gnss_east", "gnss_north", "gnss_up"]
    east = datasets[0]
    np.testing.assert_allclose(east.displacement, [0.01, 0.03])
    np.testing.assert_allclose(east.los_vector[0], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.diag(east.covariance.data), [1e-6, 1e-6])
    # local coordinates derivable from lat/lon
    east.update_local_coords(10.0, 20.0)
    assert east.coords[1, 1] > 1e4  # ~0.1 deg north ≈ 11 km


def test_load_geodetic_datasets_projects_against_event(tmp_path):
    """GNSS datasets re-project their station lat/lon to local coords
    relative to the event at load time; never-projected zero coords
    without an event are rejected loudly."""
    import pytest

    from beat_tpu.config import (EventConfig, GeodeticConfig,
                                 load_geodetic_datasets,
                                 save_geodetic_datasets)

    p = tmp_path / "gnss.csv"
    p.write_text(
        "station,lat,lon,east,north,up,sigma_east,sigma_north,sigma_up\n"
        "AAAA,10.0,20.0,0.01,-0.02,0.005,0.001,0.002,0.003\n"
        "BBBB,10.1,20.1,0.03,0.01,-0.001,0.001,0.002,0.003\n")
    datasets = load_gnss_csv(str(p))
    save_geodetic_datasets(datasets, str(tmp_path))

    loaded = load_geodetic_datasets(str(tmp_path), GeodeticConfig(),
                                    event=EventConfig(lat=10.0, lon=20.0))
    east = next(d for d in loaded if d.name == "gnss_east")
    assert east.coords[1, 1] > 1e4       # BBBB ~11 km north of the event
    assert np.allclose(east.coords[0], 0)  # AAAA at the event

    with pytest.raises(ValueError, match="all-zero local coordinates"):
        load_geodetic_datasets(str(tmp_path), GeodeticConfig())


def test_gnss_csv_blacklist(tmp_path):
    p = tmp_path / "gnss.csv"
    p.write_text(
        "station,lat,lon,east,north,up,sigma_east,sigma_north,sigma_up\n"
        "AAAA,10.0,20.0,0.01,-0.02,0.005,0.001,0.002,0.003\n"
        "BBBB,10.1,20.1,0.03,0.01,-0.001,0.001,0.002,0.003\n")
    datasets = load_gnss_csv(str(p), blacklist=("BBBB",))
    east = datasets[0]
    assert list(east.stations) == ["AAAA"]
    np.testing.assert_allclose(east.displacement, [0.01])
    import pytest

    with pytest.raises(ValueError, match="every station"):
        load_gnss_csv(str(p), blacklist=("AAAA", "BBBB"))


def test_seismic_round_trip(tmp_path):
    from beat_tpu.heart.seismic import SeismicDataset

    rng = np.random.default_rng(0)
    ds = [SeismicDataset(station="STA", channel="Z", east=1e3, north=-2e3,
                         ydata=rng.normal(size=64)),
          SeismicDataset(station="STB", channel="T", east=0.0, north=3e3,
                         ydata=rng.normal(size=64))]
    save_seismic_datasets(ds, str(tmp_path))
    back = load_seismic_datasets(str(tmp_path))
    assert {(d.station, d.channel) for d in back} == {("STA", "Z"), ("STB", "T")}
    a = next(d for d in back if d.station == "STA")
    np.testing.assert_allclose(a.ydata, ds[0].ydata)
    assert a.east == 1e3 and a.north == -2e3


class TestSarMatlab:
    def test_reference_mat_schema(self, tmp_path):
        """quad_<k>.mat + CovMatrix_<k>.mat with the reference's field
        names (``load_SAR_data`` beat/inputf.py:61-106)."""
        import scipy.io

        from beat_tpu.inputf import load_sar_matlab

        n = 12
        rng = np.random.default_rng(0)
        cfoc = np.column_stack([np.linspace(0, 5e3, n), np.linspace(0, 8e3, n)])
        scipy.io.savemat(tmp_path / "quad_asc.mat", {
            "cfoc": cfoc, "sqval": rng.normal(0, 0.01, n),
            "lvQT": {"inci": 34.0, "head": -166.0},
            "ODW_sub": np.ones(n)})
        scipy.io.savemat(tmp_path / "CovMatrix_asc.mat",
                         {"Cov": np.eye(n) * 1e-6})
        out = load_sar_matlab(str(tmp_path), ["asc", "missing"])
        assert len(out) == 1
        ds = out[0]
        assert ds.name == "asc" and ds.typ == "SAR"
        assert ds.coords.shape == (n, 2)
        assert ds.covariance.data.shape == (n, n)
        np.testing.assert_allclose(np.linalg.norm(ds.los_vector, axis=1), 1.0,
                                   rtol=1e-6)


class TestGlobk:
    def test_globk_parse_units_blacklist(self, tmp_path):
        from beat_tpu.inputf import load_ascii_gnss_globk

        header = "h1\nh2\nh3\n"
        # lon lat vE vN dE dN sE sN corr vU dU sU name
        rows = [
            "30.1 40.2 12.0 -3.0 0 0 1.0 1.2 0 5.0 0 2.0 AAAA",
            "31.5 41.0 -6.0  8.0 0 0 0.8 0.9 0 -2.0 0 1.5 BBBB",
            "32.2 39.5  4.0  1.0 0 0 0.5 0.6 0 1.0 0 1.0 CCCC",
        ]
        p = tmp_path / "gps.txt"
        p.write_text(header + "\n".join(rows) + "\n")
        out = load_ascii_gnss_globk(str(tmp_path), "gps.txt",
                                    blacklist=("BBBB",))
        assert len(out) == 3
        east = next(d for d in out if d.name == "gnss_east")
        assert east.displacement.size == 2  # BBBB removed
        np.testing.assert_allclose(east.displacement, [12e-3, 4e-3])
        up = next(d for d in out if d.name == "gnss_up")
        np.testing.assert_allclose(up.displacement, [5e-3, 1e-3])
        # sigma -> diagonal covariance in meters
        np.testing.assert_allclose(np.diag(east.covariance.data),
                                   [1.0e-3**2, 0.5e-3**2])
        assert list(east.stations) == ["AAAA", "CCCC"]


class TestBeatdownHelpers:
    def test_weed_stations_snr_and_blacklist(self):
        from beat_tpu.apps.beatdown import weed_stations

        rng = np.random.default_rng(1)
        dt = 0.5
        n = 400
        t0 = 1000.0
        event_time = t0 + 80.0

        def trace(amp):
            y = rng.normal(0, 1.0, n)
            y[200:260] += amp * np.hanning(60)
            return (t0, dt, y)

        traces = {"GOOD": {"Z": trace(30.0)},
                  "WEAK": {"Z": trace(0.5)},
                  "BAD": {"Z": trace(50.0)}}
        stations = {k: (0.0, 0.0) for k in traces}
        kept, kept_st = weed_stations(traces, stations, event_time,
                                      snr_min=5.0, blacklist=("BAD",))
        assert set(kept) == {"GOOD"}
        assert set(kept_st) == {"GOOD"}

    def test_bandpass_and_decimate(self):
        from beat_tpu.apps.beatdown import bandpass_and_decimate

        dt, target_dt = 0.05, 0.25
        t = np.arange(0, 120, dt)
        sig = np.sin(2 * np.pi * 0.1 * t) + 0.5 * np.sin(2 * np.pi * 8.0 * t)
        out = bandpass_and_decimate(sig, dt, target_dt, lower=0.02)
        assert abs(len(out) - len(t) * dt / target_dt) <= 2
        # the 8 Hz component (above the new Nyquist) must be gone;
        # the 0.1 Hz component survives
        tt = np.arange(len(out)) * target_dt
        corr_low = np.abs(np.dot(out, np.sin(2 * np.pi * 0.1 * tt))) / len(out)
        assert corr_low > 0.2
        assert np.abs(out).max() < 1.5  # no ringing blowup

    def test_to_table_grid_antialiases_downsampling(self):
        """Downsampling onto a coarse table grid low-passes first: energy
        above the table Nyquist must not fold into the fit band."""
        from beat_tpu.apps.beatdown import _to_table_grid

        class T:
            nt, dt, t0 = 256, 0.5, 0.0

        dt = 0.05
        t = np.arange(0, 140, dt)
        high = np.sin(2 * np.pi * 6.0 * t)   # above 1 Hz table Nyquist
        out = _to_table_grid(high, tmin=0.0, dt=dt, event_time=0.0, table=T)
        assert out.shape == (256,)
        # aliased copy would retain O(1) amplitude; the filter kills it
        assert np.abs(out[10:-10]).max() < 0.1
        low = np.sin(2 * np.pi * 0.2 * t)
        out_low = _to_table_grid(low, tmin=0.0, dt=dt, event_time=0.0,
                                 table=T)
        assert np.abs(out_low[20:200]).max() > 0.8

    def test_obspy_paths_gated(self):
        import pytest

        from beat_tpu.apps.beatdown import download_waveforms, get_events
        from beat_tpu.inputf import load_obspy_traces

        try:
            import obspy  # noqa: F401

            pytest.skip("obspy present — network paths exercised elsewhere")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="obspy"):
            get_events(("2020-01-01", "2020-02-01"))
        with pytest.raises(ImportError, match="obspy"):
            download_waveforms({"time": 0.0, "lat": 0.0, "lon": 0.0}, ".")
        with pytest.raises(ImportError, match="obspy"):
            load_obspy_traces(".")


class TestImportCLI:
    def test_import_globk_and_matlab(self, tmp_path):
        import scipy.io

        from beat_tpu.apps.cli import main
        from beat_tpu.config import (GeodeticConfig, dump_config, init_config,
                                     load_geodetic_datasets)

        proj = tmp_path / "proj"
        proj.mkdir()
        # lat/lon-bearing imports (GNSS) need the project event to project
        # station coordinates into local east/north
        cfg = init_config("p", str(proj), datatypes=("geodetic",))
        cfg.event.lat, cfg.event.lon = 40.0, 30.0  # GLOBK columns are lon lat
        dump_config(cfg, str(proj))
        # GLOBK fixture
        globk = tmp_path / "gps.txt"
        globk.write_text("h\nh\nh\n"
                         "30.1 40.2 12.0 -3.0 0 0 1.0 1.2 0 5.0 0 2.0 AAAA\n"
                         "31.5 41.0 -6.0 8.0 0 0 0.8 0.9 0 -2.0 0 1.5 BBBB\n")
        # matlab fixture
        n = 9
        rng = np.random.default_rng(2)
        scipy.io.savemat(tmp_path / "quad_asc.mat", {
            "cfoc": rng.uniform(0, 5e3, (n, 2)), "sqval": rng.normal(0, 0.01, n),
            "lvQT": {"inci": 34.0, "head": -166.0}, "ODW_sub": np.ones(n)})
        scipy.io.savemat(tmp_path / "CovMatrix_asc.mat", {"Cov": np.eye(n) * 1e-6})

        rc = main(["import", str(proj),
                   "--gnss_globk", str(globk),
                   "--sar_matlab", str(tmp_path), "--scenes", "asc",
                   "--blacklist", "BBBB"])
        assert rc == 0
        datasets = load_geodetic_datasets(str(proj), GeodeticConfig())
        names = sorted(d.name for d in datasets)
        assert names == ["asc", "gnss_east", "gnss_north", "gnss_up"]
        gnss = next(d for d in datasets if d.name == "gnss_east")
        assert gnss.displacement.size == 1  # BBBB blacklisted
        # station coords were projected relative to the event (40N, 30E):
        # AAAA at lon 30.1, lat 40.2 sits ~8.5 km east, ~22 km north
        assert np.allclose(gnss.coords[0], [8518.0, 22239.0], rtol=0.01)


NDK_FIXTURE = (
    "PDE  2005/01/01 01:20:05.4  13.78  -88.78 193.1 5.0 5.0 EL SALVADOR\n"
    "B010105A         B:  4    4  40 S: 27   33  95 M:  0    0   0 CMT: 1 TRIHD: 0.6\n"
    "CENTROID:     -0.3 0.9  13.76 0.06  -89.08 0.09 162.8 12.5 FREE S-20050322125201\n"
    "24  0.838 0.201  0.005 0.231 -0.843 0.270  1.050 0.121 -0.369 0.161  0.044 0.240\n"
    "V10   1.581 56  12  -0.537 23 140  -1.044 24 241   1.312  9 29  142 133 66  80\n"
    "PDE  2005/01/02 13:58:23.3  -5.55  151.20  38.0 6.4 6.1 NEW BRITAIN REGION, P\n"
    "C200501021358A   B: 80  141  17 S:123  240  96 M:  0    0   0 CMT: 1 TRIHD: 0.7\n"
    "CENTROID:      2.8 0.1  -5.62 0.01  151.12 0.01  41.4  0.7 FREE S-20050322130importa\n"
    "25  1.250 0.011 -0.306 0.012 -0.944 0.012  0.470 0.206  2.600 0.262 -0.867 0.009\n"
    "V10   3.197 45 136   0.288 3 232  -3.484 45 325   3.340 100 21  70 278 69  97\n"
)


class TestGCMTNDK:
    def test_read_and_select(self, tmp_path):
        from beat_tpu.inputf import read_gcmt_ndk, select_gcmt_event

        path = tmp_path / "cat.ndk"
        path.write_text(NDK_FIXTURE)
        events = read_gcmt_ndk(str(path))
        assert len(events) == 2
        ev = events[0]
        assert ev["name"] == "B010105A"
        assert ev["date"] == "2005-01-01"
        np.testing.assert_allclose(ev["lat"], 13.78)
        np.testing.assert_allclose(ev["lon"], -88.78)
        np.testing.assert_allclose(ev["depth"], 193.1e3)
        # M0 = 1.312e24 dyne-cm = 1.312e17 Nm -> Mw ~ 5.35
        np.testing.assert_allclose(ev["magnitude"], 5.34, atol=0.02)
        # unit Frobenius/sqrt(2) normalisation of the NED tensor
        m6 = ev["m6"]
        np.testing.assert_allclose(
            np.sqrt(np.sum(m6[:3] ** 2) + 2 * np.sum(m6[3:] ** 2)) / np.sqrt(2),
            1.0, rtol=1e-6)
        # USE->NED: mdd = Mrr sign carried through
        assert np.sign(m6[2]) == np.sign(0.838)
        sel = select_gcmt_event(events, name="C200501021358A")
        assert sel["date"] == "2005-01-02"
        sel2 = select_gcmt_event(events, date="2005-01-01")
        assert sel2["name"] == "B010105A"
        with pytest.raises(ValueError):
            select_gcmt_event(events, name="nonexistent")

    def test_init_from_ndk_cli(self, tmp_path):
        from beat_tpu.apps.cli import main
        from beat_tpu.config import load_config

        path = tmp_path / "cat.ndk"
        path.write_text(NDK_FIXTURE)
        pdir = str(tmp_path / "proj")
        rc = main(["init", "gcmtproj", pdir, "--datatypes", "seismic",
                   "--source_types", "MTSource",
                   "--gcmt_ndk", str(path), "--event_name", "B010105A"])
        assert rc == 0
        config = load_config(pdir)
        assert config.event.name == "B010105A"
        np.testing.assert_allclose(config.event.lat, 13.78)
        np.testing.assert_allclose(config.event.depth, 193.1e3)
        # MT prior test values seeded from the catalog mechanism
        tv = config.problem_config.priors["mdd"]["testvalue"]
        assert abs(float(tv[0])) > 0

    def test_init_from_ndk_multi_source(self, tmp_path):
        """GCMT seeding matches the prior dimension for n_sources > 1
        (a length-1 testvalue used to brick the config)."""
        from beat_tpu.apps.cli import main
        from beat_tpu.config import load_config

        path = tmp_path / "cat.ndk"
        path.write_text(NDK_FIXTURE)
        pdir = str(tmp_path / "proj2")
        rc = main(["init", "gcmt2", pdir, "--datatypes", "seismic",
                   "--source_types", "MTSource", "--n_sources", "2",
                   "--gcmt_ndk", str(path), "--event_name", "B010105A"])
        assert rc == 0
        config = load_config(pdir)  # would raise on inconsistent shapes
        tv = config.problem_config.priors["mdd"]["testvalue"]
        assert len(tv) == 2
        prior_set = config.problem_config.get_prior_set()
        assert prior_set["mdd"].testvalue.shape == (2,)


class TestPickedArrivals:
    def test_load_arrivals_csv(self, tmp_path):
        p = tmp_path / "picks.csv"
        p.write_text("station,time_s\nST00,12.5\nST01,14.25\n# comment\n")
        from beat_tpu.inputf import load_arrivals_csv

        picks = load_arrivals_csv(str(p))
        assert picks == {"ST00": 12.5, "ST01": 14.25}

    def test_overrides_shift_windows(self, tmp_path):
        """Picked arrivals override the table's predicted times and move
        the fit windows (reference arrivals_marker_path)."""
        import numpy as np

        from beat_tpu.heart.gftable import build_homogeneous_table
        from beat_tpu.heart.seismic import SeismicDataset, WaveformMapping
        from beat_tpu.heart.taper import ArrivalTaper, Filter

        table = build_homogeneous_table(
            distances=np.linspace(20e3, 100e3, 5),
            depths=np.linspace(2e3, 10e3, 3), nt=256, dt=0.25)
        datasets = [SeismicDataset(station=f"ST{i:02d}", channel="Z",
                                   east=40e3 + 10e3 * i, north=0.0,
                                   ydata=np.zeros(256)) for i in range(2)]

        def mk(overrides):
            return WaveformMapping(
                name="any_P", datasets=[SeismicDataset(
                    station=d.station, channel=d.channel, east=d.east,
                    north=d.north, ydata=d.ydata) for d in datasets],
                table=table,
                taper=ArrivalTaper(a=-2.0, b=-1.0, c=15.0, d=17.0),
                filterer=Filter(lower_corner=0.02, upper_corner=0.5, order=3),
                arrival_overrides=overrides)

        base = mk(None)
        shifted = mk({"ST00": float(base.arrival_times[0]) + 3.0})
        assert shifted.arrival_times[0] == base.arrival_times[0] + 3.0
        assert shifted.arrival_times[1] == base.arrival_times[1]
        dshift = int(round(3.0 / table.dt))
        assert shifted.window_starts[0] - base.window_starts[0] == dshift
        assert shifted.window_starts[1] == base.window_starts[1]


def test_kite_scene_los_convention():
    """Fake-Scene fixture locking the kite angle convention to the
    reference: incidence = 90 - rad2deg(leaf_thetas), heading =
    -rad2deg(leaf_phis) + 180 (``beat/heart.py:1513-1515``) fed through
    the standard incidence/heading LOS formula (``heart.py:1393-1400``).
    Equivalently LOS = (cos t cos p, cos t sin p, sin t) for elevation t
    and look azimuth p (ccw from east)."""
    from types import SimpleNamespace

    from beat_tpu.inputf import kite_scene_to_dataset

    thetas = np.deg2rad(np.array([90.0, 50.0, 30.0]))   # elevation
    phis = np.deg2rad(np.array([0.0, 30.0, -110.0]))    # azimuth ccw from E
    qt = SimpleNamespace(
        leaf_focal_points=np.column_stack([np.arange(3.0) * 1e3,
                                           np.zeros(3)]),
        leaf_thetas=thetas, leaf_phis=phis,
        leaf_means=np.array([0.01, 0.02, -0.005]))
    cov = np.diag([1e-6, 2e-6, 3e-6])
    scene = SimpleNamespace(quadtree=qt,
                            covariance=SimpleNamespace(covariance_matrix=cov))
    ds = kite_scene_to_dataset(scene, "asc_scene")

    expected = np.column_stack([np.cos(thetas) * np.cos(phis),
                                np.cos(thetas) * np.sin(phis),
                                np.sin(thetas)])
    np.testing.assert_allclose(ds.los_vector, expected, atol=1e-12)
    # nadir-looking leaf (theta=90deg): LOS is purely vertical
    np.testing.assert_allclose(ds.los_vector[0], [0.0, 0.0, 1.0], atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(ds.los_vector, axis=1), 1.0,
                               atol=1e-12)
    np.testing.assert_allclose(ds.covariance.data, cov)
    np.testing.assert_allclose(ds.displacement, qt.leaf_means)
