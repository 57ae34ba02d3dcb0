"""
Interop against the reference's REAL bundled artifacts.

Every test here ingests actual files shipped in /root/reference/data —
the 1995 Gulf of Aqaba Mw 7.2 FullMT waveforms, the L'Aquila InSAR
scenes, the MTQT polarity picks — through the shim readers in
``beat_tpu.interop`` (no pyrocko/pymc installed).  The reference's own
integration tests load exactly these projects
(``test/test_composites.py:32-36``).
"""

import os

import numpy as np
import pytest

from beat_tpu import interop

EXAMPLES = "/root/reference/data/examples"
HAVE_EXAMPLES = os.path.isdir(EXAMPLES)

pytestmark = pytest.mark.skipif(
    not HAVE_EXAMPLES, reason="reference example data not present")


# ---------------------------------------------------------------------------
# guts-YAML config import (all five bundled projects)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,mode,datatypes", [
    ("FullMT", "geometry", ["seismic"]),
    ("Laquila", "geometry", ["geodetic", "seismic"]),
    ("MTQT_polarity", "geometry", ["polarity"]),
    ("Fernandina", "geometry", ["geodetic"]),
    ("dc_teleseismic", "geometry", ["seismic"]),
])
def test_guts_config_parses(name, mode, datatypes):
    cfg, notes = interop.beat_config_from_guts(
        os.path.join(EXAMPLES, name, "config_geometry.yaml"))
    assert cfg.problem_config.mode == mode
    assert set(datatypes) <= set(cfg.problem_config.datatypes)
    # every prior is a well-formed bounded parameter
    for pname, p in cfg.problem_config.priors.items():
        assert np.all(np.asarray(p["lower"]) <= np.asarray(p["upper"])), pname


def test_fullmt_config_details():
    cfg, _ = interop.beat_config_from_guts(
        os.path.join(EXAMPLES, "FullMT", "config_geometry.yaml"))
    # the GCMT solution embedded as ground truth (config lines 10-19)
    assert abs(cfg.event.magnitude - 7.2058) < 1e-3
    mt = cfg.event.moment_tensor
    assert abs(mt["mnn"] - (-0.43283071)) < 1e-6
    assert abs(mt["mee"] - 0.65741974) < 1e-6
    assert cfg.problem_config.source_types == ["MTSource"]
    pr = cfg.problem_config.priors
    for comp in ("mnn", "mee", "mdd", "mne", "mnd", "med"):
        assert comp in pr
    # reference SMC scale (config_geometry.yaml:190-210)
    assert cfg.sampler_config.name == "SMC"
    assert cfg.sampler_config.parameters["n_chains"] == 2000
    assert cfg.sampler_config.parameters["n_steps"] == 300
    # one any_P wavemap fitting the Z channel (config lines 132-135)
    waves = cfg.seismic_config.waveforms
    assert [w.name for w in waves] == ["any_P"]
    assert waves[0].channels == ["Z"]


def test_laquila_config_details():
    cfg, _ = interop.beat_config_from_guts(
        os.path.join(EXAMPLES, "Laquila", "config_geometry.yaml"))
    assert cfg.problem_config.source_types == ["RectangularSource"]
    cc = cfg.geodetic_config.corrections
    assert cc.ramps.enabled
    assert set(cc.ramps.dataset_names) == {"Laquila_dscxn", "Laquila_ascxn"}
    # euler pole present but disabled in the example
    assert len(cc.euler_poles) == 1 and not cc.euler_poles[0].enabled


# ---------------------------------------------------------------------------
# pyrocko pickle shims (real binary payloads)
# ---------------------------------------------------------------------------


def test_fullmt_seismic_pickle():
    st, tr = interop.seismic_arrays_from_pickle(
        os.path.join(EXAMPLES, "FullMT", "seismic_data.pkl"))
    assert len(st) == 10 and len(tr) == 30
    chans = {t["channel"] for t in tr}
    assert chans == {"Z", "R", "T"}
    for t in tr:
        y = t["ydata"]
        assert y.ndim == 1 and y.size > 900 and np.isfinite(y).all()
        assert t["deltat"] == 1.0
        assert t["tmin"] > 8e8          # 1995 epoch seconds
    for s in st:
        assert -90 <= s["lat"] <= 90 and -180 <= s["lon"] <= 360
        assert set(s["channels"]) >= {"Z"}


def test_laquila_geodetic_pickle():
    cfg, _ = interop.beat_config_from_guts(
        os.path.join(EXAMPLES, "Laquila", "config_geometry.yaml"))
    ds = interop.geodetic_datasets_from_pickle(
        os.path.join(EXAMPLES, "Laquila", "geodetic_data.pkl"),
        event=cfg.event)
    assert sorted(d.name for d in ds) == ["Laquila_ascxn", "Laquila_dscxn"]
    for d in ds:
        assert d.samples in (205, 214)
        # unit LOS vectors from incidence/heading
        assert np.allclose(np.linalg.norm(d.los_vector, axis=1), 1.0, atol=1e-12)
        # real InSAR displacements: cm-to-dm scale, finite
        assert np.isfinite(d.displacement).all()
        assert 0.01 < np.abs(d.displacement).max() < 5.0
        # imported full covariance, symmetric
        C = d.covariance.data
        assert C.shape == (d.samples, d.samples)
        assert np.allclose(C, C.T)
        assert d.mask is not None and d.mask.shape == (d.samples,)
        # local coordinates projected against the event
        assert np.abs(d.coords).max() > 1e3


def test_mtqt_polarity_files():
    stations = interop.load_pyrocko_stations(
        os.path.join(EXAMPLES, "MTQT_polarity", "stations.txt"))
    assert len(stations) > 20
    markers = interop.load_snuffler_markers(
        os.path.join(EXAMPLES, "MTQT_polarity", "polarity_markers_P.pf"))
    assert len(markers) > 10
    pols = {m["polarity"] for m in markers if m.get("polarity") is not None}
    assert pols <= {-1, 1} and len(pols) == 2

    cfg, _ = interop.beat_config_from_guts(
        os.path.join(EXAMPLES, "MTQT_polarity", "config_geometry.yaml"))
    targets = interop.polarity_targets_from_markers(
        os.path.join(EXAMPLES, "MTQT_polarity", "polarity_markers_P.pf"),
        os.path.join(EXAMPLES, "MTQT_polarity", "stations.txt"),
        cfg.event)
    assert len(targets) > 10
    for t in targets:
        assert t.polarity in (-1, 1)
        assert np.isfinite(t.azimuth_rad)
        assert t.distance_m is None or t.distance_m > 0


# ---------------------------------------------------------------------------
# one-shot project migration + native model load on the real data
# ---------------------------------------------------------------------------


def test_import_laquila_project_and_logp(tmp_path):
    dest = str(tmp_path / "laquila")
    cfg, notes = interop.import_beat_project(
        os.path.join(EXAMPLES, "Laquila"), dest, build=False)
    assert cfg.problem_config.datatypes == ["geodetic"]
    assert os.path.exists(os.path.join(dest, "config_geometry.yaml"))
    assert os.path.exists(os.path.join(dest, "geodetic_data.npz"))

    from beat_tpu.models.problem import load_model

    prob = load_model(dest, "geometry")
    # ramp corrections materialised per the config's dataset_names
    names = [p for p in prob.priors.ordering.names if "ramp" in p or
             "offset" in p]
    assert names, "ramp hierarchicals missing"
    q = prob.point_to_array(prob.priors.test_point())
    logp, data = prob.make_logp_fn()
    lp = float(logp(q, data))
    assert np.isfinite(lp)


def test_import_mtqt_project_and_logp(tmp_path):
    dest = str(tmp_path / "mtqt")
    cfg, _ = interop.import_beat_project(
        os.path.join(EXAMPLES, "MTQT_polarity"), dest, build=False)
    assert cfg.problem_config.datatypes == ["polarity"]

    from beat_tpu.models.problem import load_model

    prob = load_model(dest, "geometry")
    q = prob.point_to_array(prob.priors.test_point())
    logp, data = prob.make_logp_fn()
    lp = float(logp(q, data))
    assert np.isfinite(lp)


def test_import_fullmt_project_writes_native_layout(tmp_path):
    dest = str(tmp_path / "fullmt")
    cfg, _ = interop.import_beat_project(
        os.path.join(EXAMPLES, "FullMT"), dest, build=False)
    assert os.path.exists(os.path.join(dest, "seismic_data_raw.npz"))
    assert os.path.exists(os.path.join(dest, "velocity_model.nd"))
    gf = cfg.seismic_config.gf_config
    # grid derived from the true station geometry + depth prior
    assert 100e3 < gf["distance_min"] < gf["distance_max"] < 1100e3
    assert gf["depth_max"] == 15000.0
    assert gf["dt"] == 0.5 and gf["nt"] >= 1024
    # synthesis band capped by the filter corners (0.1 Hz upper)
    assert gf["fmax"] == pytest.approx(0.2)

    from beat_tpu.heart.velocity_model import LayeredModel

    model = LayeredModel.from_nd(os.path.join(dest, "velocity_model.nd"))
    assert model.nlayers >= 3
    assert np.all(model.vp > model.vs)


def test_import_cli_entrypoint(tmp_path):
    """`beat-tpu import <dest> --from_beat <src>` wires to interop."""
    from beat_tpu.apps.cli import main

    dest = str(tmp_path / "mtqt_cli")
    rc = main(["import", dest, "--from_beat",
               os.path.join(EXAMPLES, "MTQT_polarity"), "--no_build"])
    assert rc in (0, None)
    assert os.path.exists(os.path.join(dest, "config_geometry.yaml"))


# ---------------------------------------------------------------------------
# SAR polygon masks flow into correction estimation (VERDICT #7)
# ---------------------------------------------------------------------------


def test_kite_polygon_mask_extraction():
    """Polygon vertices ([cols, rows] in frame units) select quadtree
    leaves — reference ``DiffIFG.from_kite_scene`` heart.py:1484-1502."""
    from beat_tpu.inputf import kite_scene_to_dataset

    class Frame:
        dN = 100.0
        dE = 100.0

    class Quadtree:
        leaf_northings = np.array([0.0, 100.0, 500.0, 900.0])
        leaf_eastings = np.array([0.0, 100.0, 500.0, 900.0])
        leaf_focal_points = np.column_stack(
            [leaf_eastings, leaf_northings])
        leaf_means = np.array([0.01, 0.02, 0.3, 0.01])
        leaf_thetas = np.deg2rad(np.full(4, 50.0))
        leaf_phis = np.deg2rad(np.full(4, 170.0))

    class PolygonMask:
        # one polygon around (5, 5) in (col, row) units -> leaf #2 only
        polygons = {0: np.array([[3.0, 3.0], [7.0, 3.0],
                                 [7.0, 7.0], [3.0, 7.0]])}

    class Scene:
        quadtree = Quadtree()
        frame = Frame()
        polygon_mask = PolygonMask()

    ds = kite_scene_to_dataset(Scene(), "synthetic")
    assert ds.mask is not None
    np.testing.assert_array_equal(ds.mask, [False, False, True, False])

    # without polygons: no mask
    class Bare:
        quadtree = Quadtree()
        frame = Frame()

    assert kite_scene_to_dataset(Bare(), "bare").mask is None


def test_polygon_mask_excludes_points_from_correction(tmp_path):
    """Masked (deforming-region) points receive NO plate-motion
    correction, so the correction parameters are constrained by the far
    field only — reference ``EulerPoleCorrection.get_displacement``
    ``models/corrections.py:138-139`` (vels[mask]=0) with the SAR
    dataset supplying ``get_data_mask`` (``heart.py:1520``)."""
    from beat_tpu.config import (EulerPoleConfig, GeodeticConfig,
                                 GeodeticCorrectionsConfig,
                                 _build_corrections)
    from beat_tpu.heart.geodesy import diff_ifg

    rng = np.random.default_rng(7)
    n = 40
    coords = rng.uniform(-3e4, 3e4, size=(n, 2))
    ds = diff_ifg("scene", coords, np.zeros(n), incidence=40.0, heading=190.0)
    ds.lats = 42.0 + coords[:, 1] / 111e3
    ds.lons = 13.0 + coords[:, 0] / 85e3
    ds.mask = np.zeros(n, dtype=bool)
    ds.mask[:10] = True      # near-field polygon

    gc = GeodeticConfig(corrections=GeodeticCorrectionsConfig(
        euler_poles=[EulerPoleConfig(enabled=True,
                                     dataset_names=["scene"])]))
    corrections = _build_corrections(gc, [ds])
    eps = [c for c in corrections
           if type(c).__name__ == "EulerPoleCorrection"]
    assert len(eps) == 1

    h = {p: np.asarray(v) for p, v in
         zip(eps[0].parameter_names, (55.0, -100.0, 0.3))}
    los_enu = ds.los_vector
    disp = np.asarray(eps[0].displacement(h, los_enu))
    assert np.all(disp[:10] == 0.0), "masked points must get zero correction"
    assert np.all(disp[10:] != 0.0)


def test_polygon_mask_round_trips_project_save(tmp_path):
    from beat_tpu.config import load_geodetic_datasets # noqa: F401  (import check)
    from beat_tpu.config import GeodeticConfig, save_geodetic_datasets
    from beat_tpu.heart.geodesy import diff_ifg

    n = 12
    ds = diff_ifg("s1", np.random.default_rng(0).normal(size=(n, 2)) * 1e4,
                  np.zeros(n), incidence=40.0, heading=190.0)
    ds.mask = np.zeros(n, dtype=bool)
    ds.mask[3:6] = True
    save_geodetic_datasets([ds], str(tmp_path))
    back = load_geodetic_datasets(str(tmp_path), GeodeticConfig())
    assert back[0].mask is not None
    np.testing.assert_array_equal(back[0].mask, ds.mask)


# ---------------------------------------------------------------------------
# advisor round-4 findings
# ---------------------------------------------------------------------------


def test_snuffler_span_markers_parse(tmp_path):
    """pyrocko span markers (tmin != tmax) insert a second date/time
    pair + duration; the station/polarity columns must still land
    (advisor: fields are parsed from the end of the line)."""
    path = str(tmp_path / "markers.pf")
    with open(path, "w") as f:
        f.write("# Snuffler Markers File Version 0.2\n")
        # point form
        f.write("phase: 2020-09-11 22:37:27.90353  0 EO.KSM02..Z "
                "R6VDO9K= 2020-09-11 22:37:26.00000 P 1 False\n")
        # span form: date2/time2 + duration inserted after time1
        f.write("phase: 2020-09-11 22:37:28.34316 2020-09-11 "
                "22:37:30.34316 2.0 0 1E.BCH2A..Z "
                "R6VDO9K= 2020-09-11 22:37:26.00000 P -1 False\n")
    markers = interop.load_snuffler_markers(path)
    assert len(markers) == 2
    assert markers[0]["station"] == "EO.KSM02"
    assert markers[0]["polarity"] == 1
    assert markers[1]["station"] == "1E.BCH2A"
    assert markers[1]["polarity"] == -1
    assert markers[1]["phase"] == "P"
    # both reference the same event origin
    assert markers[0]["event_time"] == markers[1]["event_time"]
    # span tmin is the first date/time pair
    assert markers[1]["time"] - markers[0]["time"] == pytest.approx(
        28.34316 - 27.90353, abs=1e-4)


def test_import_honors_global_base_model(tmp_path):
    """Laquila names ak135-f-continental.m with NO custom model: the
    import must write the embedded ak135 as velocity_model.nd and point
    gf_config at it instead of silently defaulting to homogeneous
    (advisor round-4 medium finding)."""
    dest = str(tmp_path / "laquila_ak")
    cfg, notes = interop.import_beat_project(
        os.path.join(EXAMPLES, "Laquila"), dest, build=False)
    nd = os.path.join(dest, "velocity_model.nd")
    assert os.path.exists(nd)
    gf = cfg.geodetic_config.gf_config
    assert gf["earth_model"] == "velocity_model.nd"
    assert any("ak135" in n for n in notes)

    from beat_tpu.heart.velocity_model import LayeredModel

    model = LayeredModel.from_nd(nd)
    assert model.nlayers > 10                      # the real ak135 stack
    assert 5000 < model.vp[0] < 7000               # crustal P
    assert model.vp[-1] > 9000                     # 600+ km mantle


def test_import_refuses_unknown_base_model(tmp_path):
    """An un-honorable base model must fail loudly at build=True."""
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    cfg_text = open(os.path.join(EXAMPLES, "Laquila",
                                 "config_geometry.yaml")).read()
    cfg_text = cfg_text.replace("ak135-f-continental.m", "prem-no-ocean.m")
    with open(os.path.join(src, "config_geometry.yaml"), "w") as f:
        f.write(cfg_text)
    shutil.copy(os.path.join(EXAMPLES, "Laquila", "geodetic_data.pkl"), src)

    with pytest.raises(ValueError, match="base earth model"):
        interop.import_beat_project(src, str(tmp_path / "dest"), build=True)
    # build=False degrades to an import note
    cfg, notes = interop.import_beat_project(
        src, str(tmp_path / "dest2"), build=False)
    assert any("not honored" in n for n in notes)


def test_seismic_grid_s_phase_lengthens_table():
    """A project with an S wavemap must size the table time axis for
    the S arrival (~d/3500), not the P heuristic (advisor finding)."""
    cfg, _ = interop.beat_config_from_guts(
        os.path.join(EXAMPLES, "FullMT", "config_geometry.yaml"))
    stations, _ = interop.seismic_arrays_from_pickle(
        os.path.join(EXAMPLES, "FullMT", "seismic_data.pkl"))
    gf_p = interop._seismic_gf_grid(cfg, stations, {})
    for w in cfg.seismic_config.waveforms:
        w.name = "any_S"
    gf_s = interop._seismic_gf_grid(cfg, stations, {})
    assert gf_s["nt"] * gf_s["dt"] >= gf_p["nt"] * gf_p["dt"]
    # ~955 km far edge: S needs ≥ 955e3/3000 ≈ 318 s + taper
    assert gf_s["nt"] * gf_s["dt"] >= 318.0
