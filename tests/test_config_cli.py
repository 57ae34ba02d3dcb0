"""Config round trip + CLI project lifecycle (init → import → sample →
summarize → check → plot → export), port of the reference project-flow
intent (``test/test_config.py`` + CLI smoke)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from beat_tpu.config import (
    BEATconfig,
    GeodeticConfig,
    SamplerConfig,
    dump_config,
    init_config,
    load_config,
    problem_from_config,
    save_geodetic_datasets,
)
from beat_tpu.covariance import Covariance
from beat_tpu.heart.geodesy import GeodeticDataset
from beat_tpu.sources import RectangularSource


def make_synthetic_scene(project_dir):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    g = 10
    e = np.linspace(-12e3, 12e3, g)
    coords = np.stack(np.meshgrid(e, e), -1).reshape(-1, 2)
    src = RectangularSource(east_shift=1e3, depth=2e3, strike=15.0, dip=60.0,
                            rake=90.0, length=7e3, width=4e3, slip=1.0)
    disp = np.asarray(src.surface_displacement(jnp.asarray(coords)))
    los = np.tile([-0.6, 0.1, 0.79], (coords.shape[0], 1))
    los /= np.linalg.norm(los, axis=1, keepdims=True)
    obs = (disp * los).sum(1)
    sd = 0.01 * np.abs(obs).max()
    ds = GeodeticDataset(
        name="scene", typ="SAR", coords=coords,
        displacement=obs + rng.normal(0, sd, obs.shape),
        los_vector=los, covariance=Covariance(data=np.eye(obs.size) * sd**2))
    save_geodetic_datasets([ds], project_dir)
    return src


class TestConfigRoundTrip:
    def test_yaml_round_trip(self, tmp_path):
        config = init_config("proj", str(tmp_path / "proj"),
                             source_types=("RectangularSource",), n_sources=(1,))
        loaded = load_config(str(tmp_path / "proj"), "geometry")
        assert loaded.name == "proj"
        assert loaded.problem_config.source_types == ["RectangularSource"]
        assert "east_shift" in loaded.problem_config.priors
        ps = loaded.problem_config.get_prior_set()
        assert ps["depth"].upper[0] == 5.0  # default bounds from registry

    def test_validation_rejects_bad_mode(self, tmp_path):
        config = init_config("p2", str(tmp_path / "p2"))
        config.problem_config.mode = "bogus"
        with pytest.raises(ValueError):
            config.validate()

    def test_prior_physical_bound_validation(self, tmp_path):
        config = init_config("p3", str(tmp_path / "p3"))
        config.problem_config.priors["depth"]["upper"] = [2000.0]  # > physical 1000
        with pytest.raises(ValueError):
            config.validate()

    def test_problem_from_config(self, tmp_path):
        pdir = str(tmp_path / "p4")
        config = init_config("p4", pdir)
        make_synthetic_scene(pdir)
        problem = problem_from_config(load_config(pdir), pdir)
        assert "geodetic" in problem.composites
        assert "h_SAR" in problem.priors.names
        point = problem.priors.test_point()
        synths = problem.get_synthetics(point)
        assert synths["geodetic"]["scene"].shape == (100,)


def run_cli(*argv):
    from beat_tpu.apps.cli import main

    return main(list(argv))


class TestSeismicCLILifecycle:
    def test_seismic_project(self, tmp_path):
        """init → synthetic waveform data → sample → summarize for a
        DC-source seismic project (FullMT-style via CLI)."""
        import jax.numpy as jnp

        from beat_tpu.heart.gftable import build_homogeneous_table
        from beat_tpu.inputf import save_seismic_datasets
        from beat_tpu.heart.seismic import SeismicDataset
        from beat_tpu.sources import sdr_to_m6

        pdir = str(tmp_path / "seisproj")
        assert run_cli("init", "seisproj", pdir, "--datatypes", "seismic",
                       "--source_types", "DCSource") == 0

        config = load_config(pdir)
        gfc = dict(distance_min=20e3, distance_max=100e3, n_distances=6,
                   depth_min=2e3, depth_max=15e3, n_depths=4, nt=256, dt=0.25)
        config.seismic_config.gf_config = gfc
        wfc = config.seismic_config.waveforms[0]
        wfc.arrival_taper.a, wfc.arrival_taper.b = -3.0, -1.5
        wfc.arrival_taper.c, wfc.arrival_taper.d = 15.0, 18.0
        wfc.filterer.lower_corner, wfc.filterer.upper_corner = 0.02, 0.5
        config.sampler_config.parameters = {"n_chains": 48, "n_steps": 30,
                                            "seed": 2}
        for name in list(config.problem_config.priors):
            if name not in ("strike", "dip", "rake", "magnitude"):
                del config.problem_config.priors[name]
        config.problem_config.priors["strike"].update(
            lower=[0.0], upper=[90.0], testvalue=[40.0])
        config.problem_config.priors["dip"].update(
            lower=[30.0], upper=[80.0], testvalue=[55.0])
        config.problem_config.priors["rake"].update(
            lower=[-40.0], upper=[60.0], testvalue=[20.0])
        config.problem_config.priors["magnitude"].update(
            lower=[5.0], upper=[6.5], testvalue=[5.8])
        dump_config(config, pdir)

        # synthetic data from the same table the CLI will build
        table = build_homogeneous_table(
            distances=np.linspace(20e3, 100e3, 6),
            depths=np.linspace(2e3, 15e3, 4), nt=256, dt=0.25)
        rng = np.random.default_rng(0)
        n_st = 5
        az = np.linspace(0, 2 * np.pi, n_st, endpoint=False) + 0.2
        dist = rng.uniform(40e3, 90e3, n_st)
        st_e, st_n = dist * np.sin(az), dist * np.cos(az)
        m6 = jnp.asarray(sdr_to_m6(40.0, 55.0, 20.0, 10 ** (1.5 * 5.8 + 9.05)))
        spec = table.synthesize_spectra(
            m6, 0.0, 0.0, jnp.asarray(10000.0), 0.0, 1.0,
            jnp.asarray(st_e), jnp.asarray(st_n),
            jnp.asarray([0] * n_st, dtype=jnp.int32))
        raw = np.asarray(table.to_time_domain(spec))
        raw = raw + rng.normal(0, 0.02 * np.abs(raw).max(), raw.shape)
        save_seismic_datasets(
            [SeismicDataset(station=f"S{i}", channel="Z", east=st_e[i],
                            north=st_n[i], ydata=raw[i]) for i in range(n_st)],
            pdir)

        assert run_cli("check", pdir) == 0
        assert run_cli("sample", pdir) == 0
        assert run_cli("summarize", pdir) == 0
        summary_path = os.path.join(pdir, "geometry", "summary.txt")
        assert os.path.exists(summary_path)
        import json

        with open(summary_path) as f:
            summary = json.load(f)
        # mechanism recovered within loose CLI-scale tolerances
        assert abs(summary["strike"]["mean"] - 40.0) < 12.0
        assert abs(summary["magnitude"]["mean"] - 5.8) < 0.15


class TestPolarityCLI:
    def test_mtqt_polarity_project(self, tmp_path):
        """Polarity-only MTQT project via the CLI (reference MTQT_polarity
        example intent): recover the mechanism from first motions."""
        import jax.numpy as jnp

        from beat_tpu.config import save_polarity_targets
        from beat_tpu.heart.polarity import (PolarityTarget, pol_synthetics,
                                             radiation_weights_p,
                                             takeoff_vector)
        from beat_tpu.parameter import Parameter
        from beat_tpu.sources import sdr_to_m6

        pdir = str(tmp_path / "pol")
        assert run_cli("init", "pol", pdir, "--datatypes", "polarity",
                       "--source_types", "DCSource") == 0

        rng = np.random.default_rng(0)
        n = 30
        az = rng.uniform(0, 2 * np.pi, n)
        to = rng.uniform(np.pi / 2, np.pi, n)
        m6 = jnp.asarray(sdr_to_m6(30.0, 60.0, -90.0, 1.0))
        g = takeoff_vector(jnp.asarray(az), jnp.asarray(to))
        amps = np.asarray(pol_synthetics(m6, radiation_weights_p(g)))
        targets = [PolarityTarget(station=f"S{i}", azimuth_rad=az[i],
                                  takeoff_rad=to[i],
                                  polarity=int(np.sign(amps[i])))
                   for i in range(n)]
        save_polarity_targets(targets, pdir)

        config = load_config(pdir)
        P = config.problem_config.priors
        for name in list(P):
            if name not in ("strike", "dip", "rake"):
                del P[name]
        P["strike"] = Parameter("strike", [0.0], [90.0], testvalue=[45.0]).to_dict()
        P["dip"] = Parameter("dip", [30.0], [85.0], testvalue=[55.0]).to_dict()
        P["rake"] = Parameter("rake", [-135.0], [-45.0],
                              testvalue=[-90.0]).to_dict()
        config.sampler_config.parameters = {"n_chains": 48, "n_steps": 40,
                                            "seed": 8}
        dump_config(config, pdir)

        assert run_cli("sample", pdir) == 0
        assert run_cli("summarize", pdir) == 0
        import json

        with open(os.path.join(pdir, "geometry", "summary.txt")) as f:
            summary = json.load(f)
        # polarity data constrains the mechanism within ~15 degrees
        assert abs(summary["strike"]["mean"] - 30.0) < 15.0
        assert abs(summary["rake"]["mean"] + 90.0) < 20.0

    def test_sampled_depth_attaches_takeoff_table(self, tmp_path):
        """When the location is sampled and targets carry distances,
        problem_from_config precomputes a per-draw takeoff table
        (reference re-ray-traces each draw, ``pytensorf.py:345-362``)."""
        import jax.numpy as jnp

        from beat_tpu.config import save_polarity_targets
        from beat_tpu.heart.polarity import PolarityTarget
        from beat_tpu.heart.velocity_model import (LayeredModel,
                                                   takeoff_angles)
        from beat_tpu.parameter import Parameter
        from beat_tpu.sources import sdr_to_m6

        pdir = str(tmp_path / "poldepth")
        assert run_cli("init", "poldepth", pdir, "--datatypes", "polarity",
                       "--source_types", "DCSource") == 0

        model = LayeredModel.default_crust()
        rng = np.random.default_rng(1)
        n = 16
        dists = rng.uniform(30e3, 150e3, n)
        az = rng.uniform(0, 2 * np.pi, n)
        to = takeoff_angles(model, 12e3, dists)
        targets = [PolarityTarget(station=f"S{i}", azimuth_rad=az[i],
                                  takeoff_rad=to[i], polarity=1,
                                  distance_m=float(dists[i]))
                   for i in range(n)]
        save_polarity_targets(targets, pdir)

        config = load_config(pdir)
        P = config.problem_config.priors
        for name in list(P):
            if name not in ("strike", "dip", "rake", "depth"):
                del P[name]
        P["depth"] = Parameter("depth", [4.0], [20.0],
                               testvalue=[10.0]).to_dict()  # km → SI
        dump_config(config, pdir)

        problem = problem_from_config(load_config(pdir), pdir)
        m = problem.composites["polarity"].maps[0]
        assert m.takeoff_table is not None
        # table spans the prior depth range (SI meters)
        zg = np.asarray(m.takeoff_table.depth_grid)
        assert zg.min() <= 4e3 + 1 and zg.max() >= 20e3 - 1
        # and the likelihood actually moves with the sampled depth
        pt = {k: jnp.asarray(v) for k, v in
              dict(strike=30.0, dip=60.0, rake=-90.0).items()}
        l1 = float(problem.composites["polarity"].loglike(
            dict(pt, depth=jnp.asarray(5e3))))
        l2 = float(problem.composites["polarity"].loglike(
            dict(pt, depth=jnp.asarray(19e3))))
        assert abs(l1 - l2) > 1e-6


class TestFFICLIWorkflow:
    def test_geometry_then_ffi(self, tmp_path):
        """The staged reference workflow: geometry inversion → build_gfs
        uses the geometry MAP as the FFI reference source → FFI slip
        sampling (reference §9.4 import chain)."""
        import jax.numpy as jnp

        pdir = str(tmp_path / "staged")
        assert run_cli("init", "staged", pdir, "--datatypes", "geodetic") == 0
        true_src = make_synthetic_scene(pdir)

        # geometry run with everything fixed except slip (fast)
        config = load_config(pdir)
        from beat_tpu.parameter import Parameter

        P = config.problem_config.priors
        for name, v in (("strike", 15.0), ("dip", 60.0), ("rake", 90.0),
                        ("length", 7.0), ("width", 4.0), ("north_shift", 0.0),
                        ("east_shift", 1.0), ("depth", 2.0)):
            P[name] = Parameter(name, [v], [v]).to_dict()
        P["slip"] = Parameter("slip", [0.1], [3.0], testvalue=[1.0]).to_dict()
        config.sampler_config.parameters = {"n_chains": 32, "n_steps": 20,
                                            "seed": 5}
        dump_config(config, pdir)
        assert run_cli("sample", pdir) == 0

        # ffi mode: init config, build GFs from the geometry MAP, sample
        from beat_tpu.config import init_config

        ffi_cfg = init_config("staged", pdir, mode="ffi",
                              datatypes=("geodetic",))
        ffi_cfg.sampler_config.parameters = {"n_chains": 48, "n_steps": 30,
                                             "seed": 6}
        dump_config(ffi_cfg, pdir)
        assert run_cli("build_gfs", pdir, "--mode", "ffi",
                       "--patch_length", "2.0", "--patch_width", "2.0") == 0
        assert os.path.exists(os.path.join(pdir, "ffi", "linear_gfs",
                                           "geodetic_gfs.npz"))
        assert run_cli("check", pdir, "--mode", "ffi", "--what", "library") == 0
        assert run_cli("sample", pdir, "--mode", "ffi") == 0
        assert run_cli("summarize", pdir, "--mode", "ffi") == 0

        # mean slip over the fault should be of order the true 1 m slip
        import pickle

        from beat_tpu.backend import SampleStage
        from beat_tpu.models import load_model

        problem = load_model(pdir, "ffi")
        handler = SampleStage(problem.outfolder, ordering=problem.ordering)
        trace = handler.load_trace(-1)
        mean_point = problem.ordering.to_point(
            trace.q_trace.reshape(-1, trace.q_trace.shape[-1]).mean(axis=0))
        uparr = np.asarray(mean_point["uparr"])
        # potency-equivalent mean slip in the right ballpark
        assert 0.3 < np.abs(uparr).mean() < 2.0

        # export writes the rupture-evolution yaml for ffi problems
        import yaml as _yaml

        assert run_cli("export", pdir, "--mode", "ffi") == 0
        with open(os.path.join(pdir, "ffi",
                               "rupture_evolution_max.yaml")) as f:
            evo = _yaml.safe_load(f)
        assert len(evo["slip"]) == problem.composites["geodetic"].fault.npatches
        assert np.isfinite(evo["magnitude"])


class TestKinematicFFICLI:
    def test_seismic_ffi_workflow(self, tmp_path):
        """Kinematic FFI from the CLI: build 5-D seismic GF libraries and
        sample slip + rupture kinematics (BASELINE configs[4] at toy
        scale)."""
        import jax.numpy as jnp

        from beat_tpu.config import init_config
        from beat_tpu.heart.gftable import build_homogeneous_table
        from beat_tpu.heart.seismic import SeismicDataset
        from beat_tpu.inputf import save_seismic_datasets
        from beat_tpu.parameter import Parameter
        from beat_tpu.sources import RectangularSource, sdr_to_m6

        pdir = str(tmp_path / "kin")
        # geometry config provides the fixed reference source for build_gfs
        geom = init_config("kin", pdir, mode="geometry",
                           datatypes=("seismic",),
                           source_types=("RectangularSource",))
        P = geom.problem_config.priors
        fixed = dict(east_shift=0.0, north_shift=0.0, depth=2.0, strike=20.0,
                     dip=70.0, rake=0.0, length=6.0, width=4.0)
        for name, v in fixed.items():
            P[name] = Parameter(name, [v], [v]).to_dict()
        gfc = dict(distance_min=10e3, distance_max=80e3, n_distances=8,
                   depth_min=1e3, depth_max=12e3, n_depths=6, nt=256, dt=0.25)
        geom.seismic_config.gf_config = gfc
        wfc = geom.seismic_config.waveforms[0]
        wfc.arrival_taper.a, wfc.arrival_taper.b = -2.0, -1.0
        wfc.arrival_taper.c, wfc.arrival_taper.d = 20.0, 22.0
        wfc.filterer.lower_corner, wfc.filterer.upper_corner = 0.02, 0.6
        dump_config(geom, pdir)

        # synthetic kinematic waveforms from a known slip distribution
        table = build_homogeneous_table(
            distances=np.linspace(10e3, 80e3, 8),
            depths=np.linspace(1e3, 12e3, 6), nt=256, dt=0.25)
        rng = np.random.default_rng(0)
        n_st = 3
        az = np.linspace(0.4, 2 * np.pi, n_st, endpoint=False)
        dist = rng.uniform(30e3, 60e3, n_st)
        st_e, st_n = dist * np.sin(az), dist * np.cos(az)
        ref = RectangularSource(depth=2e3, strike=20.0, dip=70.0, rake=0.0,
                                length=6e3, width=4e3)
        from beat_tpu.ffi import discretize_sources

        fault_true = discretize_sources([ref], 2e3, 2e3)
        true_slips = rng.uniform(0.5, 1.5, fault_true.npatches)
        st_true = np.asarray(fault_true.point2starttimes(
            0, jnp.full(fault_true.npatches, 3000.0), 2e3, 1e3))
        spec_total = 0.0
        for i, p in enumerate(fault_true.get_all_patches()):
            m6 = jnp.asarray(sdr_to_m6(p.strike, p.dip, p.rake,
                                       33e9 * p.length * p.width)) * true_slips[i]
            c = p.center()
            spec_total = spec_total + table.synthesize_spectra(
                m6, c[0], c[1], jnp.asarray(c[2]), jnp.asarray(st_true[i]),
                jnp.asarray(1.0), jnp.asarray(st_e), jnp.asarray(st_n),
                jnp.asarray([0] * n_st, dtype=jnp.int32))
        raw = np.asarray(table.to_time_domain(spec_total))
        raw = raw + rng.normal(0, 0.02 * np.abs(raw).max(), raw.shape)
        save_seismic_datasets(
            [SeismicDataset(station=f"S{i}", channel="Z", east=st_e[i],
                            north=st_n[i], ydata=raw[i]) for i in range(n_st)],
            pdir)

        # ffi config: seismic datatype, kinematic priors
        ffi_cfg = init_config("kin", pdir, mode="ffi", datatypes=("seismic",))
        ffi_cfg.seismic_config.gf_config = gfc
        wfc = ffi_cfg.seismic_config.waveforms[0]
        wfc.arrival_taper.a, wfc.arrival_taper.b = -2.0, -1.0
        wfc.arrival_taper.c, wfc.arrival_taper.d = 20.0, 22.0
        wfc.filterer.lower_corner, wfc.filterer.upper_corner = 0.02, 0.6
        wfc.interpolation = "multilinear"
        Pf = ffi_cfg.problem_config.priors
        Pf["durations"] = Parameter("durations", [0.5], [2.0],
                                    testvalue=[1.0]).to_dict()
        Pf["velocities"] = Parameter("velocities", [2.0], [4.0],
                                     testvalue=[3.0]).to_dict()
        ffi_cfg.sampler_config.parameters = {"n_chains": 32, "n_steps": 20,
                                             "seed": 7}
        dump_config(ffi_cfg, pdir)

        assert run_cli("build_gfs", pdir, "--datatypes", "seismic",
                       "--patch_length", "2.0", "--patch_width", "2.0") == 0
        assert os.path.exists(os.path.join(
            pdir, "ffi", "linear_gfs", "seismic_uparr_any_P_0.npz"))

        assert run_cli("sample", pdir, "--mode", "ffi") == 0
        assert run_cli("summarize", pdir, "--mode", "ffi") == 0

        from beat_tpu.backend import SampleStage
        from beat_tpu.models import load_model

        problem = load_model(pdir, "ffi")
        assert {"uparr", "uperp", "durations", "velocities",
                "nucleation_strike", "nucleation_dip",
                "time"} <= set(problem.priors.names)
        handler = SampleStage(problem.outfolder, ordering=problem.ordering)
        trace = handler.load_trace(-1)
        mean_point = problem.ordering.to_point(
            trace.q_trace.reshape(-1, trace.q_trace.shape[-1]).mean(axis=0))
        # slip amplitude in the right ballpark (toy-scale tolerance)
        assert 0.2 < np.abs(np.asarray(mean_point["uparr"])).mean() < 2.5


class TestCLILifecycle:
    def test_full_lifecycle(self, tmp_path, capsys):
        pdir = str(tmp_path / "cliproj")
        assert run_cli("init", "cliproj", pdir, "--datatypes", "geodetic") == 0
        make_synthetic_scene(pdir)

        # shrink sampler for test speed
        config = load_config(pdir)
        config.sampler_config.parameters = {"n_chains": 48, "n_steps": 30, "seed": 3}
        # narrow priors to the relevant ones (fix others at defaults)
        for name in list(config.problem_config.priors):
            if name not in ("east_shift", "depth", "slip"):
                del config.problem_config.priors[name]
        # config layer is in reference units: km
        config.problem_config.priors["east_shift"]["lower"] = [-5.0]
        config.problem_config.priors["east_shift"]["upper"] = [5.0]
        config.problem_config.priors["east_shift"]["testvalue"] = [0.0]
        config.problem_config.priors["depth"]["lower"] = [0.5]
        config.problem_config.priors["depth"]["upper"] = [5.0]
        config.problem_config.priors["depth"]["testvalue"] = [2.0]
        config.problem_config.priors["slip"]["lower"] = [0.1]
        config.problem_config.priors["slip"]["upper"] = [3.0]
        config.problem_config.priors["slip"]["testvalue"] = [1.0]
        dump_config(config, pdir)

        assert run_cli("check", pdir) == 0
        assert run_cli("sample", pdir) == 0
        assert run_cli("summarize", pdir) == 0
        out = capsys.readouterr().out
        assert "east_shift" in out
        assert os.path.exists(os.path.join(pdir, "geometry", "summary.txt"))

        assert run_cli("plot", pdir, "stage_posteriors,scene_fits") == 0
        figs = os.listdir(os.path.join(pdir, "geometry", "figures"))
        assert any("stage_posteriors" in f for f in figs)
        assert any("scene_fits" in f for f in figs)

        assert run_cli("export", pdir) == 0
        assert os.path.exists(os.path.join(pdir, "geometry", "export.npz"))
        # solution yaml + standardized residuals (reference export extras)
        import yaml as _yaml

        with open(os.path.join(pdir, "geometry", "solution_max.yaml")) as f:
            sol = _yaml.safe_load(f)
        assert "east_shift" in sol
        with np.load(os.path.join(pdir, "geometry", "export.npz")) as z:
            stdz_keys = [k for k in z.files if k.startswith("stdz_res:")]
            assert stdz_keys, "standardized residuals missing from export"
            # whitened residuals are finite and of sane magnitude (~N(0,1)
            # only for a converged fit; this smoke run is short)
            r = z[stdz_keys[0]]
            assert np.isfinite(r).all() and 0.05 < np.std(r) < 100.0
        assert run_cli("export", pdir, "--post_llk", "mean") == 0
        assert os.path.exists(os.path.join(pdir, "geometry",
                                           "solution_mean.yaml"))

        clone_dir = str(tmp_path / "cliproj_clone")
        assert run_cli("clone", pdir, clone_dir) == 0
        assert os.path.exists(os.path.join(clone_dir, "config_geometry.yaml"))
        assert os.path.exists(os.path.join(clone_dir, "geodetic_data.npz"))

        # results -> priors import (reference `beat import --results`,
        # apps/beat.py:543-770): bounds narrow to the posterior HDI
        import json

        before = load_config(pdir)
        b_lo = float(before.problem_config.priors["east_shift"]["lower"][0])
        b_hi = float(before.problem_config.priors["east_shift"]["upper"][0])
        assert run_cli("import", pdir, "--results",
                       "--import_from_mode", "geometry") == 0
        with open(os.path.join(pdir, "geometry", "summary.txt")) as f:
            summary = json.load(f)
        rec = summary["east_shift"]
        hdi_lo = min(v for k, v in rec.items() if k.startswith("hdi_"))
        hdi_hi = max(v for k, v in rec.items() if k.startswith("hdi_"))
        after = load_config(pdir)
        a = after.problem_config.priors["east_shift"]
        a_lo, a_hi = float(a["lower"][0]), float(a["upper"][0])
        # new bounds == posterior HDI (km, floor/ceil rounding), inside old
        assert abs(a_lo - hdi_lo * 1e-3) < 0.02 and a_lo >= b_lo - 1e-9
        assert abs(a_hi - hdi_hi * 1e-3) < 0.02 and a_hi <= b_hi + 1e-9
        assert a_lo <= float(a["testvalue"][0]) <= a_hi
        # hyperparameter priors imported into the hyperparameters section
        hp = after.problem_config.hyperparameters
        assert "h_SAR" in hp
        assert float(hp["h_SAR"]["upper"][0]) - float(hp["h_SAR"]["lower"][0]) < 8.0


class TestCheckStores:
    def test_check_stores(self, tmp_path, capsys):
        pdir = str(tmp_path / "storeproj")
        assert run_cli("init", "storeproj", pdir, "--datatypes", "seismic") == 0

        # no stores yet
        assert run_cli("check", pdir, "--what", "stores") == 1
        assert "No GF stores" in capsys.readouterr().out

        # a healthy store
        from beat_tpu.heart.gftable import build_homogeneous_table

        table = build_homogeneous_table(np.linspace(20e3, 60e3, 3),
                                        np.linspace(2e3, 8e3, 2), nt=64, dt=0.5)
        table.save(os.path.join(pdir, "gf_table.npz"))
        assert run_cli("check", pdir, "--what", "stores") == 0
        assert "OK" in capsys.readouterr().out

        # corrupt it: NaN traces must be flagged
        with np.load(os.path.join(pdir, "gf_table.npz")) as z:
            arrs = {k: z[k].copy() for k in z.files}
        key = max((k for k in arrs if arrs[k].ndim >= 2),
                  key=lambda k: arrs[k].size)
        arrs[key][..., 0] = np.nan
        np.savez(os.path.join(pdir, "gf_table.npz"), **arrs)
        assert run_cli("check", pdir, "--what", "stores") == 1
        assert "CORRUPT" in capsys.readouterr().out


def test_version_and_completions(capsys):
    from beat_tpu.apps.cli import main

    with pytest.raises(SystemExit):
        main(["--version"])
    out = capsys.readouterr().out
    assert "beat_tpu" in out and "jax" in out

    assert main(["completions"]) == 0
    script = capsys.readouterr().out
    for word in ("sample", "build_gfs", "--mode", "RingfaultSource",
                 "complete -F _beat_tpu beat-tpu"):
        assert word in script


class TestBEMCLIWorkflow:
    @pytest.mark.slow
    def test_bem_project_lifecycle(self, tmp_path):
        """Config-driven bem mode (reference BEMConfig, config.py:1202):
        init → synthetic InSAR scene → linear unit-traction sampling when
        geometry is fixed → geometry+traction sampling via the BEM
        callback composite."""
        from beat_tpu.bem import BEMEngine, BoundaryCondition, DiskBEMSource
        from beat_tpu.config import problem_from_config
        from beat_tpu.parameter import Parameter

        pdir = str(tmp_path / "bemproj")
        assert run_cli("init", "bemproj", pdir, "--mode", "bem",
                       "--source_types", "DiskBEMSource") == 0

        cfg = load_config(pdir, "bem")
        assert cfg.bem_config is not None
        assert cfg.bem_config.medium == "halfspace"
        assert cfg.bem_config.boundary_conditions[0].slip_component == "normal"
        assert "normal_traction" in cfg.problem_config.priors
        assert "a_half_axis" in cfg.problem_config.priors
        assert cfg.problem_config.datatypes == ["geodetic"]

        # synthetic scene from a known pressurized disk
        rng = np.random.default_rng(0)
        g = 7
        e = np.linspace(-6e3, 6e3, g)
        coords = np.stack(np.meshgrid(e, e), -1).reshape(-1, 2)
        los = np.tile([0.1, -0.05, 0.99], (coords.shape[0], 1))
        los /= np.linalg.norm(los, axis=1, keepdims=True)
        engine = BEMEngine(
            [BoundaryCondition("normal", [0], [0], traction=20.0)],
            mesh_size=1200.0, check_mesh_intersection=False,
            quadrature_level=1, near_quadrature_level=4)
        resp = engine.process([DiskBEMSource(depth=3e3, a_half_axis=1000.0)],
                              coords)
        obs = np.einsum("ni,ni->n", resp.displacements, los)
        sd = 0.03 * np.abs(obs).max()
        from beat_tpu.heart.geodesy import GeodeticDataset

        ds = GeodeticDataset(
            name="volcano", typ="SAR", coords=coords,
            displacement=obs + rng.normal(0, sd, obs.shape), los_vector=los,
            covariance=Covariance(data=np.eye(obs.size) * sd**2))
        save_geodetic_datasets([ds], pdir)

        # fixed geometry → the fully on-device linear composite
        P = cfg.problem_config.priors
        for name, v in (("east_shift", 0.0), ("north_shift", 0.0),
                        ("depth", 3.0), ("a_half_axis", 1.0),
                        ("b_half_axis", 1.0), ("strike", 0.0),
                        ("dip", 0.0), ("plunge", 0.0)):
            P[name] = Parameter(name, [v], [v]).to_dict()
        P["normal_traction"] = Parameter("normal_traction", [0.0], [60.0],
                                         testvalue=[10.0]).to_dict()
        cfg.bem_config.mesh_size = 1.2
        cfg.bem_config.check_mesh_intersection = False
        cfg.bem_config.quadrature_level = 1
        cfg.bem_config.near_quadrature_level = 4
        cfg.sampler_config.parameters = {"n_chains": 64, "n_steps": 20,
                                         "seed": 1}
        dump_config(cfg, pdir)

        problem = problem_from_config(load_config(pdir, "bem"), pdir)
        from beat_tpu.models.bem import (GeodeticBEMComposite,
                                         GeodeticBEMLinearComposite)

        assert isinstance(problem.composites["geodetic"],
                          GeodeticBEMLinearComposite)
        assert run_cli("sample", pdir, "--mode", "bem") == 0
        assert run_cli("summarize", pdir, "--mode", "bem") == 0
        import json

        with open(os.path.join(pdir, "bem", "summary.txt")) as f:
            summary = json.load(f)
        assert abs(summary["normal_traction"]["mean"] - 20.0) < 6.0

        # free depth → the builder switches to the geometry-sampling
        # callback composite; its likelihood must prefer the true
        # (depth, traction) over offsets (full BEM-sampling runs live in
        # tests/test_bem_inversion.py — too slow for the CLI suite)
        import jax.numpy as jnp

        P["depth"] = Parameter("depth", [1.5], [6.0],
                               testvalue=[2.5]).to_dict()
        cfg.bem_config.mesh_size = 1.4
        cfg.bem_config.quadrature_level = 1
        cfg.bem_config.near_quadrature_level = 4
        dump_config(cfg, pdir)
        problem = problem_from_config(load_config(pdir, "bem"), pdir)
        comp = problem.composites["geodetic"]
        assert isinstance(comp, GeodeticBEMComposite)
        l_true = float(comp.loglike({"depth": jnp.asarray(3e3),
                                     "normal_traction": jnp.asarray(20.0)}))
        l_deep = float(comp.loglike({"depth": jnp.asarray(5.5e3),
                                     "normal_traction": jnp.asarray(20.0)}))
        l_weak = float(comp.loglike({"depth": jnp.asarray(3e3),
                                     "normal_traction": jnp.asarray(5.0)}))
        assert np.isfinite(l_true)
        assert l_true > l_deep and l_true > l_weak


class TestMultiEventConfig:
    """subevents config round-trip and decimation factors (reference
    ``BEATconfig.subevents`` config.py:1939, ``set_decimation_factor``
    config.py:1555)."""

    def test_subevents_round_trip(self, tmp_path):
        from beat_tpu.config import EventConfig

        config = init_config("multi", str(tmp_path / "multi"),
                             source_types=("DCSource",), n_sources=(2,))
        config.subevents = [EventConfig(name="sub1", lat=0.1, lon=0.2,
                                        depth=12e3, time=8.0)]
        dump_config(config, str(tmp_path / "multi"))
        loaded = load_config(str(tmp_path / "multi"), "geometry")
        assert len(loaded.subevents) == 1
        assert isinstance(loaded.subevents[0], EventConfig)
        assert loaded.subevents[0].time == 8.0
        assert len(loaded.events) == 2
        assert loaded.events[0] is loaded.event

    def test_decimation_factors_seeded_for_rectangular(self, tmp_path):
        config = init_config("dec", str(tmp_path / "dec"),
                             source_types=("RectangularSource",),
                             n_sources=(1,), datatypes=("geodetic",))
        pc = config.problem_config
        assert pc.decimation_factors.get("geodetic") == 4
        assert pc.finite_patches("geodetic") == (2, 2)
        assert pc.finite_patches("seismic") == (4, 4)

    def test_no_decimation_for_point_sources(self, tmp_path):
        config = init_config("pt", str(tmp_path / "pt"),
                             source_types=("MTSource",), n_sources=(1,),
                             datatypes=("geodetic",))
        assert config.problem_config.decimation_factors == {}


def test_polarity_waveforms_round_trip(tmp_path):
    """PolarityConfig.waveforms deserializes to PolarityFitConfig (not
    the seismic WaveformFitConfig that shares the field name)."""
    from beat_tpu.config import PolarityFitConfig

    config = init_config("pol", str(tmp_path / "pol"),
                         source_types=("MTQTSource",), n_sources=(1,),
                         datatypes=("polarity",))
    config.polarity_config.waveforms = [
        PolarityFitConfig(name="any_P", blacklist=["ST01"]),
        PolarityFitConfig(name="any_SH", event_idx=0),
    ]
    dump_config(config, str(tmp_path / "pol"))
    loaded = load_config(str(tmp_path / "pol"), "geometry")
    wfs = loaded.polarity_config.waveforms
    assert len(wfs) == 2
    assert all(isinstance(w, PolarityFitConfig) for w in wfs)
    assert wfs[0].blacklist == ["ST01"]
    assert wfs[1].name == "any_SH"


class TestVersionGate:
    """Version-stamped configs + migration (reference
    ConfigNeedsUpdatingError config.py:189 + upgrade.py:81)."""

    def test_old_config_gated_then_migrated(self, tmp_path):
        import yaml

        from beat_tpu import __version__
        from beat_tpu.config import init_config, dump_config, load_config

        pdir = str(tmp_path / "proj")
        config = init_config("p", pdir, source_types=("DCSource",),
                             n_sources=(1,), datatypes=("seismic",))
        dump_config(config, pdir)
        path = pdir + "/config_geometry.yaml"
        # fresh dumps are stamped with the current version and load fine
        assert yaml.safe_load(open(path))["version"] == __version__
        load_config(pdir)

        # simulate a 0.1.0-era config: old stamp + the then-inert
        # distances default that would now weed all regional stations
        d = yaml.safe_load(open(path))
        d["version"] = "0.1.0"
        d["seismic_config"]["waveforms"][0]["distances"] = [30.0, 90.0]
        yaml.safe_dump(d, open(path, "w"), sort_keys=False)
        with pytest.raises(ValueError, match="beat-tpu update"):
            load_config(pdir)

        from beat_tpu.apps.cli import main

        assert main(["update", pdir]) == 0
        config2 = load_config(pdir)   # gate passes after migration
        assert config2.seismic_config.waveforms[0].distances is None

    def test_geodetic_types_migrated(self):
        # pre-0.2.0 the field was inert and dumped as ['SAR']; after the
        # filter became active that literal would drop all GNSS datasets
        from beat_tpu.upgrade import upgrade_config_dict

        d = {"version": "0.1.0", "geodetic_config": {"types": ["SAR"]}}
        upgrade_config_dict(d)
        assert d["geodetic_config"]["types"] == ["SAR", "GNSS"]
        # a deliberate post-0.2.0 choice is left alone
        d2 = {"version": "0.2.0", "geodetic_config": {"types": ["SAR"]}}
        upgrade_config_dict(d2)
        assert d2["geodetic_config"]["types"] == ["SAR"]


class TestCloneNewModeAndFixedCorrections:
    def test_clone_new_mode_writes_ffi_config(self, tmp_path):
        """`beat-tpu clone --new_mode ffi` derives the ffi config from
        geometry (reference `beat clone ... --new_mode`)."""
        pdir = str(tmp_path / "src")
        assert run_cli("init", "src", pdir, "--datatypes", "geodetic") == 0
        make_synthetic_scene(pdir)
        cdir = str(tmp_path / "dst")
        assert run_cli("clone", pdir, cdir, "--new_mode", "ffi") == 0
        assert os.path.exists(os.path.join(cdir, "config_geometry.yaml"))
        cfg = load_config(cdir, "ffi")
        pc = cfg.problem_config
        assert pc.mode == "ffi"
        assert {"uparr", "uperp"} <= set(pc.priors)
        assert "strike" not in pc.priors          # geometry vars dropped
        assert pc.datatypes == ["geodetic"]
        # data files travel with the clone
        assert os.path.exists(os.path.join(cdir, "geodetic_data.npz"))

    def test_build_gfs_refuses_without_reference_fault(self, tmp_path):
        """No geometry posterior + no fixed length/width priors must be
        a loud error, not a silent degenerate 1-patch fault."""
        pdir = str(tmp_path / "nofault")
        assert run_cli("init", "nofault", pdir, "--datatypes", "geodetic") == 0
        make_synthetic_scene(pdir)
        rc = run_cli("build_gfs", pdir, "--mode", "ffi",
                     "--patch_length", "2.0", "--patch_width", "2.0")
        assert rc == 1
        assert not os.path.exists(
            os.path.join(pdir, "ffi", "linear_gfs", "geodetic_gfs.npz"))

    def test_ffi_fixes_corrections_at_geometry_map(self, tmp_path):
        """In ffi mode, ramp corrections are FIXED at the geometry-MAP
        values and removed from the data (reference FFI_static.rst:236:
        free ramps feed artificial deep slip)."""
        import jax.numpy as jnp

        from beat_tpu.config import (_apply_fixed_corrections,
                                     geometry_map_point)
        from beat_tpu.heart.corrections import (RampCorrection,
                                                get_ramp_displacement)
        from beat_tpu.heart.geodesy import GeodeticDataset

        rng = np.random.default_rng(0)
        coords = rng.uniform(-5e3, 5e3, (30, 2))
        disp = rng.normal(0, 0.01, 30)
        ds = GeodeticDataset(name="ifg", typ="SAR", coords=coords,
                             displacement=disp.copy(),
                             los_vector=np.tile([0.0, 0.0, 1.0], (30, 1)))
        corr = RampCorrection(dataset_name="ifg")
        point = {"ifg_azimuth_ramp": 2e-6, "ifg_range_ramp": -1e-6,
                 "ifg_offset": 0.003}
        fixed = _apply_fixed_corrections([ds], [corr], point)
        assert fixed == ["ifg"]
        expected = disp - np.asarray(get_ramp_displacement(
            jnp.asarray(coords[:, 0]), jnp.asarray(coords[:, 1]),
            2e-6, -1e-6, 0.003))
        np.testing.assert_allclose(ds.displacement, expected, atol=1e-12)

        # no geometry stage -> no MAP point
        assert geometry_map_point(str(tmp_path / "nothing")) is None
