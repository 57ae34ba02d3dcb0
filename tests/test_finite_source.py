"""
Finite-source (RectangularSource) seismic geometry mode: patch-discretized
waveform synthesis with rupture-propagation onsets (reference: pyrocko RS
discretization inside engine.process, ``beat/heart.py:3564``;
``beat/sources.py:46-157``), plus CLVD/DoubleDC point sources
(reference source catalog ``beat/sources.py:694-721``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from beat_tpu.heart.gftable import build_homogeneous_table
from beat_tpu.models.seismic import SeismicGeometryComposite
from beat_tpu.sources import (CLVDSource, DCSource, DoubleDCSource,
                              RectangularSource, magnitude_to_moment,
                              moment_to_magnitude)

from tests.test_seismic import make_wavemap

MU_TABLE = 2700.0 * 3500.0**2  # rho * vs^2 of the test table


@pytest.fixture(scope="module")
def table():
    return build_homogeneous_table(
        distances=np.linspace(20e3, 120e3, 11),
        depths=np.linspace(2e3, 20e3, 5), nt=256, dt=0.25)


class TestFiniteRectangular:
    def test_point_source_limit(self, table):
        """A tiny rectangle must reproduce the point DC with the same
        moment: m0 = mu*L*W*slip."""
        sdr = dict(strike=40.0, dip=55.0, rake=20.0)
        L, W, slip = 100.0, 60.0, 1.5
        m0 = MU_TABLE * L * W * slip
        wavemap = make_wavemap(table, seed=3)

        rect = RectangularSource(depth=9e3, length=L, width=W, slip=slip,
                                 duration=1.5, velocity=3500.0, **sdr)
        comp_r = SeismicGeometryComposite([wavemap], [rect])
        # anchor 'top': point source sits at the rectangle's mid-depth
        dc = DCSource(depth=9e3 + W / 2 * np.sin(np.deg2rad(sdr["dip"])),
                      magnitude=float(moment_to_magnitude(m0)), **sdr)
        comp_p = SeismicGeometryComposite([wavemap], [dc])

        point = {"duration": jnp.asarray(1.5)}
        wins_r = np.asarray(comp_r.synthetics_windows(point, 0))
        wins_p = np.asarray(comp_p.synthetics_windows(point, 0))
        scale = np.abs(wins_p).max()
        np.testing.assert_allclose(wins_r, wins_p, atol=0.03 * scale)

    def test_directivity(self, table):
        """Moving the nucleation from one end of a long rupture to the
        other changes the waveforms (rupture-propagation delays) — a
        point source cannot represent this."""
        wavemap = make_wavemap(table, seed=4)
        base = dict(depth=8e3, strike=0.0, dip=80.0, rake=0.0, length=30e3,
                    width=8e3, slip=2.0, duration=1.0, velocity=2800.0)
        c1 = SeismicGeometryComposite(
            [wavemap], [RectangularSource(nucleation_x=-0.9, **base)],
            finite_patches=(8, 3))
        c2 = SeismicGeometryComposite(
            [wavemap], [RectangularSource(nucleation_x=0.9, **base)],
            finite_patches=(8, 3))
        w1 = np.asarray(c1.synthetics_windows({}, 0))
        w2 = np.asarray(c2.synthetics_windows({}, 0))
        rel = np.abs(w1 - w2).max() / np.abs(w1).max()
        assert rel > 0.2, rel

    @pytest.mark.slow
    def test_joint_rect_inversion_recovers_moment(self, table, tmp_path):
        """One RectangularSource drives BOTH waveforms and InSAR; the
        joint inversion recovers slip (hence seismic moment) — the
        reference's Rectangular docs example
        (``docs/examples/Rectangular.rst``)."""
        from beat_tpu.covariance import Covariance
        from beat_tpu.heart.geodesy import GeodeticDataset
        from beat_tpu.models.geodetic import GeodeticGeometryComposite
        from beat_tpu.models.problem import Problem
        from beat_tpu.parameter import Parameter, PriorSet
        from beat_tpu.samplers import SMCParams

        from beat_tpu.heart.seismic import SeismicDataset, WaveformMapping
        from beat_tpu.heart.taper import ArrivalTaper, Filter
        from beat_tpu.models.seismic import finite_rectangular_spectra, point_getter

        TRUE = dict(depth=6e3, strike=30.0, dip=60.0, rake=-90.0,
                    length=12e3, width=6e3)
        TRUE_SLIP = 1.4
        rng = np.random.default_rng(7)

        src_true = RectangularSource(slip=TRUE_SLIP, duration=1.5,
                                     velocity=3000.0, **TRUE)

        # observed waveforms: full-length finite-source traces + noise
        n_st = 8
        az = np.linspace(0, 2 * np.pi, n_st, endpoint=False) + 0.2
        dist = rng.uniform(40e3, 100e3, n_st)
        st_e, st_n = dist * np.sin(az), dist * np.cos(az)
        get = point_getter(src_true, {}, 0, 1)
        spec = finite_rectangular_spectra(
            table, get, jnp.asarray(st_e), jnp.asarray(st_n),
            jnp.asarray([0] * n_st, dtype=jnp.int32), "HalfSinusoid", None)
        raw = np.asarray(table.to_time_domain(spec))
        raw = raw + rng.normal(0, 0.03 * np.abs(raw).max(), raw.shape)
        datasets = [SeismicDataset(station=f"ST{i:02d}", channel="Z",
                                   east=st_e[i], north=st_n[i], ydata=raw[i])
                    for i in range(n_st)]
        wavemap = WaveformMapping(
            name="any_P", datasets=datasets, table=table,
            taper=ArrivalTaper(a=-3.0, b=-1.5, c=15.0, d=18.0),
            filterer=Filter(lower_corner=0.02, upper_corner=0.5, order=3))

        e = np.linspace(-20e3, 20e3, 9)
        coords = np.stack(np.meshgrid(e, e), -1).reshape(-1, 2)
        disp = np.asarray(src_true.surface_displacement(jnp.asarray(coords)))
        los = np.tile([-0.6, 0.1, 0.79], (coords.shape[0], 1))
        los /= np.linalg.norm(los, axis=1, keepdims=True)
        obs = (disp * los).sum(1)
        sd = 0.03 * np.abs(obs).max()
        scene = GeodeticDataset(
            name="ifg", typ="SAR", coords=coords,
            displacement=obs + rng.normal(0, sd, obs.shape), los_vector=los,
            covariance=Covariance(data=np.eye(obs.size) * sd**2))

        seis = SeismicGeometryComposite([wavemap], [src_true])
        geo = GeodeticGeometryComposite([scene], [src_true])
        priors = PriorSet()
        priors.add(Parameter("slip", [0.2], [3.0]))
        priors.add(Parameter("nucleation_x", [-1.0], [1.0]))
        problem = Problem(priors, {"seismic": seis, "geodetic": geo},
                          outfolder=str(tmp_path / "joint_rect"),
                          sampler_params=SMCParams(n_chains=64, n_steps=30,
                                                   seed=11))
        q_tr, _ = problem.sample()
        est = problem.ordering.to_point(q_tr[-1].mean(axis=0))
        assert abs(est["slip"] - TRUE_SLIP) < 0.2
        m0_est = MU_TABLE * TRUE["length"] * TRUE["width"] * float(est["slip"])
        m0_true = MU_TABLE * TRUE["length"] * TRUE["width"] * TRUE_SLIP
        assert abs(moment_to_magnitude(m0_est)
                   - moment_to_magnitude(m0_true)) < 0.1


class TestPointCatalogSources:
    def test_clvd_informative(self, table):
        """CLVDSource is dispatched and its orientation matters."""
        wavemap = make_wavemap(table, seed=6)
        c1 = SeismicGeometryComposite(
            [wavemap], [CLVDSource(depth=9e3, azimuth=0.0, dip=90.0,
                                   magnitude=5.8, duration=1.5)])
        c2 = SeismicGeometryComposite(
            [wavemap], [CLVDSource(depth=9e3, azimuth=60.0, dip=20.0,
                                   magnitude=5.8, duration=1.5)])
        w1 = np.asarray(c1.synthetics_windows({"duration": jnp.asarray(1.5)}, 0))
        w2 = np.asarray(c2.synthetics_windows({"duration": jnp.asarray(1.5)}, 0))
        assert np.isfinite(w1).all() and np.abs(w1).max() > 0
        assert np.abs(w1 - w2).max() > 0.2 * np.abs(w1).max()

    def test_double_dc_limits(self, table):
        """DoubleDC with mix=0 and zero offsets equals the single DC with
        the full moment; with separation/delay it differs."""
        wavemap = make_wavemap(table, seed=8)
        sdr = dict(strike1=40.0, dip1=55.0, rake1=20.0,
                   strike2=120.0, dip2=30.0, rake2=-40.0)
        ddc0 = DoubleDCSource(depth=9e3, magnitude=5.8, mix=0.0,
                              distance=0.0, delta_time=0.0, duration=1.5, **sdr)
        dc = DCSource(depth=9e3, magnitude=5.8, strike=40.0, dip=55.0,
                      rake=20.0, duration=1.5)
        c_ddc = SeismicGeometryComposite([wavemap], [ddc0])
        c_dc = SeismicGeometryComposite([wavemap], [dc])
        pt = {"duration": jnp.asarray(1.5)}
        w_ddc = np.asarray(c_ddc.synthetics_windows(pt, 0))
        w_dc = np.asarray(c_dc.synthetics_windows(pt, 0))
        np.testing.assert_allclose(w_ddc, w_dc, atol=1e-4 * np.abs(w_dc).max())

        ddc_sep = DoubleDCSource(depth=9e3, magnitude=5.8, mix=0.5,
                                 distance=20e3, delta_time=4.0,
                                 duration=1.5, **sdr)
        w_sep = np.asarray(SeismicGeometryComposite(
            [wavemap], [ddc_sep]).synthetics_windows(pt, 0))
        assert np.abs(w_sep - w_dc).max() > 0.2 * np.abs(w_dc).max()

    def test_geodetic_clvd_and_doubledc_statics(self):
        """CLVD / DoubleDC statics dispatch through the MT eigen-crack
        path in the geodetic composite (reference: any MT-family source
        has pscmp statics)."""
        from beat_tpu.covariance import Covariance
        from beat_tpu.heart.geodesy import GeodeticDataset
        from beat_tpu.models.geodetic import GeodeticGeometryComposite

        rng = np.random.default_rng(3)
        e = np.linspace(-10e3, 10e3, 6)
        coords = np.stack(np.meshgrid(e, e), -1).reshape(-1, 2)
        los = np.tile([0.0, 0.0, 1.0], (coords.shape[0], 1))
        obs = rng.normal(0, 0.01, coords.shape[0])
        ds = GeodeticDataset(name="s", typ="SAR", coords=coords,
                             displacement=obs, los_vector=los,
                             covariance=Covariance(data=np.eye(obs.size) * 1e-4))
        for src in (CLVDSource(depth=4e3, azimuth=30.0, dip=45.0, magnitude=5.5),
                    DoubleDCSource(depth=4e3, magnitude=5.5, strike1=10.0,
                                   dip1=80.0, rake1=5.0, strike2=100.0,
                                   dip2=45.0, rake2=90.0, mix=0.3)):
            comp = GeodeticGeometryComposite([ds], [src])
            synth = np.asarray(comp.synthetics_los({}))
            assert np.isfinite(synth).all() and np.abs(synth).max() > 0


    def test_geodetic_doubledc_statics_separated(self):
        """DoubleDC statics honor the sampled separation: with
        distance >> 0 the field differs from the co-located m1+m2 sum
        and equals two single-DC syntheses superposed at +-distance/2
        along azimuth (+delta_depth for the second couple) — mirroring
        the seismic branch (reference: pyrocko DoubleDCSource
        discretizes into two offset point DCs for every engine)."""
        from beat_tpu.covariance import Covariance
        from beat_tpu.heart.geodesy import GeodeticDataset
        from beat_tpu.models.geodetic import GeodeticGeometryComposite
        from beat_tpu.sources import moment_to_magnitude

        e = np.linspace(-15e3, 15e3, 7)
        coords = np.stack(np.meshgrid(e, e), -1).reshape(-1, 2)
        los = np.tile([0.3, -0.1, 0.9], (coords.shape[0], 1))
        los /= np.linalg.norm(los, axis=1, keepdims=True)
        ds = GeodeticDataset(
            name="s", typ="SAR", coords=coords,
            displacement=np.zeros(coords.shape[0]), los_vector=los,
            covariance=Covariance(data=np.eye(coords.shape[0]) * 1e-4))

        mag, mix, dist, az, ddepth = 5.5, 0.3, 12e3, 35.0, 2e3
        sdr = dict(strike1=10.0, dip1=80.0, rake1=5.0,
                   strike2=100.0, dip2=45.0, rake2=90.0)
        ddc = DoubleDCSource(depth=6e3, magnitude=mag, mix=mix,
                             distance=dist, azimuth=az,
                             delta_depth=ddepth, **sdr)
        u_sep = np.asarray(GeodeticGeometryComposite(
            [ds], [ddc]).synthetics_los({}))

        ddc0 = DoubleDCSource(depth=6e3, magnitude=mag, mix=mix,
                              distance=0.0, azimuth=az, delta_depth=0.0,
                              **sdr)
        u_coloc = np.asarray(GeodeticGeometryComposite(
            [ds], [ddc0]).synthetics_los({}))
        assert np.abs(u_sep - u_coloc).max() > 0.1 * np.abs(u_coloc).max()

        m0 = magnitude_to_moment(mag)
        de = dist / 2.0 * np.sin(np.deg2rad(az))
        dn = dist / 2.0 * np.cos(np.deg2rad(az))
        dc1 = DCSource(east_shift=-de, north_shift=-dn, depth=6e3,
                       magnitude=moment_to_magnitude((1.0 - mix) * m0),
                       strike=sdr["strike1"], dip=sdr["dip1"],
                       rake=sdr["rake1"])
        dc2 = DCSource(east_shift=de, north_shift=dn, depth=6e3 + ddepth,
                       magnitude=moment_to_magnitude(mix * m0),
                       strike=sdr["strike2"], dip=sdr["dip2"],
                       rake=sdr["rake2"])
        u_pair = (np.asarray(GeodeticGeometryComposite([ds], [dc1])
                             .synthetics_los({}))
                  + np.asarray(GeodeticGeometryComposite([ds], [dc2])
                               .synthetics_los({})))
        # f32 compute path: superposition exact up to float32 accumulation
        np.testing.assert_allclose(u_sep, u_pair,
                                   atol=1e-4 * np.abs(u_pair).max())


class TestRingfault:
    def test_sub_sources_geometry(self):
        from beat_tpu.sources import RingfaultSource

        src = RingfaultSource(depth=2e3, diameter=2000.0, magnitude=5.0,
                              npointsources=16)
        m6s, de, dn, dz = src.sub_sources()
        assert m6s.shape == (16, 6)
        # full-ring moment tensors cancel (tangent DCs around the circle)
        net = np.asarray(src.m6())
        assert np.abs(net).max() < 1e-3 * magnitude_to_moment(5.0)
        np.testing.assert_allclose(np.sqrt(np.asarray(de)**2
                                           + np.asarray(dn)**2),
                                   1000.0, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(dz), 0.0, atol=1e-3)
        # tilted ring picks up depth offsets
        tilted = RingfaultSource(depth=2e3, diameter=2000.0, dip=30.0,
                                 strike=0.0, npointsources=4)
        _, de2, _, dz2 = tilted.sub_sources()
        np.testing.assert_allclose(np.asarray(dz2),
                                   [0.0, 500.0, 0.0, -500.0], atol=1.0)

    def test_waveforms_informative(self, table):
        """Ringfault is dispatched in the seismic composite; collapse
        sign and diameter change the wavefield."""
        from beat_tpu.sources import RingfaultSource

        wavemap = make_wavemap(table, seed=9)
        pt = {"duration": jnp.asarray(1.5)}

        def windows(**kw):
            comp = SeismicGeometryComposite(
                [wavemap], [RingfaultSource(depth=9e3, magnitude=5.8,
                                            duration=1.5, **kw)])
            return np.asarray(comp.synthetics_windows(pt, 0))

        w = windows(diameter=2000.0, sign=1.0)
        assert np.isfinite(w).all() and np.abs(w).max() > 0
        w_flip = windows(diameter=2000.0, sign=-1.0)
        np.testing.assert_allclose(w_flip, -w, atol=1e-5 * np.abs(w).max())
        w_big = windows(diameter=8000.0, sign=1.0)
        assert np.abs(w_big - w).max() > 0.2 * np.abs(w).max()

    def test_geodetic_statics_caldera(self):
        """Collapse ring (sign=+1) subsides the caldera floor."""
        from beat_tpu.covariance import Covariance
        from beat_tpu.heart.geodesy import GeodeticDataset
        from beat_tpu.models.geodetic import GeodeticGeometryComposite
        from beat_tpu.sources import RingfaultSource

        e = np.linspace(-6e3, 6e3, 13)
        coords = np.stack(np.meshgrid(e, e), -1).reshape(-1, 2)
        los = np.tile([0.0, 0.0, 1.0], (coords.shape[0], 1))  # vertical LOS
        ds = GeodeticDataset(name="c", typ="SAR", coords=coords,
                             displacement=np.zeros(coords.shape[0]),
                             los_vector=los,
                             covariance=Covariance(
                                 data=np.eye(coords.shape[0]) * 1e-4))
        comp = GeodeticGeometryComposite(
            [ds], [RingfaultSource(depth=1.5e3, diameter=4000.0,
                                   magnitude=5.5, sign=1.0,
                                   npointsources=16)])
        uz = np.asarray(comp.synthetics_los({}))
        r = np.sqrt((coords**2).sum(1))
        inner = uz[r < 1.2e3].mean()
        outer = np.abs(uz[r > 5e3]).mean()
        assert np.isfinite(uz).all()
        assert inner < 0, "caldera floor should subside for sign=+1"
        assert abs(inner) > 3 * outer, "subsidence should focus inside the ring"


class TestDiscretizationConvergence:
    """Convergence guard for the fixed finite-source grid (reference:
    pyrocko auto-discretizes wavelength-aware inside ``engine.process``,
    ``beat/heart.py:3564``; our chain-invariant grids need the config
    warned instead)."""

    def _waves(self, table, src, filt, n):
        from beat_tpu.models.seismic import (finite_rectangular_spectra,
                                             point_getter)

        rng = np.random.default_rng(0)
        n_st = 6
        az = np.linspace(0, 2 * np.pi, n_st, endpoint=False) + 0.15
        dist = rng.uniform(40e3, 100e3, n_st)
        get = point_getter(src, {}, 0, 1)
        spec = finite_rectangular_spectra(
            table, get, jnp.asarray(dist * np.sin(az)),
            jnp.asarray(dist * np.cos(az)),
            jnp.asarray([0] * n_st, dtype=jnp.int32), "HalfSinusoid",
            filt, n_patches=(n, n))
        return np.asarray(table.to_time_domain(spec))

    @pytest.mark.slow
    def test_recommended_grid_converges(self, table):
        """Sweep the patch grid for a large fault at the highest filter
        corner: by the recommended count the waveform change between a
        grid and its refinement is below the 3 % sampler-noise scale,
        while the default 4x4 is demonstrably unconverged."""
        from beat_tpu.heart.taper import Filter
        from beat_tpu.models.seismic import recommended_finite_patches
        from beat_tpu.ops.cplx import from_np_complex

        fmax = 0.5
        src = RectangularSource(depth=8e3, strike=30.0, dip=60.0,
                                rake=-90.0, length=24e3, width=8e3,
                                slip=1.5, duration=1.5, velocity=2800.0,
                                nucleation_x=-0.8, nucleation_y=-0.5)
        filt = jnp.asarray(from_np_complex(
            Filter(0.02, fmax, 3).response(table.nt, table.dt)))

        n_rec = recommended_finite_patches(src.length, src.width, fmax,
                                           velocity=src.velocity)
        assert n_rec == (18, 6)

        ref = self._waves(table, src, filt, 36)       # oversampled truth
        scale = np.abs(ref).max()

        def err(n):
            return np.max(np.abs(self._waves(table, src, filt, n) - ref)) / scale

        e4, e9, e18 = err(4), err(9), err(18)
        assert e4 > 0.05, f"4x4 unexpectedly converged ({e4:.3f})"
        assert e9 < e4
        assert e18 < 0.03, f"recommended grid not converged ({e18:.3f})"

    def test_config_warns_on_coarse_grid(self, caplog):
        import logging

        from beat_tpu.config import (ProblemConfig, WaveformFitConfig,
                                     _warn_coarse_finite_grid)
        from beat_tpu.parameter import Parameter, PriorSet

        pc = ProblemConfig(source_types=["RectangularSource"],
                           datatypes=["seismic"])
        pc.set_decimation_factors()          # seismic default: 2 -> 4x4
        priors = PriorSet()
        priors.add(Parameter("length", [1e3], [24e3]))
        priors.add(Parameter("width", [1e3], [8e3]))
        priors.add(Parameter("velocity", [2800.0], [3600.0]))

        class _SC:
            waveforms = [WaveformFitConfig()]

        _SC.waveforms[0].filterer.upper_corner = 0.5

        with caplog.at_level(logging.WARNING, "beat_tpu.config"):
            _warn_coarse_finite_grid(pc, priors, _SC)
        assert any("under-resolves" in r.message for r in caplog.records)

        # fine grid or low corner: silence
        caplog.clear()
        _SC.waveforms[0].filterer.upper_corner = 0.02
        with caplog.at_level(logging.WARNING, "beat_tpu.config"):
            _warn_coarse_finite_grid(pc, priors, _SC)
        assert not caplog.records

    def test_config_warns_on_coarse_grid_with_fixed_geometry(self, caplog):
        """Fixed length/width (lower == upper — the common FFI-prep
        setup) are skipped from the prior set; the guard must read them
        from get_fixed_params instead of defaulting the fault to 0."""
        import logging

        from beat_tpu.config import (ProblemConfig, WaveformFitConfig,
                                     _warn_coarse_finite_grid)
        from beat_tpu.parameter import PriorSet

        pc = ProblemConfig(source_types=["RectangularSource"],
                           datatypes=["seismic"])
        pc.set_decimation_factors()
        # km config units: 40 x 15 km fault, fixed
        pc.priors["length"] = dict(name="length", lower=[40.0],
                                   upper=[40.0], testvalue=[40.0])
        pc.priors["width"] = dict(name="width", lower=[15.0],
                                  upper=[15.0], testvalue=[15.0])
        priors = PriorSet()   # fixed params never reach the prior set

        class _SC:
            waveforms = [WaveformFitConfig()]

        _SC.waveforms[0].filterer.upper_corner = 0.5
        with caplog.at_level(logging.WARNING, "beat_tpu.config"):
            _warn_coarse_finite_grid(pc, priors, _SC)
        assert any("under-resolves" in r.message for r in caplog.records)

    def test_config_guard_handles_filter_chains_and_frequency(self, caplog):
        """The guard must survive the list-of-filters config form and
        read a frequency filter's real passband edge (freqlimits[2]),
        not the meaningless default upper_corner; a bandstop member
        bounds nothing."""
        import logging

        from beat_tpu.config import (FilterConfig, ProblemConfig,
                                     WaveformFitConfig,
                                     _warn_coarse_finite_grid)
        from beat_tpu.parameter import Parameter, PriorSet

        pc = ProblemConfig(source_types=["RectangularSource"],
                           datatypes=["seismic"])
        pc.set_decimation_factors()
        priors = PriorSet()
        priors.add(Parameter("length", [1e3], [24e3]))
        priors.add(Parameter("width", [1e3], [8e3]))
        priors.add(Parameter("velocity", [2800.0], [3600.0]))

        class _SC:
            waveforms = [WaveformFitConfig()]

        # list form: [bandstop, frequency(0.4 Hz passband edge)] — must
        # not crash, and must warn off the 0.4 Hz edge
        _SC.waveforms[0].filterer = [
            FilterConfig(type="bandstop", lower_corner=0.1,
                         upper_corner=0.2),
            FilterConfig(type="frequency",
                         freqlimits=(0.005, 0.01, 0.4, 0.5)),
        ]
        with caplog.at_level(logging.WARNING, "beat_tpu.config"):
            _warn_coarse_finite_grid(pc, priors, _SC)
        assert any("under-resolves" in r.message for r in caplog.records)

        # a bandstop alone bounds nothing -> no corner -> silence
        caplog.clear()
        _SC.waveforms[0].filterer = FilterConfig(
            type="bandstop", lower_corner=0.1, upper_corner=5.0)
        with caplog.at_level(logging.WARNING, "beat_tpu.config"):
            _warn_coarse_finite_grid(pc, priors, _SC)
        assert not caplog.records
