"""
Kinematic FFI equivalence: the 5-D GF library stack must reproduce
direct per-patch synthesis (port of the reference's key equivalence test
``test/test_ffi_gfstacking.py``: stack_all vs seismosizer, rtol 5e-6 —
here vs the table forward, on-grid exact / off-grid within interpolation
tolerance), plus the kinematic distributer composite end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beat_tpu.ffi import discretize_sources, seis_construct_gf_linear
from beat_tpu.heart.gftable import build_homogeneous_table
from beat_tpu.heart.seismic import SeismicDataset, WaveformMapping
from beat_tpu.heart.taper import ArrivalTaper, Filter, stf_spectrum
from beat_tpu.models.distributer import SeismicDistributerComposite
from beat_tpu.models.laplacian import LaplacianDistributerComposite
from beat_tpu.sources import RectangularSource, sdr_to_m6


@pytest.fixture(scope="module")
def setup():
    table = build_homogeneous_table(
        distances=np.linspace(10e3, 80e3, 8),
        depths=np.linspace(1e3, 12e3, 6), nt=256, dt=0.25)

    rng = np.random.default_rng(0)
    n_st = 4
    az = np.linspace(0, 2 * np.pi, n_st, endpoint=False) + 0.4
    dist = rng.uniform(30e3, 60e3, n_st)
    st_e, st_n = dist * np.sin(az), dist * np.cos(az)
    datasets = [SeismicDataset(station=f"S{i}", channel="Z", east=st_e[i],
                               north=st_n[i], ydata=np.zeros(table.nt))
                for i in range(n_st)]
    wavemap = WaveformMapping(
        name="any_P", datasets=datasets, table=table,
        taper=ArrivalTaper(a=-2.0, b=-1.0, c=20.0, d=22.0),
        filterer=Filter(lower_corner=0.02, upper_corner=0.6, order=3))

    ref = RectangularSource(east_shift=0.0, north_shift=0.0, depth=3e3,
                            strike=20.0, dip=70.0, rake=0.0,
                            length=8e3, width=4e3)
    fault = discretize_sources([ref], patch_length=2e3, patch_width=2e3)

    lib = seis_construct_gf_linear(
        table, wavemap, fault, component="uparr",
        duration_bounds=(0.5, 2.0), duration_sampling=0.5,
        starttime_bounds=(0.0, 4.0), starttime_sampling=0.25)
    return table, wavemap, fault, lib


def direct_synthesis(table, wavemap, fault, slips, durations, starttimes):
    """Sum of per-patch point syntheses with given STFs and onsets."""
    from beat_tpu.sources import sdr_to_m6

    from beat_tpu.ops.cplx import from_np_complex

    filt = jnp.asarray(from_np_complex(wavemap.filter_response))
    total = 0.0
    for i, p in enumerate(fault.get_all_patches()):
        area = p.length * p.width
        m6 = jnp.asarray(sdr_to_m6(p.strike, p.dip, p.rake, 33e9 * area)) * slips[i]
        c = p.center()
        spec = table.synthesize_spectra(
            m6, c[0], c[1], jnp.asarray(c[2]), jnp.asarray(starttimes[i]),
            jnp.asarray(durations[i]),
            jnp.asarray(wavemap.station_east), jnp.asarray(wavemap.station_north),
            jnp.asarray(wavemap.comp_idx), "HalfSinusoid", filt)
        total = total + spec
    wins = table.synthesize_windows(
        total, jnp.asarray(wavemap.window_starts),
        jnp.asarray(wavemap.taper_window), wavemap.nsamples_win)
    return np.asarray(wins)


class TestKinematicEquivalence:
    def test_on_grid_nearest(self, setup):
        table, wavemap, fault, lib = setup
        rng = np.random.default_rng(1)
        n = fault.npatches
        slips = rng.uniform(0.2, 2.0, n)
        durations = np.full(n, 1.0)          # on-grid
        starttimes = np.round(rng.uniform(0, 3.5, n) * 4) / 4  # on-grid
        st = np.tile(starttimes, (wavemap.ntargets, 1))

        got = np.asarray(lib.stack_all(jnp.asarray(durations), jnp.asarray(st),
                                       jnp.asarray(slips), "nearest_neighbor"))
        want = direct_synthesis(table, wavemap, fault, slips, durations, starttimes)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got / scale, want / scale, atol=5e-5)

    def test_off_grid_multilinear_better_than_nearest(self, setup):
        table, wavemap, fault, lib = setup
        rng = np.random.default_rng(2)
        n = fault.npatches
        slips = rng.uniform(0.2, 2.0, n)
        durations = np.full(n, 1.0)
        starttimes = rng.uniform(0.1, 3.4, n)  # off grid
        st = np.tile(starttimes, (wavemap.ntargets, 1))

        want = direct_synthesis(table, wavemap, fault, slips, durations, starttimes)
        got_ml = np.asarray(lib.stack_all(jnp.asarray(durations), jnp.asarray(st),
                                          jnp.asarray(slips), "multilinear"))
        got_nn = np.asarray(lib.stack_all(jnp.asarray(durations), jnp.asarray(st),
                                          jnp.asarray(slips), "nearest_neighbor"))
        err_ml = np.abs(got_ml - want).max()
        err_nn = np.abs(got_nn - want).max()
        assert err_ml < err_nn
        scale = np.abs(want).max()
        assert err_ml / scale < 0.05


class TestKinematicComposite:
    def test_loglike_finite_and_informative(self, setup):
        table, wavemap, fault, lib = setup
        rng = np.random.default_rng(3)
        n = fault.npatches

        # make observed data from a known slip distribution
        true_slips = rng.uniform(0.5, 1.5, n)
        durations = np.full(n, 1.0)
        vels = np.full(n, 3000.0)  # m/s
        sf = fault.get_subfault(0)
        true_st = np.asarray(fault.point2starttimes(
            0, jnp.asarray(vels), 2e3, 1e3))
        synth = direct_synthesis(table, wavemap, fault, true_slips, durations, true_st)
        for i, ds in enumerate(wavemap.datasets):
            from beat_tpu.covariance import Covariance

            sd = 0.02 * np.abs(synth).max()
            ds.covariance = Covariance(
                data=np.eye(wavemap.nsamples_win) * sd**2)
        wavemap.data_windows = (synth + rng.normal(0, 0.02 * np.abs(synth).max(),
                                                   synth.shape)).astype(np.float32)

        comp = SeismicDistributerComposite(
            [(wavemap, {"uparr": lib})], fault, slip_varnames=("uparr",),
            interpolation="multilinear")
        point_true = {
            "uparr": jnp.asarray(true_slips),
            "durations": jnp.asarray(durations),
            "velocities": jnp.asarray(vels),
            "nucleation_strike": jnp.asarray(2e3),
            "nucleation_dip": jnp.asarray(1e3),
        }
        l_true = float(comp.loglike(point_true))
        assert np.isfinite(l_true)

        point_off = dict(point_true)
        point_off["uparr"] = jnp.asarray(true_slips * 2.5)
        assert l_true > float(comp.loglike(point_off))

        point_off2 = dict(point_true)
        point_off2["nucleation_strike"] = jnp.asarray(7e3)
        assert l_true > float(comp.loglike(point_off2))

    def test_spectrum_domain_wavemap(self, setup):
        """domain='spectrum' FFI: residuals/covariances live at
        nsamples_fit (rfft bins), synthetics are amplitude spectra —
        previously the composite mixed window-length residuals with
        fit-length weights and failed at trace time."""
        from beat_tpu.covariance import Covariance

        import copy

        table, wavemap, fault, lib = setup
        rng = np.random.default_rng(5)
        wm_s = WaveformMapping(
            name="any_P", datasets=copy.deepcopy(wavemap.datasets),
            table=table, taper=wavemap.taper, filterer=wavemap.filterer,
            domain="spectrum")
        for ds in wm_s.datasets:
            ds.covariance = Covariance(
                data=np.eye(wm_s.nsamples_fit) * 1e-4)

        comp = SeismicDistributerComposite(
            [(wm_s, {"uparr": lib})], fault, slip_varnames=("uparr",),
            interpolation="multilinear")
        n = fault.npatches
        point = {
            "uparr": jnp.asarray(rng.uniform(0.5, 1.5, n)),
            "durations": jnp.ones(n),
            "velocities": jnp.full(n, 3000.0),
            "nucleation_strike": jnp.asarray(2e3),
            "nucleation_dip": jnp.asarray(1e3),
        }
        l = float(comp.loglike(point))
        assert np.isfinite(l)
        synth = comp.synthetics_fit(point, 0)
        assert synth.shape == (wm_s.ntargets, wm_s.nsamples_fit)
        # amplitude spectra are non-negative
        assert float(jnp.min(synth)) >= 0.0

    def test_hp_specific_hypernames(self, setup):
        """dataset_specific_residual_noise_estimation: one hyper per
        target, honored by the likelihood (reference h_<wave>_<i>)."""
        table, wavemap, fault, lib = setup
        comp = SeismicDistributerComposite(
            [(wavemap, {"uparr": lib})], fault, slip_varnames=("uparr",),
            interpolation="multilinear", hp_specific=True)
        names = comp.get_hypernames()
        assert len(names) == wavemap.ntargets
        assert all(n.startswith(wavemap.hypername) for n in names)
        n = fault.npatches
        point = {
            "uparr": jnp.ones(n), "durations": jnp.ones(n),
            "velocities": jnp.full(n, 3000.0),
            "nucleation_strike": jnp.asarray(2e3),
            "nucleation_dip": jnp.asarray(1e3),
        }
        l0 = float(comp.loglike({**point, **{nm: jnp.asarray(0.0) for nm in names}}))
        l1 = float(comp.loglike({**point, names[0]: jnp.asarray(2.0),
                                 **{nm: jnp.asarray(0.0) for nm in names[1:]}}))
        assert l0 != l1  # the per-target hyper reaches the likelihood

    def test_laplacian_prior_prefers_smooth(self, setup):
        _, _, fault, _ = setup
        comp = LaplacianDistributerComposite(fault, slip_varnames=("uparr",))
        smooth = jnp.ones(fault.npatches)
        rough = jnp.asarray(np.random.default_rng(4).normal(1, 1, fault.npatches))
        h = {"h_laplacian": jnp.asarray(0.0)}
        l_smooth = float(comp.loglike({"uparr": smooth, **h}))
        l_rough = float(comp.loglike({"uparr": rough, **h}))
        assert l_smooth > l_rough
