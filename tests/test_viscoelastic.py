"""Viscoelastic (time-dependent) layered statics — the psgrn time axis.

Reference capability: psgrn computes time-dependent deformation for
layered Burgers rheologies; BEAT's GeodeticGFConfig carries the 1/day
``sample_rate`` for it (``/root/reference/beat/config.py:325-348``).
Validation strategy: the correspondence-principle pipeline must
reproduce *independently built elastic tables* in the unrelaxed (t→0)
and relaxed (t→∞) limits — both limits go through completely different
code paths (direct elastic build vs Stehfest sums over s-interpolated
effective models).
"""

import os

import numpy as np
import pytest

from beat_tpu.heart.statictable import StaticGFTable, build_static_table
from beat_tpu.heart.velocity_model import LayeredModel
from beat_tpu.heart.viscoelastic import (
    DAY, BurgersRheology, EpochStaticGFTable, TimeDependentStaticGFTable,
    build_viscoelastic_static_table, effective_model, stehfest_invert,
    stehfest_weights)

DISTANCES = np.linspace(5e3, 40e3, 5)
DEPTHS = np.linspace(2e3, 8e3, 3)


def two_layer_model():
    return LayeredModel(tops=np.array([0.0, 10e3]),
                        vp=np.array([5500.0, 6500.0]),
                        vs=np.array([3200.0, 3800.0]),
                        rho=np.array([2600.0, 2900.0]), name="2l")


class TestStehfest:
    def test_weights_sum(self):
        # Σ Vₖ = 0 and Σ k·Vₖ relations hold for the Stehfest family;
        # the basic sanity is exact inversion of simple transforms.
        v = stehfest_weights(12)
        assert v.size == 12
        assert abs(v.sum()) < 1e-4 * np.abs(v).max()

    def test_exponential_decay(self):
        # pure decay toward zero is Stehfest's hardest well-behaved
        # case (the answer vanishes); ~0.5 % is the N=16 float64 floor
        a = 0.37
        for t in (0.5, 2.0, 7.0):
            u = stehfest_invert(lambda s: 1.0 / (s + a), t)
            assert u == pytest.approx(np.exp(-a * t), rel=5e-3)

    def test_relaxation_step(self):
        # F(s) = (c∞ + Δ·sτ/(1+sτ))/s  ↔  c∞ + Δ·e^{-t/τ} — the exact
        # shape of every SLS table entry
        tau, cinf, dlt = 3.0, 1.4, -0.6
        for t in (0.3, 3.0, 30.0):
            u = stehfest_invert(
                lambda s: (cinf + dlt * s * tau / (1 + s * tau)) / s, t)
            assert u == pytest.approx(cinf + dlt * np.exp(-t / tau), rel=1e-4)

    def test_array_valued(self):
        a = np.array([0.1, 1.0, 5.0])
        u = stehfest_invert(lambda s: 1.0 / (s + a), 1.5)
        np.testing.assert_allclose(u, np.exp(-a * 1.5), rtol=2e-2)


class TestRheology:
    def test_elastic_flag(self):
        r = BurgersRheology.elastic(3)
        assert r.is_elastic
        mu = np.array([30e9, 40e9, 50e9])
        np.testing.assert_allclose(r.mu_of_s(mu, 1e-9), mu)
        np.testing.assert_allclose(r.mu_of_s(mu, 1e9), mu)

    def test_maxwell_limits(self):
        mu = np.array([30e9])
        r = BurgersRheology(eta1=[0.0], eta2=[1e18], alpha=[1.0])
        tau = 1e18 / 30e9
        # unrelaxed: s >> 1/tau
        assert r.mu_of_s(mu, 1e4 / tau)[0] == pytest.approx(30e9, rel=1e-3)
        # relaxed: mu -> 0
        assert r.mu_of_s(mu, 1e-4 / tau)[0] == pytest.approx(
            30e9 * 1e-4, rel=1e-3)

    def test_sls_relaxed_modulus_is_alpha_mu(self):
        # psgrn's alpha = relaxed/unrelaxed shear-modulus ratio
        mu = np.array([30e9])
        r = BurgersRheology(eta1=[1e17], eta2=[0.0], alpha=[0.6])
        assert r.mu_of_s(mu, 1e-12)[0] == pytest.approx(0.6 * 30e9, rel=1e-6)
        assert r.mu_of_s(mu, 1e12)[0] == pytest.approx(30e9, rel=1e-6)

    def test_effective_model_keeps_bulk(self):
        m = two_layer_model()
        r = BurgersRheology(eta1=[0, 1e17], eta2=[0, 0], alpha=[1.0, 0.5])
        em = effective_model(m, r, s=1e-20)
        k0 = m.rho * (m.vp**2 - 4 * m.vs**2 / 3)
        k1 = em.rho * (em.vp**2 - 4 * em.vs**2 / 3)
        np.testing.assert_allclose(k1, k0, rtol=1e-12)
        # layer 0 elastic: untouched
        assert em.vs[0] == pytest.approx(m.vs[0])
        # layer 1 relaxed: mu -> alpha*mu
        assert em.vs[1]**2 == pytest.approx(0.5 * m.vs[1]**2, rel=1e-9)


class TestTableLimits:
    """The Stehfest pipeline against independently built elastic tables."""

    def test_elastic_rheology_time_invariant(self):
        m = two_layer_model()
        tt = build_viscoelastic_static_table(
            m, BurgersRheology.elastic(2), DISTANCES, DEPTHS,
            times=[0.0, 30 * DAY, 300 * DAY])
        base = np.asarray(build_static_table(m, DISTANCES, DEPTHS).values)
        for it in range(3):
            np.testing.assert_allclose(tt.values[it], base, rtol=2e-6,
                                       atol=1e-9 * np.abs(base).max())

    @pytest.mark.slow
    def test_sls_unrelaxed_and_relaxed_limits(self):
        # Kelvin transient in the HALFSPACE layer (lid stays elastic):
        # t << tau must match the unrelaxed elastic table, t >> tau the
        # table built on the relaxed model (mu -> alpha*mu, same bulk K)
        m = two_layer_model()
        alpha = 0.55
        eta1 = 5e16
        mu_u = m.rho[1] * m.vs[1]**2
        mu1 = alpha * mu_u / (1 - alpha)
        tau_kelvin = eta1 / mu1                       # ~ 0.67 day
        rheo = BurgersRheology(eta1=[0.0, eta1], eta2=[0.0, 0.0],
                               alpha=[1.0, alpha])
        times = [tau_kelvin * 1e-3, tau_kelvin * 300.0]
        tt = build_viscoelastic_static_table(
            m, rheo, DISTANCES, DEPTHS, times=times, s_per_decade=8)

        unrelaxed = np.asarray(build_static_table(m, DISTANCES, DEPTHS).values)
        relaxed_model = effective_model(m, rheo, s=1e-30)
        relaxed = np.asarray(
            build_static_table(relaxed_model, DISTANCES, DEPTHS).values)
        # the two limits genuinely differ — the test has teeth
        scale = np.abs(unrelaxed).max()
        assert np.abs(relaxed - unrelaxed).max() > 0.02 * scale

        np.testing.assert_allclose(np.asarray(tt.at_time(times[0]).values),
                                   unrelaxed, atol=2e-3 * scale)
        np.testing.assert_allclose(np.asarray(tt.at_time(times[1]).values),
                                   relaxed, atol=2e-3 * scale)

    @pytest.mark.slow
    def test_maxwell_halfspace_matches_analytic_ground_truth(self):
        """Full pipeline vs an INDEPENDENT exact solution.

        For a homogeneous Maxwell halfspace the analytic Okada/MT
        surface solution depends on the moduli analytically, so the
        Laplace transform û(s) = u_okada(ν(s), µ(s))/s is exactly
        evaluable and Gaver–Stehfest converges (float64 under
        ``jax.enable_x64`` — the weights amplify noise by ~10⁵, which
        exact analytic evaluations survive but sampled solver data do
        not).  The pipeline (real-s propagator solves → weighted
        secular-Prony fit → analytic reconstruction) must match this
        ground truth at every epoch; without the secular creep mode it
        errs by >90 % at t ≥ τ/2 (Maxwell creep is a 1/s pole no
        bounded Prony mixture can represent).
        """
        import jax
        import jax.numpy as jnp

        from beat_tpu.heart.okada import mt_surface_displacement
        from beat_tpu.heart.viscoelastic import stehfest_invert
        from beat_tpu.sources import sdr_to_m6

        vp, vs, rho = 6000.0, 3464.0, 2700.0
        mu_u = rho * vs**2
        lam_u = rho * (vp**2 - 2 * vs**2)
        bulk = lam_u + 2 * mu_u / 3
        homo = LayeredModel.homogeneous(vp=vp, vs=vs, rho=rho)
        eta = 1e17
        tau = eta / mu_u
        rheo = BurgersRheology(eta1=[0.0], eta2=[eta], alpha=[1.0])
        times = [0.0, 0.5 * tau, 2.0 * tau]
        tt = build_viscoelastic_static_table(
            homo, rheo, np.linspace(1e3, 50e3, 50),
            np.linspace(3e3, 9e3, 4), times=times)
        assert tt.prony is not None and tt.prony.max_resid < 5e-3

        m6 = np.asarray(sdr_to_m6(40.0, 55.0, 20.0, 1e17), np.float64)
        obs_e = np.array([5e3, -12e3, 20e3, 3e3])
        obs_n = np.array([8e3, 4e3, -15e3, -25e3])
        coords = np.stack([obs_e, obs_n], axis=-1)
        depth = 6e3

        with jax.enable_x64():
            el = jax.jit(lambda nu, mu: mt_surface_displacement(
                jnp.asarray(coords, jnp.float64), jnp.asarray(m6, jnp.float64),
                depth=depth, nu=nu, shear_modulus=mu))

            def F(s):
                mu_s = mu_u * (s * tau) / (1.0 + s * tau)
                lam_s = bulk - 2.0 * mu_s / 3.0
                nu_s = lam_s / (2.0 * (lam_s + mu_s))
                return np.asarray(el(nu_s, mu_s)) / s

            for t in times[1:]:
                u_gt = stehfest_invert(F, t, n=14)
                # the ground truth itself must be converged
                u_chk = stehfest_invert(F, t, n=12)
                assert np.abs(u_gt - u_chk).max() < 1e-3 * np.abs(u_gt).max()
                u_tab = np.asarray(tt.at_time(t).synthesize_enu(
                    jnp.asarray(m6), 0.0, 0.0, jnp.asarray(depth),
                    jnp.asarray(obs_e), jnp.asarray(obs_n)))
                rel = np.abs(u_tab - u_gt).max() / np.abs(u_gt).max()
                # budget: ~3 % table gather/solver-vs-okada + ~0.1 % fit
                assert rel < 5e-2, (t / tau, rel)

    @pytest.mark.slow
    def test_maxwell_postseismic_transient(self):
        # elastic lid over a Maxwell halfspace: t=0 equals the elastic
        # table exactly and the transient drift is significant (full
        # amplitude validation lives in the halfspace ground-truth test
        # above — layered Maxwell responses are legitimately
        # NON-monotone per component, so no monotonicity is asserted)
        m = two_layer_model()
        eta2 = 1e17
        tau = eta2 / (m.rho[1] * m.vs[1]**2)
        rheo = BurgersRheology(eta1=[0.0, 0.0], eta2=[0.0, eta2],
                               alpha=[1.0, 1.0])
        times = [0.0, tau, 5 * tau, 25 * tau]
        tt = build_viscoelastic_static_table(
            m, rheo, DISTANCES, DEPTHS, times=times)
        unrelaxed = np.asarray(build_static_table(m, DISTANCES, DEPTHS).values)
        np.testing.assert_allclose(tt.values[0], unrelaxed, rtol=2e-6,
                                   atol=1e-9 * np.abs(unrelaxed).max())
        drift = np.abs(tt.values[-1] - tt.values[0])
        assert drift.max() > 0.05 * np.abs(unrelaxed).max()
        # the stored snapshots are the analytic Prony reconstruction
        for it, t in enumerate(times[1:], start=1):
            np.testing.assert_allclose(
                tt.values[it], tt.prony.at_time(t).astype(np.float32),
                rtol=1e-5, atol=1e-6 * np.abs(unrelaxed).max())


class TestEpochTable:
    def _time_table(self):
        vals = np.zeros((3, 6, 3, DISTANCES.size, DEPTHS.size), np.float32)
        for it in range(3):
            vals[it] = (it + 1.0)
        return TimeDependentStaticGFTable(
            values=vals, times=np.array([0.0, 10 * DAY, 100 * DAY]),
            distances=DISTANCES, depths=DEPTHS,
            mu_tops=np.array([0.0]), mus=np.array([30e9]),
            lams=np.array([30e9]))

    def test_at_time_interpolates_and_clamps(self):
        tt = self._time_table()
        assert float(np.asarray(tt.at_time(0.0).values).mean()) == 1.0
        assert float(np.asarray(tt.at_time(5 * DAY).values).mean()) == 1.5
        assert float(np.asarray(tt.at_time(1e9 * DAY).values).mean()) == 3.0
        assert float(np.asarray(tt.at_time(None).values).mean()) == 1.0

    def test_epoch_gather_matches_per_epoch_tables(self):
        rng = np.random.default_rng(7)
        tt = self._time_table()
        tt.values += rng.normal(size=tt.values.shape).astype(np.float32)
        obs_times = [0.0, 55 * DAY, 0.0, 10 * DAY]
        ep = EpochStaticGFTable.from_time_table(tt, obs_times)
        dist = np.array([7e3, 12e3, 30e3, 38e3])
        depth = 4.3e3
        got = np.asarray(ep.gather(dist, depth))
        for i, t in enumerate(obs_times):
            want = np.asarray(tt.at_time(t).gather(dist[i:i + 1], depth))[0]
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-7)

    def test_epoch_table_roundtrips_as_pytree(self):
        import jax

        tt = self._time_table()
        ep = EpochStaticGFTable.from_time_table(tt, [0.0, 10 * DAY])
        leaves, tdef = jax.tree_util.tree_flatten(ep)
        back = jax.tree_util.tree_unflatten(tdef, leaves)
        assert isinstance(back, EpochStaticGFTable)
        np.testing.assert_array_equal(np.asarray(back.epoch_idx),
                                      np.asarray(ep.epoch_idx))

    def test_builder_always_carries_the_coseismic_epoch(self):
        """Even when only post-event epochs are requested, the table
        must carry the exact t=0 snapshot and at_time(0/None) must
        return the UNRELAXED field — a co-seismic dataset sharing the
        table must never silently read a relaxed field."""
        m = two_layer_model()
        eta2 = 1e17
        tau = eta2 / (m.rho[1] * m.vs[1]**2)
        rheo = BurgersRheology(eta1=[0.0, 0.0], eta2=[0.0, eta2],
                               alpha=[1.0, 1.0])
        tt = build_viscoelastic_static_table(
            m, rheo, DISTANCES, DEPTHS, times=[25 * tau])   # no 0 given
        assert tt.times[0] == 0.0
        unrelaxed = np.asarray(build_static_table(m, DISTANCES, DEPTHS).values)
        for t in (0.0, None):
            np.testing.assert_allclose(
                np.asarray(tt.at_time(t).values), unrelaxed, rtol=2e-6,
                atol=1e-9 * np.abs(unrelaxed).max())
        # prony covers arbitrary epochs including ones between snapshots
        mid = np.asarray(tt.at_time(3 * tau).values)
        assert np.abs(mid - unrelaxed).max() > 0.005 * np.abs(unrelaxed).max()

    def test_save_load_keeps_prony(self, tmp_path):
        m = two_layer_model()
        rheo = BurgersRheology(eta1=[0.0, 0.0], eta2=[0.0, 1e17],
                               alpha=[1.0, 1.0])
        tau = 1e17 / (m.rho[1] * m.vs[1]**2)
        tt = build_viscoelastic_static_table(
            m, rheo, DISTANCES, DEPTHS, times=[0.0, tau])
        p = str(tmp_path / "visco.npz")
        tt.save(p)
        back = TimeDependentStaticGFTable.load(p)
        assert back.prony is not None
        # arbitrary-epoch evaluation (between snapshots) survives the
        # round trip exactly
        t_mid = 0.37 * tau
        np.testing.assert_allclose(
            np.asarray(back.at_time(t_mid).values),
            np.asarray(tt.at_time(t_mid).values), rtol=1e-6)


class TestProblemIntegration:
    """Acquisition epochs drive the geodetic composite end-to-end
    (reference capability: pscmp evaluates scenes at their epochs on the
    psgrn time axis, ``/root/reference/beat/config.py:325-348``)."""

    @pytest.mark.slow
    def test_epoch_table_drives_the_composite(self, tmp_path):
        import jax.numpy as jnp

        from beat_tpu.config import (init_config, load_config,
                                     problem_from_config,
                                     save_geodetic_datasets)
        from beat_tpu.covariance import Covariance
        from beat_tpu.heart.geodesy import GeodeticDataset

        pdir = str(tmp_path / "visco_proj")
        init_config("visco_proj", pdir, source_types=("MTSource",),
                    n_sources=(1,), datatypes=("geodetic",))

        g = 6
        e = np.linspace(-10e3, 10e3, g)
        coords = np.stack(np.meshgrid(e, e), -1).reshape(-1, 2)
        los = np.tile([-0.6, 0.1, 0.79], (coords.shape[0], 1))
        los /= np.linalg.norm(los, axis=1, keepdims=True)
        cov = Covariance(data=np.eye(coords.shape[0]) * 1e-6)

        def scene(name, time):
            return GeodeticDataset(
                name=name, typ="SAR", coords=coords,
                displacement=np.zeros(coords.shape[0]),
                los_vector=los, covariance=cov, time=time)

        save_geodetic_datasets(
            [scene("coseis", None), scene("postseis", 200.0 * DAY)], pdir)

        m = two_layer_model()
        eta2 = 1e17
        rheo = BurgersRheology(eta1=[0.0, 0.0], eta2=[0.0, eta2],
                               alpha=[1.0, 1.0])
        tt = build_viscoelastic_static_table(
            m, rheo, np.linspace(1e3, 40e3, 40), np.linspace(1e3, 8e3, 4),
            times=[0.0, 200.0 * DAY])
        tt.save(os.path.join(pdir, "static_gf_table_visco.npz"))

        problem = problem_from_config(load_config(pdir), pdir)
        comp = problem.composites["geodetic"]
        assert isinstance(comp.static_table, EpochStaticGFTable)
        # first scene reads epoch 0, second epoch 200 d
        n = coords.shape[0]
        assert set(np.asarray(comp.static_table.epoch_idx[:n])) == {0}
        assert set(np.asarray(comp.static_table.epoch_idx[n:])) == {1}

        point = {k: jnp.asarray(v)
                 for k, v in problem.priors.test_point().items()
                 if k in comp.sources[0].__dataclass_fields__
                 or k in ("east_shift", "north_shift", "depth")}
        # a definite non-zero mechanism (prior midpoints are all-zero m6)
        point.update({k: jnp.asarray([v]) for k, v in zip(
            ("mnn", "mee", "mdd", "mne", "mnd", "med"),
            (0.6, -0.3, 0.9, 0.4, -0.2, 0.1))})
        point["magnitude"] = jnp.asarray([5.5])
        point["depth"] = jnp.asarray([3.0e3])
        synth = np.asarray(comp.synthetics_los_np(point))
        # against single-epoch plain tables swapped into the device data
        for i, t in enumerate((0.0, 200.0 * DAY)):
            comp._device["static_table"] = tt.at_time(t)
            ref = np.asarray(comp.synthetics_los_np(point))
            sl = slice(i * n, (i + 1) * n)
            np.testing.assert_allclose(synth[sl], ref[sl], rtol=1e-5,
                                       atol=1e-8 * np.abs(ref).max())
        # the two epochs genuinely differ (the transient has teeth)
        assert np.abs(synth[:n] - synth[n:]).max() \
            > 0.02 * np.abs(synth).max()


class TestInputValidation:
    def test_rheology_layer_count_must_match_model(self):
        m = two_layer_model()
        rheo = BurgersRheology(eta1=[0.0], eta2=[1e17], alpha=[1.0])
        with pytest.raises(ValueError, match="layers"):
            build_viscoelastic_static_table(m, rheo, DISTANCES, DEPTHS,
                                            times=[86400.0])

    def test_epoch_table_rejects_empty_observations(self):
        m = two_layer_model()
        rheo = BurgersRheology(eta1=[0.0, 0.0], eta2=[0.0, 1e17],
                               alpha=[1.0, 1.0])
        tt = build_viscoelastic_static_table(m, rheo, DISTANCES, DEPTHS,
                                             times=[86400.0])
        with pytest.raises(ValueError, match="at least one"):
            EpochStaticGFTable.from_time_table(tt, [])

    def test_problem_load_fails_loudly_without_visco_table(self, tmp_path):
        """Datasets carrying acquisition times (or a configured
        rheology) with no static_gf_table_visco.npz must refuse to
        load — the elastic fallback would silently invert post-seismic
        scenes with co-seismic GFs."""
        from beat_tpu.config import (init_config, load_config,
                                     problem_from_config,
                                     save_geodetic_datasets)
        from beat_tpu.covariance import Covariance
        from beat_tpu.heart.geodesy import GeodeticDataset

        pdir = str(tmp_path / "visco_missing")
        init_config("visco_missing", pdir, source_types=("MTSource",),
                    n_sources=(1,), datatypes=("geodetic",))
        coords = np.stack(np.meshgrid(np.linspace(-5e3, 5e3, 3),
                                      np.linspace(-5e3, 5e3, 3)),
                          -1).reshape(-1, 2)
        los = np.tile([-0.6, 0.1, 0.79], (coords.shape[0], 1))
        los /= np.linalg.norm(los, axis=1, keepdims=True)
        ds = GeodeticDataset(
            name="postseis", typ="SAR", coords=coords,
            displacement=np.zeros(coords.shape[0]), los_vector=los,
            covariance=Covariance(data=np.eye(coords.shape[0]) * 1e-6),
            time=200.0 * DAY)
        save_geodetic_datasets([ds], pdir)
        with pytest.raises(ValueError, match="static_gf_table_visco"):
            problem_from_config(load_config(pdir), pdir)
