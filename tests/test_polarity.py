"""Polarity forward + composite tests (reference ``test_heart.py``
radiation-weight checks + polarity composite intent)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beat_tpu.heart.polarity import (
    PolarityTarget,
    pol_synthetics,
    radiation_weights_p,
    radiation_weights_sh,
    radiation_weights_sv,
    straight_ray_takeoff,
    takeoff_vector,
)
from beat_tpu.models.polarity import PolarityComposite
from beat_tpu.mt_utils import radiation_amplitude
from beat_tpu.sources import DCSource, sdr_to_m6


class TestRadiationWeights:
    def test_p_weights_match_quadratic_form(self):
        rng = np.random.default_rng(0)
        m6 = rng.normal(size=6)
        az = jnp.asarray(rng.uniform(0, 2 * np.pi, 10))
        to = jnp.asarray(rng.uniform(0, np.pi, 10))
        g = takeoff_vector(az, to)
        amps = np.asarray(pol_synthetics(jnp.asarray(m6), radiation_weights_p(g)))
        want = radiation_amplitude(m6, np.asarray(g))
        np.testing.assert_allclose(amps, want, rtol=1e-5)

    def test_dc_nodal_planes(self):
        """P amplitude vanishes on the fault plane directions of a DC."""
        m6 = np.asarray(sdr_to_m6(0.0, 90.0, 0.0, 1.0))  # vertical N-S left-lateral
        # ray along the fault strike (north, horizontal) is nodal
        g_strike = jnp.asarray([[1.0, 0.0, 0.0]])
        amp = float(pol_synthetics(jnp.asarray(m6), radiation_weights_p(g_strike))[0])
        assert abs(amp) < 1e-6
        # 45 degrees between strike and normal is anti-/maximal
        g_max = jnp.asarray([[np.sqrt(0.5), np.sqrt(0.5), 0.0]])
        amp_max = float(pol_synthetics(jnp.asarray(m6), radiation_weights_p(g_max))[0])
        assert abs(amp_max) > 0.9

    def test_sh_sv_orthogonal_to_p_for_explosion(self):
        """Isotropic source radiates no S."""
        m6 = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
        az = jnp.asarray([0.3, 1.1])
        to = jnp.asarray([0.5, 2.0])
        g = takeoff_vector(az, to)
        sh = np.asarray(pol_synthetics(m6, radiation_weights_sh(g, az)))
        sv = np.asarray(pol_synthetics(m6, radiation_weights_sv(g, az, to)))
        np.testing.assert_allclose(sh, 0.0, atol=1e-6)
        np.testing.assert_allclose(sv, 0.0, atol=1e-6)

    def test_straight_ray_takeoff_limits(self):
        # station at zero distance: ray straight up (pi)
        assert abs(float(straight_ray_takeoff(0.0, 5e3)) - np.pi) < 1e-6
        # far station: ray near horizontal (pi/2)
        assert abs(float(straight_ray_takeoff(1e6, 5e3)) - np.pi / 2) < 0.01


class TestPolarityComposite:
    def make_targets(self, m6, n=24, seed=0):
        rng = np.random.default_rng(seed)
        az = rng.uniform(0, 2 * np.pi, n)
        to = rng.uniform(np.pi / 2, np.pi, n)  # up-going rays
        g = takeoff_vector(jnp.asarray(az), jnp.asarray(to))
        amps = np.asarray(pol_synthetics(jnp.asarray(m6), radiation_weights_p(g)))
        return [PolarityTarget(station=f"S{i}", azimuth_rad=az[i],
                               takeoff_rad=to[i], polarity=int(np.sign(amps[i])))
                for i in range(n)]

    def test_true_mechanism_maximises_llk(self):
        true = dict(strike=30.0, dip=60.0, rake=-90.0)
        m6 = np.asarray(sdr_to_m6(**true, moment=1.0))
        targets = self.make_targets(m6)
        comp = PolarityComposite(targets, [DCSource(magnitude=5.0, **true)])
        pt_true = {"strike": jnp.asarray(true["strike"]),
                   "dip": jnp.asarray(true["dip"]),
                   "rake": jnp.asarray(true["rake"]),
                   "magnitude": jnp.asarray(5.0)}
        l_true = float(comp.loglike(pt_true))
        pt_off = dict(pt_true, strike=jnp.asarray(true["strike"] + 60.0))
        assert l_true > float(comp.loglike(pt_off))
        # all polarities correctly predicted at truth
        syn = comp.get_synthetics(pt_true)["polarities"]
        obs = np.array([t.polarity for t in targets])
        np.testing.assert_array_equal(syn, obs)

    def test_hypername(self):
        targets = self.make_targets(np.asarray(sdr_to_m6(0, 90, 0, 1.0)))
        comp = PolarityComposite(targets, [DCSource()])
        assert comp.get_hypernames() == ["h_any_P_pol_0"]

    def test_multi_map_joint_fit(self):
        """Two phase maps (P + SH) fit jointly, each with its own
        hyperparameter and radiation pattern (reference
        ``PolarityConfig.waveforms`` config.py:745)."""
        from beat_tpu.heart.polarity import radiation_weights_sh
        from beat_tpu.models.polarity import PolarityMapping

        true = dict(strike=30.0, dip=60.0, rake=-90.0)
        m6 = np.asarray(sdr_to_m6(**true, moment=1.0))
        rng = np.random.default_rng(5)
        n = 20
        az = rng.uniform(0, 2 * np.pi, n)
        to = rng.uniform(np.pi / 2, np.pi, n)
        g = takeoff_vector(jnp.asarray(az), jnp.asarray(to))
        p_amps = np.asarray(pol_synthetics(jnp.asarray(m6),
                                           radiation_weights_p(g)))
        sh_amps = np.asarray(pol_synthetics(
            jnp.asarray(m6), radiation_weights_sh(g, jnp.asarray(az))))
        p_targets = [PolarityTarget(station=f"P{i}", azimuth_rad=az[i],
                                    takeoff_rad=to[i],
                                    polarity=int(np.sign(p_amps[i])))
                     for i in range(n)]
        sh_targets = [PolarityTarget(station=f"H{i}", azimuth_rad=az[i],
                                     takeoff_rad=to[i],
                                     polarity=int(np.sign(sh_amps[i])))
                      for i in range(n)]
        maps = [PolarityMapping("any_P", p_targets, mapnumber=0),
                PolarityMapping("any_SH", sh_targets, mapnumber=1)]
        comp = PolarityComposite(sources=[DCSource(magnitude=5.0, **true)],
                                 maps=maps)
        assert comp.get_hypernames() == ["h_any_P_pol_0", "h_any_SH_pol_1"]

        pt_true = {"strike": jnp.asarray(true["strike"]),
                   "dip": jnp.asarray(true["dip"]),
                   "rake": jnp.asarray(true["rake"]),
                   "magnitude": jnp.asarray(5.0)}
        l_true = float(comp.loglike(pt_true))
        pt_off = dict(pt_true, rake=jnp.asarray(true["rake"] + 90.0))
        assert l_true > float(comp.loglike(pt_off))
        syn = comp.get_synthetics(pt_true)
        np.testing.assert_array_equal(syn["any_P_pol_0"],
                                      [t.polarity for t in p_targets])
        np.testing.assert_array_equal(syn["any_SH_pol_1"],
                                      [t.polarity for t in sh_targets])

    def test_event_idx_validation(self):
        from beat_tpu.models.polarity import PolarityMapping

        targets = self.make_targets(np.asarray(sdr_to_m6(0, 90, 0, 1.0)))
        with pytest.raises(ValueError, match="event_idx"):
            PolarityComposite(sources=[DCSource()],
                              maps=[PolarityMapping("any_P", targets,
                                                    event_idx=1)])


class TestPerDrawGeometry:
    """Per-draw takeoff re-interpolation when the location is sampled —
    the reference re-ray-traces targets each draw
    (``beat/pytensorf.py:345-362``, cake tables ``heart.py:2333``);
    here a device-resident (depth × distance) table is gathered inside
    the jitted likelihood."""

    Z_TRUE = 15e3
    Z_FROZEN = 7e3
    MECH = dict(strike=40.0, dip=55.0, rake=-100.0)

    def _setup(self):
        from beat_tpu.heart.polarity import build_takeoff_table
        from beat_tpu.heart.velocity_model import (LayeredModel,
                                                   takeoff_angles)

        model = LayeredModel.default_crust()
        rng = np.random.default_rng(7)
        n = 40
        dists = rng.uniform(30e3, 200e3, n)
        az = rng.uniform(0, 2 * np.pi, n)
        # observed polarities come from the TRUE depth's ray geometry
        to_true = takeoff_angles(model, self.Z_TRUE, dists)
        m6 = np.asarray(sdr_to_m6(**self.MECH, moment=1.0))
        g = takeoff_vector(jnp.asarray(az), jnp.asarray(to_true))
        amps = np.asarray(pol_synthetics(jnp.asarray(m6),
                                         radiation_weights_p(g)))
        # frozen targets carry takeoffs ray-traced at the (wrong)
        # configured depth, as the load path would
        to_frozen = takeoff_angles(model, self.Z_FROZEN, dists)
        targets = [PolarityTarget(station=f"S{i}", azimuth_rad=az[i],
                                  takeoff_rad=to_frozen[i],
                                  polarity=int(np.sign(amps[i])),
                                  distance_m=float(dists[i]))
                   for i in range(n)]
        table = build_takeoff_table(model, np.linspace(4e3, 20e3, 33),
                                    np.linspace(20e3, 220e3, 101))
        return model, targets, table

    def _point(self, depth, **over):
        pt = {k: jnp.asarray(v) for k, v in self.MECH.items()}
        pt["magnitude"] = jnp.asarray(5.0)
        pt["depth"] = jnp.asarray(depth)
        pt.update({k: jnp.asarray(v) for k, v in over.items()})
        return pt

    def test_table_interp_matches_ray_tracer(self):
        from beat_tpu.heart.velocity_model import first_arrival

        model, _, table = self._setup()
        rng = np.random.default_rng(3)
        # off-grid probes away from the direct/head-wave crossover,
        # where takeoff(depth, distance) is smooth
        for z, r in zip(rng.uniform(5e3, 19e3, 6),
                        rng.uniform(25e3, 60e3, 6)):
            want = np.deg2rad(first_arrival(model, z, r)[1])
            got = float(table.interp(jnp.asarray(z), jnp.asarray(r)))
            assert abs(got - want) < 0.03, (z, r, got, want)

    def test_frozen_geometry_is_biased_table_is_not(self):
        from beat_tpu.models.polarity import PolarityMapping

        _, targets, table = self._setup()
        src = DCSource(magnitude=5.0, depth=self.Z_FROZEN, **self.MECH)
        frozen = PolarityComposite(
            sources=[src], maps=[PolarityMapping("any_P", targets)])
        perdraw = PolarityComposite(
            sources=[src],
            maps=[PolarityMapping("any_P", targets, takeoff_table=table)])
        obs = np.array([t.polarity for t in targets])

        # frozen geometry mispredicts some first motions at the truth —
        # and sampling depth cannot fix it (llk is depth-independent)
        syn_frozen = frozen.get_synthetics(self._point(self.Z_TRUE))
        n_wrong = int(np.sum(syn_frozen["polarities"] != obs))
        assert n_wrong >= 3
        lf_true = float(frozen.loglike(self._point(self.Z_TRUE)))
        lf_cfg = float(frozen.loglike(self._point(self.Z_FROZEN)))
        np.testing.assert_allclose(lf_true, lf_cfg, rtol=1e-6)

        # per-draw geometry: all polarities right at the true depth,
        # and the likelihood prefers the true depth over the frozen one
        syn = perdraw.get_synthetics(self._point(self.Z_TRUE))
        np.testing.assert_array_equal(syn["polarities"], obs)
        lt_true = float(perdraw.loglike(self._point(self.Z_TRUE)))
        lt_cfg = float(perdraw.loglike(self._point(self.Z_FROZEN)))
        assert lt_true > lt_cfg + 1.0

    def test_traced_shifts_move_epicentre(self):
        """east/north shifts change per-target distance/azimuth and the
        traced radiation weights follow."""
        from beat_tpu.models.polarity import PolarityMapping

        _, targets, table = self._setup()
        src = DCSource(magnitude=5.0, depth=self.Z_TRUE, **self.MECH)
        comp = PolarityComposite(
            sources=[src],
            maps=[PolarityMapping("any_P", targets, takeoff_table=table)])
        base = float(comp.loglike(self._point(self.Z_TRUE)))
        shifted = float(comp.loglike(self._point(
            self.Z_TRUE, east_shift=25e3, north_shift=-18e3)))
        assert abs(shifted - base) > 1e-3

    def test_jit_grad_through_table(self):
        """The gather is pure XLA: jit + grad w.r.t. depth both work."""
        import jax

        from beat_tpu.models.polarity import PolarityMapping

        _, targets, table = self._setup()
        src = DCSource(magnitude=5.0, depth=self.Z_TRUE, **self.MECH)
        comp = PolarityComposite(
            sources=[src],
            maps=[PolarityMapping("any_P", targets, takeoff_table=table)])

        def f(z):
            return comp.loglike(self._point(z))

        jf = jax.jit(f)
        np.testing.assert_allclose(float(jf(self.Z_TRUE)),
                                   float(f(self.Z_TRUE)), rtol=1e-6)
        g = float(jax.grad(f)(jnp.asarray(10e3)))
        assert np.isfinite(g)
