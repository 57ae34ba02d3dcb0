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
