"""MT decomposition utilities (reference derived-variable math)."""

import numpy as np
import pytest

from beat_tpu.mt_utils import (
    both_strike_dip_rake,
    decompose,
    hudson_coords,
    lune_coords,
    scalar_moment,
)
from beat_tpu.sources import sdr_to_m6


def sdr_cases():
    return [(30.0, 60.0, 90.0), (120.0, 45.0, 0.0), (200.0, 80.0, -45.0),
            (0.0, 90.0, 0.0), (75.0, 30.0, 135.0)]


class TestNodalPlanes:
    @pytest.mark.parametrize("sdr", sdr_cases())
    def test_both_planes_reproduce_mt(self, sdr):
        """Rebuilding the MT from either nodal plane gives the original —
        the representation-free invariant (vertical planes and the
        fault/auxiliary exchange make (s, d, r) tuples ambiguous)."""
        m6 = np.asarray(sdr_to_m6(*sdr, moment=1.0))
        for s, d, r in both_strike_dip_rake(m6):
            m6_back = np.asarray(sdr_to_m6(s, d, r, moment=1.0))
            np.testing.assert_allclose(m6_back, m6, atol=1e-6)


class TestDecomposition:
    def test_pure_dc(self):
        m6 = np.asarray(sdr_to_m6(30, 60, 90, 1.0))
        d = decompose(m6)
        assert d["dc"] > 99.0
        assert abs(d["iso"]) < 1e-6

    def test_pure_iso(self):
        d = decompose(np.array([1.0, 1.0, 1.0, 0, 0, 0]))
        assert abs(d["iso"]) > 99.0

    def test_scalar_moment_dc(self):
        m6 = np.asarray(sdr_to_m6(10, 50, 20, 3.5e17))
        np.testing.assert_allclose(scalar_moment(m6), 3.5e17, rtol=1e-6)


class TestSourceTypeCoords:
    def test_hudson_origin_for_dc(self):
        u, v = hudson_coords(np.asarray(sdr_to_m6(30, 60, 90, 1.0)))
        assert abs(u) < 1e-6 and abs(v) < 1e-6

    def test_hudson_iso_poles(self):
        u, v = hudson_coords(np.array([1.0, 1.0, 1.0, 0, 0, 0]))
        assert abs(u) < 1e-6 and v == pytest.approx(1.0)

    def test_lune_dc_center(self):
        g, d = lune_coords(np.asarray(sdr_to_m6(30, 60, 90, 1.0)))
        assert abs(g) < 1e-5 and abs(d) < 1e-5

    def test_lune_explosion_pole(self):
        g, d = lune_coords(np.array([1.0, 1.0, 1.0, 0, 0, 0]))
        assert d == pytest.approx(90.0)


class TestMTQTConversion:
    """MTQT (lune) parameterisation invariants (reference
    ``test/test_sources.py::test_vs_mtpar`` intent, without mtpar)."""

    def test_dc_limit_matches_sdr(self):
        """w=v=0 (pure DC on the lune): m6 equals the (strike, dip, rake)
        tensor with strike=κ, dip=arccos(h), rake=σ."""
        from beat_tpu.sources import mtqt_to_m6, sdr_to_m6, magnitude_to_moment

        for kappa_d, h, sigma_d in ((40.0, np.cos(np.deg2rad(55.0)), 20.0),
                                    (310.0, np.cos(np.deg2rad(80.0)), -70.0)):
            got = np.asarray(mtqt_to_m6(0.0, 0.0, np.deg2rad(kappa_d), np.deg2rad(sigma_d),
                                        h, 5.5))
            want = np.asarray(sdr_to_m6(kappa_d, np.rad2deg(np.arccos(h)),
                                        sigma_d, magnitude_to_moment(5.5)))
            scale = np.abs(want).max()
            np.testing.assert_allclose(got / scale, want / scale, atol=5e-6)

    def test_explosion_limit_isotropic(self):
        """w at the lune pole (3π/8): purely isotropic tensor."""
        from beat_tpu.sources import mtqt_to_m6

        m6 = np.asarray(mtqt_to_m6(3.0 * np.pi / 8.0, 0.0, 0.7, 0.2, 0.6, 5.0))
        iso = m6[:3].mean()
        assert iso > 0
        np.testing.assert_allclose(m6[:3], iso, rtol=1e-5)
        np.testing.assert_allclose(m6[3:], 0.0, atol=1e-5 * iso)

    def test_scalar_moment_preserved(self):
        """Frobenius moment equals the requested magnitude's moment for
        arbitrary lune points."""
        from beat_tpu.sources import (m6_to_matrix, magnitude_to_moment,
                                      mtqt_to_m6)

        rng = np.random.default_rng(1)
        for _ in range(5):
            w = rng.uniform(-3 * np.pi / 8, 3 * np.pi / 8)
            v = rng.uniform(-1 / 3, 1 / 3)
            m6 = np.asarray(mtqt_to_m6(w, v, rng.uniform(0, 2 * np.pi),
                                       rng.uniform(-np.pi / 2, np.pi / 2),
                                       rng.uniform(0, 1), 5.8))
            m = np.asarray(m6_to_matrix(m6))
            rho = np.sqrt(np.sum(m * m))
            np.testing.assert_allclose(
                rho / np.sqrt(2.0), magnitude_to_moment(5.8), rtol=1e-5)


class TestKaganAngle:
    def test_known_rotations(self):
        from beat_tpu.mt_utils import kagan_angle
        from beat_tpu.sources import sdr_to_m6

        a = sdr_to_m6(0.0, 90.0, 0.0)
        assert kagan_angle(a, a) < 1e-4
        # pure strike rotation of a vertical strike-slip fault
        np.testing.assert_allclose(
            kagan_angle(a, sdr_to_m6(30.0, 90.0, 0.0)), 30.0, atol=1e-3)
        # the conjugate plane is the SAME double couple
        assert kagan_angle(a, sdr_to_m6(90.0, 90.0, 180.0)) < 1e-3
        # dip rotation
        np.testing.assert_allclose(
            kagan_angle(sdr_to_m6(45.0, 90.0, 0.0),
                        sdr_to_m6(45.0, 60.0, 0.0)), 30.0, atol=1e-3)
        # full polarity flip = 90 deg (Kagan's maximum for a flip)
        m = np.asarray(a)
        np.testing.assert_allclose(kagan_angle(m, -m), 90.0, atol=1e-3)

    def test_symmetric_and_bounded(self):
        from beat_tpu.mt_utils import kagan_angle
        from beat_tpu.sources import sdr_to_m6

        rng = np.random.default_rng(3)
        for _ in range(10):
            a = sdr_to_m6(*rng.uniform([0, 10, -180], [360, 90, 180]))
            b = sdr_to_m6(*rng.uniform([0, 10, -180], [360, 90, 180]))
            k_ab, k_ba = kagan_angle(a, b), kagan_angle(b, a)
            np.testing.assert_allclose(k_ab, k_ba, atol=1e-6)
            assert 0.0 <= k_ab <= 120.0 + 1e-9
