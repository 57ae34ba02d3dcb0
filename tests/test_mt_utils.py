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
