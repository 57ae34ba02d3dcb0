"""
Okada halfspace kernel verification:

* published checklist values (Okada, BSSA 1985, Table 2 case 2);
* analytic 2-D screw-dislocation limit for a long vertical strike-slip
  fault;
* geometric invariances of the geographic wrapper.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beat_tpu.heart.okada import _okada_finite, okada_surface_displacement

DEG = np.pi / 180.0


class TestOkadaChecklist:
    """Okada (1985) Table 2, case 2: x=2, y=3, d=4, δ=70°, L=3, W=2, a=0.5."""

    x = jnp.asarray([2.0])
    y = jnp.asarray([3.0])
    args = dict(d=4.0, dip=70.0 * DEG, L=3.0, W=2.0, a=0.5)

    def run(self, U):
        ux, uy, uz = _okada_finite(self.x, self.y, U1=U[0], U2=U[1], U3=U[2], **self.args)
        return float(ux[0]), float(uy[0]), float(uz[0])

    def test_strike_slip(self):
        got = self.run((1.0, 0.0, 0.0))
        np.testing.assert_allclose(got, [-8.689e-3, -4.298e-3, -2.747e-3], rtol=1e-3)

    def test_dip_slip(self):
        got = self.run((0.0, 1.0, 0.0))
        np.testing.assert_allclose(got, [-4.682e-3, -3.527e-2, -3.564e-2], rtol=1e-3)

    def test_tensile(self):
        got = self.run((0.0, 0.0, 1.0))
        np.testing.assert_allclose(got, [-2.660e-4, 1.056e-2, 3.214e-3], rtol=1e-3)


class TestScrewDislocationLimit:
    """
    A very long vertical strike-slip fault breaking the surface down to
    depth D approaches the 2-D screw dislocation: the along-strike
    surface displacement at fault-perpendicular distance y is
    u = ±(U/π)·arctan(D/|y|), antisymmetric across the fault.
    """

    def test_profile(self):
        D = 5e3
        U = 2.0
        ys = np.array([200.0, 1e3, 5e3, 2e4])
        coords = np.column_stack([ys, np.zeros_like(ys)])  # east of fault, mid-strike
        disp = okada_surface_displacement(
            jnp.asarray(coords), depth=0.0, strike=0.0, dip=90.0, rake=0.0,
            length=2e6, width=D, slip=U)
        u_along = np.abs(np.asarray(disp[:, 1]))  # strike = north
        want = (U / np.pi) * np.arctan(D / ys)
        np.testing.assert_allclose(u_along, want, rtol=2e-3)

    def test_antisymmetry(self):
        coords = jnp.asarray([[1e3, 0.0], [-1e3, 0.0]])
        disp = okada_surface_displacement(
            coords, depth=0.0, strike=0.0, dip=90.0, rake=0.0,
            length=2e6, width=5e3, slip=1.0)
        np.testing.assert_allclose(float(disp[0, 1]), -float(disp[1, 1]), rtol=1e-5)


class TestWrapper:
    def test_strike_rotation_equivariance(self):
        """Rotating strike and stations together rotates the displacement."""
        rng = np.random.default_rng(0)
        coords = rng.uniform(-2e4, 2e4, size=(20, 2))
        base = dict(depth=2e3, dip=55.0, rake=30.0, length=8e3, width=4e3, slip=1.5)
        d0 = np.asarray(okada_surface_displacement(jnp.asarray(coords), strike=0.0, **base))

        ang = 40.0
        c, s = np.cos(ang * DEG), np.sin(ang * DEG)
        # rotating the geometry clockwise by `ang` (strike 0 -> ang):
        # station at R@p observes R@u
        rot = np.array([[c, s], [-s, c]])  # clockwise rotation in (E,N)
        coords_rot = coords @ rot.T
        d1 = np.asarray(okada_surface_displacement(jnp.asarray(coords_rot), strike=ang, **base))
        d1_back = d1[:, :2] @ rot
        np.testing.assert_allclose(d1_back, d0[:, :2], atol=5e-6)  # float32
        np.testing.assert_allclose(d1[:, 2], d0[:, 2], atol=5e-6)

    def test_thrust_uplift_on_hanging_wall(self):
        """30°-dipping thrust (rake 90): hanging wall (dip direction) uplifts."""
        # strike 0 => dip direction = east
        coords = jnp.asarray([[3e3, 0.0], [-6e3, 0.0]])
        disp = okada_surface_displacement(
            coords, depth=1e3, strike=0.0, dip=30.0, rake=90.0,
            length=1e4, width=5e3, slip=2.0)
        assert float(disp[0, 2]) > 0.0   # hanging-wall side uplift
        assert float(disp[0, 2]) > abs(float(disp[1, 2]))

    def test_tensile_opening_inflates(self):
        """A horizontal opening crack (sill) produces uplift above it."""
        coords = jnp.asarray([[0.0, 0.0]])
        disp = okada_surface_displacement(
            coords, depth=2e3, strike=0.0, dip=0.1, rake=0.0, slip=0.0,
            length=4e3, width=4e3, opening=1.0, anchor="center")
        assert float(disp[0, 2]) > 0.1

    def test_anchor_consistency(self):
        """top anchor at depth z == center anchor at z + W/2·sinδ."""
        coords = jnp.asarray(np.random.default_rng(1).uniform(-1e4, 1e4, (10, 2)))
        base = dict(strike=20.0, dip=40.0, rake=70.0, length=6e3, width=3e3, slip=1.0)
        d_top = okada_surface_displacement(coords, depth=1e3, anchor="top", **base)
        # center anchor: same fault if depth += W/2 sin δ and horizontal
        # position shifts along dip-direction by W/2 cos δ
        sd, cd = np.sin(40 * DEG), np.cos(40 * DEG)
        t_e, t_n = np.cos(20 * DEG), -np.sin(20 * DEG)
        d_center = okada_surface_displacement(
            coords,
            east_shift=0.5 * 3e3 * cd * t_e,
            north_shift=0.5 * 3e3 * cd * t_n,
            depth=1e3 + 0.5 * 3e3 * sd,
            anchor="center", **base)
        np.testing.assert_allclose(np.asarray(d_top), np.asarray(d_center), atol=5e-6)

    def test_jit_and_vmap(self):
        coords = jnp.asarray([[1e3, 2e3], [-2e3, 1e3]])

        @jax.jit
        def fwd(slip):
            return okada_surface_displacement(coords, depth=1e3, strike=10.0,
                                              dip=45.0, rake=0.0, length=5e3,
                                              width=2e3, slip=slip)

        slips = jnp.asarray([0.5, 1.0, 2.0])
        out = jax.vmap(fwd)(slips)
        assert out.shape == (3, 2, 3)
        # linear in slip
        np.testing.assert_allclose(np.asarray(out[2]), 4 * np.asarray(out[0]), rtol=1e-4)

    def test_mt_point_source_matches_small_shear_patch(self):
        """Arbitrary-MT statics via the eigen-crack decomposition: a pure
        DC moment tensor must reproduce the field of a small Okada shear
        patch with the same moment."""
        from beat_tpu.heart.okada import mt_surface_displacement
        from beat_tpu.sources import sdr_to_m6

        mu, nu, depth, m0 = 33e9, 0.25, 6e3, 1e17
        m6 = jnp.asarray(sdr_to_m6(37.0, 55.0, 20.0, m0))
        coords = jnp.asarray([[8e3, 3e3], [-5e3, 9e3], [12e3, -7e3]])
        got = np.asarray(mt_surface_displacement(coords, m6, depth=depth,
                                                 nu=nu, shear_modulus=mu))
        size = 0.08 * depth
        slip = m0 / (mu * size * size)
        want = np.asarray(okada_surface_displacement(
            coords, depth=depth, strike=37.0, dip=55.0, rake=20.0,
            length=size, width=size, slip=slip, nu=nu, anchor="center"))
        np.testing.assert_allclose(got, want, atol=5e-3 * np.abs(want).max())

    def test_mt_isotropic_matches_mogi_shape(self):
        """Isotropic MT field is proportional to Mogi with the known
        (3λ+2µ)/(3(λ+2µ)) convention factor (5/9 at ν=0.25)."""
        from beat_tpu.heart.okada import mogi_surface_displacement, mt_surface_displacement

        mu, nu, depth = 33e9, 0.25, 6e3
        lam = 2 * mu * nu / (1 - 2 * nu)
        coords = jnp.asarray([[8e3, 3e3], [-5e3, 9e3], [3e3, 2e3]])
        m6 = jnp.asarray([1e16, 1e16, 1e16, 0.0, 0.0, 0.0])
        got = np.asarray(mt_surface_displacement(coords, m6, depth=depth,
                                                 nu=nu, shear_modulus=mu))
        dv = 3e16 / (3 * lam + 2 * mu)
        mog = np.asarray(mogi_surface_displacement(coords, depth=depth,
                                                   volume_change=dv, nu=nu))
        ratio = got / mog
        np.testing.assert_allclose(ratio, 5.0 / 9.0, rtol=5e-3)

    def test_far_field_decay(self):
        coords = jnp.asarray([[5e3, 0.0], [50e3, 0.0], [500e3, 0.0]])
        disp = np.asarray(okada_surface_displacement(
            coords, depth=1e3, strike=0.0, dip=45.0, rake=90.0,
            length=3e3, width=2e3, slip=1.0))
        mags = np.linalg.norm(disp, axis=1)
        assert mags[0] > 10 * mags[1] > 10 * mags[2]
