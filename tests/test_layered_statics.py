"""
Layered static Green's functions (native psgrn/pscmp analogue,
``beat_tpu/heart/layered_statics.py`` + ``statictable.py``).

Validation chain: the Hankel-domain global-matrix solver is checked
against the machine-verified Mindlin solution (homogeneous limit), the
MT finite-difference path against the independently-implemented Okada
eigen-crack statics, and the StaticGFTable device forward against both.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beat_tpu.heart.velocity_model import LayeredModel

MU = 2700.0 * 3500.0**2
LAM = 2700.0 * (6000.0**2 - 2 * 3500.0**2)
NU = LAM / (2 * (LAM + MU))

HOMO = LayeredModel.homogeneous(vp=6000.0, vs=3500.0, rho=2700.0)
# identical properties split into 3 layers — must behave exactly like HOMO
HOMO_SPLIT = LayeredModel(tops=[0.0, 3e3, 11e3],
                          vp=[6000.0] * 3, vs=[3500.0] * 3, rho=[2700.0] * 3)
# soft sediment over stiff crust
CONTRAST = LayeredModel(tops=[0.0, 2e3], vp=[3500.0, 6500.0],
                        vs=[2000.0, 3700.0], rho=[2200.0, 2800.0])


class TestPointForce:
    def test_matches_mindlin_homogeneous(self):
        from beat_tpu.bem.tde import mindlin_displacement
        from beat_tpu.heart.layered_statics import point_force_surface_displacement

        zs = 3000.0
        obs = np.array([[4000.0, 1000.0], [0.0, 9000.0], [-15000.0, -8000.0],
                        [80000.0, 40000.0]])
        G = point_force_surface_displacement(HOMO, zs, obs)
        with jax.enable_x64(True):
            for i, xy in enumerate(obs):
                M = np.asarray(mindlin_displacement(
                    jnp.array([xy[0], xy[1], 0.0]), jnp.array([0.0, 0.0, zs]),
                    MU, NU))
                rel = np.abs(G[i] - M).max() / np.abs(M).max()
                assert rel < 2e-3, (xy, rel)

    def test_split_layers_no_effect(self):
        """Interfaces between identical materials must be invisible —
        the global-matrix bookkeeping is exact."""
        from beat_tpu.heart.layered_statics import point_force_surface_displacement

        zs = 5000.0
        obs = np.array([[6000.0, 2000.0], [30000.0, -10000.0]])
        G1 = point_force_surface_displacement(HOMO, zs, obs)
        G2 = point_force_surface_displacement(HOMO_SPLIT, zs, obs)
        np.testing.assert_allclose(G2, G1, rtol=1e-8)

    def test_soft_layer_amplifies(self):
        """A soft surface layer increases surface displacement over the
        homogeneous stiff halfspace — the physics psgrn exists for."""
        from beat_tpu.heart.layered_statics import point_force_surface_displacement

        stiff = LayeredModel.homogeneous(vp=6500.0, vs=3700.0, rho=2800.0)
        zs = 6000.0  # below the sediment
        obs = np.array([[500.0, 0.0], [3000.0, 0.0]])
        G_soft = point_force_surface_displacement(CONTRAST, zs, obs)
        G_stiff = point_force_surface_displacement(stiff, zs, obs)
        # vertical response to vertical force and horizontal to horizontal
        assert np.all(G_soft[:, 2, 2] > 1.05 * G_stiff[:, 2, 2])
        assert np.all(G_soft[:, 0, 0] > 1.10 * G_stiff[:, 0, 0])


class TestMomentTensor:
    def test_matches_okada_eigencrack_homogeneous(self):
        from beat_tpu.heart.layered_statics import mt_surface_displacement_layered
        from beat_tpu.heart.okada import mt_surface_displacement
        from beat_tpu.sources import sdr_to_m6

        zs = 5000.0
        obs = np.array([[4000.0, 1000.0], [0.0, 9000.0], [-6000.0, -4000.0],
                        [20000.0, 12000.0]])
        for m6 in (np.asarray(sdr_to_m6(40.0, 55.0, 20.0, 1e17)),
                   np.array([1e17, 1e17, 1e17, 0.0, 0.0, 0.0]),
                   np.array([0.5, -0.2, 0.9, 0.3, -0.4, 0.1]) * 1e17):
            u_lay = mt_surface_displacement_layered(HOMO, zs, obs, m6)
            u_ok = np.asarray(mt_surface_displacement(
                jnp.asarray(obs), jnp.asarray(m6), depth=zs, nu=NU,
                shear_modulus=MU))
            rel = np.abs(u_lay - u_ok).max() / np.abs(u_ok).max()
            assert rel < 0.01, rel


@pytest.fixture(scope="module")
def homo_table():
    from beat_tpu.heart.statictable import build_homogeneous_static_table

    return build_homogeneous_static_table(
        distances=np.linspace(0.5e3, 60e3, 40),
        depths=np.linspace(2e3, 12e3, 6), nu=NU, shear_modulus=MU)


class TestStaticTable:
    def test_table_forward_matches_direct(self, homo_table):
        """Device gather+rotate forward ≡ direct analytic statics at
        off-grid source positions and azimuths."""
        from beat_tpu.heart.okada import mt_surface_displacement
        from beat_tpu.sources import sdr_to_m6

        m6 = jnp.asarray(sdr_to_m6(70.0, 40.0, -30.0, 5e16))
        obs_e = jnp.asarray([5e3, -12e3, 20e3, 3e3])
        obs_n = jnp.asarray([8e3, 4e3, -15e3, -25e3])
        depth = 6.3e3
        u_tab = np.asarray(homo_table.synthesize_enu(
            m6, 1.2e3, -0.8e3, jnp.asarray(depth), obs_e, obs_n))
        coords = jnp.stack([obs_e, obs_n], axis=-1)
        u_dir = np.asarray(mt_surface_displacement(
            coords, m6, east_shift=1.2e3, north_shift=-0.8e3, depth=depth,
            nu=NU, shear_modulus=MU))
        rel = np.abs(u_tab - u_dir).max() / np.abs(u_dir).max()
        assert rel < 0.03, rel

    def test_layered_builder_homogeneous_limit(self, homo_table):
        """Layered builder on a uniform model == analytic homogeneous
        table (two fully independent code paths)."""
        from beat_tpu.heart.statictable import build_static_table

        t_lay = build_static_table(HOMO, distances=np.linspace(2e3, 60e3, 6),
                                   depths=np.array([4e3, 9e3]))
        from beat_tpu.heart.statictable import build_homogeneous_static_table

        t_ref = build_homogeneous_static_table(
            distances=np.linspace(2e3, 60e3, 6), depths=np.array([4e3, 9e3]),
            nu=NU, shear_modulus=MU)
        v1 = np.asarray(t_lay.values)
        v2 = np.asarray(t_ref.values)
        assert np.abs(v1 - v2).max() / np.abs(v2).max() < 0.01

    def test_roundtrip(self, homo_table, tmp_path):
        from beat_tpu.heart.statictable import StaticGFTable

        p = str(tmp_path / "stat.npz")
        homo_table.save(p)
        t2 = StaticGFTable.load(p)
        np.testing.assert_allclose(np.asarray(t2.values),
                                   np.asarray(homo_table.values))
        assert float(t2.shear_modulus(5e3)) == pytest.approx(MU)

    def test_shear_modulus_profile(self):
        from beat_tpu.heart.statictable import StaticGFTable

        t = StaticGFTable(values=jnp.zeros((6, 3, 2, 2)),
                          distances=np.array([1e3, 2e3]),
                          depths=np.array([1e3, 2e3]),
                          mu_tops=np.array([0.0, 2e3]),
                          mus=np.array([1e10, 3e10]),
                          lams=np.array([1e10, 3e10]))
        assert float(t.shear_modulus(1e3)) == pytest.approx(1e10)
        assert float(t.shear_modulus(5e3)) == pytest.approx(3e10)

    def test_single_node_axis_and_grid_validation(self):
        """Size-1 depth grids degrade to nearest-node lookup instead of
        crashing; non-uniform grids are rejected at construction (same
        contract as GreensTable)."""
        from beat_tpu.heart.statictable import StaticGFTable

        vals = np.zeros((6, 3, 3, 1))
        vals[0, 0, :, 0] = [1.0, 2.0, 3.0]
        t = StaticGFTable(values=jnp.asarray(vals),
                          distances=np.array([1e3, 2e3, 3e3]),
                          depths=np.array([5e3]))
        g = np.asarray(t.gather(jnp.asarray([1.5e3]), jnp.asarray(9e3)))
        assert g.shape == (1, 6, 3)
        assert g[0, 0, 0] == pytest.approx(1.5)  # distance interpolated
        with pytest.raises(ValueError, match="uniformly spaced"):
            StaticGFTable(values=jnp.zeros((6, 3, 3, 1)),
                          distances=np.array([1e3, 2e3, 10e3]),
                          depths=np.array([5e3]))


class TestCompositeIntegration:
    def _scene(self, forward, seed=0):
        from beat_tpu.covariance import Covariance
        from beat_tpu.heart.geodesy import GeodeticDataset

        rng = np.random.default_rng(seed)
        e = np.linspace(-25e3, 25e3, 8)  # no point at r=0 (below grid min)
        coords = np.stack(np.meshgrid(e, e), -1).reshape(-1, 2)
        los = np.tile([-0.5, 0.12, 0.86], (coords.shape[0], 1))
        los /= np.linalg.norm(los, axis=1, keepdims=True)
        obs = forward(coords, los)
        sd = max(0.02 * np.abs(obs).max(), 1e-9)
        return GeodeticDataset(
            name="sc", typ="SAR", coords=coords,
            displacement=obs + rng.normal(0, sd, obs.shape), los_vector=los,
            covariance=Covariance(data=np.eye(obs.size) * sd**2)), coords, los

    def test_table_composite_matches_analytic_mt(self, homo_table):
        """Composite with a homogeneous static table ≡ the analytic
        eigen-crack path for a point MT source."""
        from beat_tpu.models.geodetic import GeodeticGeometryComposite
        from beat_tpu.sources import MTSource

        src = MTSource(depth=7e3, magnitude=5.6)
        ds, coords, los = self._scene(
            lambda c, l: np.zeros(c.shape[0]))
        comp_t = GeodeticGeometryComposite([ds], [src], nu=NU,
                                           shear_modulus=MU,
                                           static_table=homo_table)
        comp_a = GeodeticGeometryComposite([ds], [src], nu=NU,
                                           shear_modulus=MU)
        point = {"mnn": jnp.asarray(0.6), "mee": jnp.asarray(-0.3),
                 "mdd": jnp.asarray(0.2), "mne": jnp.asarray(0.4),
                 "mnd": jnp.asarray(-0.2), "med": jnp.asarray(0.1),
                 "magnitude": jnp.asarray(5.6)}
        s_t = np.asarray(comp_t.synthetics_los(point))
        s_a = np.asarray(comp_a.synthetics_los(point))
        assert np.abs(s_t - s_a).max() / np.abs(s_a).max() < 0.05

    def test_table_rectangular_patches_match_okada(self, homo_table):
        """RectangularSource through the table (patch grid of point MTs)
        ≈ the full Okada rectangle in the far field."""
        from beat_tpu.models.geodetic import GeodeticGeometryComposite
        from beat_tpu.sources import RectangularSource

        src = RectangularSource(depth=6e3, strike=30.0, dip=70.0, rake=10.0,
                                length=4e3, width=2e3, slip=1.0)
        ds, coords, los = self._scene(lambda c, l: np.zeros(c.shape[0]))
        comp_t = GeodeticGeometryComposite([ds], [src], nu=NU,
                                           shear_modulus=MU,
                                           static_table=homo_table,
                                           finite_patches=(4, 2))
        comp_a = GeodeticGeometryComposite([ds], [src], nu=NU,
                                           shear_modulus=MU)
        point = {"slip": jnp.asarray(1.0)}
        s_t = np.asarray(comp_t.synthetics_los(point))
        s_a = np.asarray(comp_a.synthetics_los(point))
        # far-field equivalence: point-MT patches ≈ dislocation
        mask = np.hypot(coords[:, 0], coords[:, 1]) > 10e3
        scale = np.abs(s_a[mask]).max()
        assert np.abs(s_t[mask] - s_a[mask]).max() < 0.1 * scale
