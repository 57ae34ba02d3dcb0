"""BEM meshing/engine/kernel tests (reference ``test/test_bem.py``
covers source geometries + intersection guard and smoke-runs the
disk/dike setups; the quantitative kernel assertions here are stronger)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beat_tpu.bem import (
    BEMEngine,
    BEMResponse,
    BoundaryCondition,
    CurvedBEMSource,
    DiskBEMSource,
    EllipseBEMSource,
    RectangularBEMSource,
    RingfaultBEMSource,
    TriangleBEMSource,
    check_intersection,
)


@pytest.fixture()
def x64():
    """Kernel-verification scope: run in float64 like the BEM assembly."""
    with jax.enable_x64(True):
        yield


class TestMeshes:
    def test_triangle(self):
        mesh = TriangleBEMSource(depth=1e3).discretize()
        assert mesh.ntriangles == 1
        np.testing.assert_allclose(mesh.centroids[0, 2], 1e3)

    def test_rectangle_area_and_normals(self):
        src = RectangularBEMSource(depth=2e3, strike=30.0, dip=60.0,
                                   length=4e3, width=2e3)
        mesh = src.discretize(500.0)
        np.testing.assert_allclose(mesh.areas.sum(), 4e3 * 2e3, rtol=1e-10)
        # all normals unit and consistent with dip
        norms = np.linalg.norm(mesh.normals, axis=1)
        np.testing.assert_allclose(norms, 1.0)
        dips = np.degrees(np.arccos(np.abs(mesh.normals[:, 2])))
        np.testing.assert_allclose(dips, 60.0, atol=1e-6)  # arccos|n_z| = dip

    def test_disk_area(self):
        src = DiskBEMSource(depth=3e3, a_half_axis=1500.0)
        mesh = src.discretize(200.0)
        np.testing.assert_allclose(mesh.areas.sum(), np.pi * 1500.0**2, rtol=0.02)

    def test_ellipse_area(self):
        src = EllipseBEMSource(depth=3e3, a_half_axis=2000.0, b_half_axis=800.0)
        mesh = src.discretize(200.0)
        np.testing.assert_allclose(mesh.areas.sum(), np.pi * 2000 * 800, rtol=0.02)

    def test_ellipse_strike_rotates_major_axis(self):
        """The a half-axis lies along strike: strike=0 -> north,
        strike=90 -> east (previously strike was a no-op for flat
        ellipses)."""
        a, b = 2000.0, 800.0
        m_n = EllipseBEMSource(depth=3e3, a_half_axis=a, b_half_axis=b,
                               strike=0.0).discretize(300.0)
        m_e = EllipseBEMSource(depth=3e3, a_half_axis=a, b_half_axis=b,
                               strike=90.0).discretize(300.0)
        vn = m_n.vertices - m_n.vertices.mean(axis=0)
        ve = m_e.vertices - m_e.vertices.mean(axis=0)
        assert np.abs(vn[:, 1]).max() > 1.9e3 and np.abs(vn[:, 0]).max() < 1e3
        assert np.abs(ve[:, 0]).max() > 1.9e3 and np.abs(ve[:, 1]).max() < 1e3
        # and strike=45 differs from both
        m_45 = EllipseBEMSource(depth=3e3, a_half_axis=a, b_half_axis=b,
                                strike=45.0).discretize(300.0)
        assert np.abs(m_45.vertices - m_n.vertices).max() > 100.0

    def test_curved_downdip_profile_spans_width(self):
        """Down-dip curvature fraction is measured along the dip vector:
        for dip=30 the profile must still span 0..1 (previously it only
        reached sin(dip), mislocating the curvature minimum)."""
        bent = CurvedBEMSource(depth=3e3, length=4e3, width=2e3, dip=30.0,
                               curv_amplitude_bottom=0.2,
                               curv_location_bottom=0.0).discretize(500.0)
        flat = RectangularBEMSource(depth=3e3, length=4e3, width=2e3,
                                    dip=30.0).discretize(500.0)
        off = np.linalg.norm(bent.vertices - flat.vertices, axis=1)
        # bottom edge (max depth) fraction must reach 1.0: offset =
        # amplitude * width * 1^2 = 400 m; top edge stays put
        z = flat.vertices[:, 2]
        np.testing.assert_allclose(off[z > z.max() - 1.0], 400.0, rtol=0.05)
        np.testing.assert_allclose(off[z < z.min() + 1.0], 0.0, atol=1e-6)

    def test_ringfault_area(self):
        src = RingfaultBEMSource(depth=1e3, diameter=2e3, height=1e3)
        mesh = src.discretize(150.0)
        np.testing.assert_allclose(mesh.areas.sum(), np.pi * 2e3 * 1e3, rtol=0.02)

    def test_curved_bend_moves_vertices(self):
        flat = RectangularBEMSource(depth=2e3, length=4e3, width=2e3).discretize(500.0)
        bent = CurvedBEMSource(depth=2e3, length=4e3, width=2e3,
                               bend_amplitude=0.2).discretize(500.0)
        assert np.abs(bent.vertices - flat.vertices).max() > 10.0

    def test_strike_dip_vectors_orthonormal(self):
        mesh = RectangularBEMSource(depth=2e3, strike=75.0, dip=40.0).discretize(500.0)
        s, d, n = mesh.unit_strike_vectors, mesh.unit_dip_vectors, mesh.normals
        np.testing.assert_allclose((s * n).sum(1), 0.0, atol=1e-12)
        np.testing.assert_allclose((s * d).sum(1), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0)
        assert np.all(np.abs(s[:, 2]) < 1e-12)  # strike vectors horizontal


class TestIntersection:
    def test_separate_meshes_ok(self):
        m1 = DiskBEMSource(depth=2e3, a_half_axis=500.0).discretize(200.0)
        m2 = DiskBEMSource(depth=6e3, a_half_axis=500.0).discretize(200.0)
        assert not check_intersection([m1, m2])

    def test_overlapping_flagged(self):
        m1 = DiskBEMSource(depth=2e3, a_half_axis=800.0).discretize(200.0)
        m2 = DiskBEMSource(depth=2.05e3, a_half_axis=800.0).discretize(200.0)
        assert check_intersection([m1, m2])

    def test_surface_breach_flagged(self):
        m = RingfaultBEMSource(depth=-100.0, diameter=1e3, height=500.0).discretize(100.0)
        assert check_intersection([m])


class TestTDEKernel:
    def test_burgers_jump(self):
        """u⁺ − u⁻ across the element approaches the Burgers vector."""
        from beat_tpu.bem.tde import element_displacement

        tri = np.array([[0.0, 0.0, 5e3], [4e3, 0.0, 5e3], [0.0, 4e3, 5e3]])
        b = np.array([0.3, -0.2, 0.5])
        pt = tri[0] + 0.25 * (tri[1] - tri[0]) + 0.25 * (tri[2] - tri[0])
        eps = 50.0
        d = element_displacement(np.stack([pt + [0, 0, eps], pt - [0, 0, eps]]),
                                 tri, b, level=6)
        jump = d[0] - d[1]
        np.testing.assert_allclose(jump, b, rtol=0.1)

    def test_uniform_sheet_stress_vanishes(self):
        """A uniform dislocation over a large sheet is a rigid offset:
        stress above its center must tend to zero (exact kernel identity)."""
        from beat_tpu.bem.tde import element_stress

        L = 8e3
        t1 = np.array([[0.0, 0.0, 0.0], [L, 0.0, 0.0], [L, L, 0.0]])
        t2 = np.array([[0.0, 0.0, 0.0], [L, L, 0.0], [0.0, L, 0.0]])
        obs = np.array([[L / 2, L / 2, 50.0]])
        n = np.array([0.0, 0.0, 1.0])
        sig = sum(element_stress(obs, t, n, level=8)[0] for t in (t1, t2))
        assert abs(n @ sig @ n) < 5e6  # < 5 MPa for mu=33 GPa, b=1


class TestHalfspaceSurface:
    def test_matches_okada_rectangle(self):
        """Reciprocity halfspace kernel vs the verified Okada rectangular
        solution: a vertical plane split into two triangles, all three
        slip modes."""
        import jax.numpy as jnp

        from beat_tpu.bem.tde import element_surface_displacement_halfspace
        from beat_tpu.heart.okada import okada_surface_displacement

        L, W, top = 3e3, 2e3, 1.5e3
        c0 = np.array([0.0, -L / 2, top])
        c1 = np.array([0.0, L / 2, top])
        c2 = np.array([0.0, L / 2, top + W])
        c3 = np.array([0.0, -L / 2, top + W])
        t1, t2 = np.stack([c0, c1, c2]), np.stack([c0, c2, c3])
        obs = np.array([[2e3, 1e3], [-3e3, -2e3], [800.0, 300.0]])

        cases = [("strike", np.array([0.0, 1.0, 0.0]), dict(rake=0.0, slip=1.0)),
                 ("dip", np.array([0.0, 0.0, -1.0]), dict(rake=90.0, slip=1.0)),
                 ("open", np.array([1.0, 0.0, 0.0]), dict(rake=0.0, slip=0.0,
                                                          opening=1.0))]
        for name, b, okada_kw in cases:
            ok = np.asarray(okada_surface_displacement(
                jnp.asarray(obs), depth=top, strike=0.0, dip=90.0,
                length=L, width=W, **okada_kw))
            got = sum(element_surface_displacement_halfspace(
                obs, t, b, level=5) for t in (t1, t2))
            got_enu = np.stack([got[:, 0], got[:, 1], -got[:, 2]], axis=-1)
            np.testing.assert_allclose(got_enu, ok,
                                       atol=2e-3 * np.abs(ok).max(),
                                       err_msg=name)


class TestEngine:
    def test_invalid_response_on_intersection(self):
        engine = BEMEngine([BoundaryCondition("normal", [0], [0], traction=10.0)],
                           mesh_size=200.0)
        srcs = [DiskBEMSource(depth=2e3, a_half_axis=800.0),
                DiskBEMSource(depth=2.05e3, a_half_axis=800.0)]
        resp = engine.process(srcs, np.zeros((4, 2)))
        assert not resp.is_valid and resp.displacements is None

    def test_halfspace_is_default(self):
        eng = BEMEngine([BoundaryCondition("normal", [0], [0], traction=1.0)])
        assert eng.medium == "halfspace"
        with pytest.raises(ValueError, match="Unknown medium"):
            BEMEngine([BoundaryCondition("normal", [0], [0], traction=1.0)],
                      medium="quarterspace")

    @pytest.mark.parametrize("medium", ["fullspace", "halfspace"])
    @pytest.mark.slow
    def test_penny_crack_analytic(self, medium):
        """Pressurized penny-shaped crack far from the surface: the BEM
        slip solution must match δ(r) = 4(1-ν)p√(a²-r²)/(πµ) — validates
        the kernel (Kelvin AND Mindlin: at 50 km depth the image terms
        are negligible), interaction matrix and solve end-to-end."""
        mu, nu, p, a = 33e9, 0.25, 10.0, 1000.0
        engine = BEMEngine([BoundaryCondition("normal", [0], [0], traction=p)],
                           mesh_size=400.0, poissons_ratio=nu, shear_modulus=mu,
                           check_mesh_intersection=False, medium=medium)
        src = DiskBEMSource(depth=50e3, a_half_axis=a)
        resp = engine.process([src], np.array([[0.0, 0.0], [2e3, 0.0]]))
        assert resp.is_valid
        mesh = resp.meshes[0]
        r = np.linalg.norm(mesh.centroids[:, :2], axis=1)
        s = resp.slips
        assert np.all(s > 0)  # positive traction (pressure) -> OPENING
        d0 = 4 * (1 - nu) * p * 1e6 * a / (np.pi * mu)
        inner = r < 0.4 * a
        np.testing.assert_allclose(np.abs(s[inner]).mean(), d0, rtol=0.12)
        # displacement field finite and decaying with distance
        disp = resp.displacements
        assert disp.shape == (2, 3)
        assert np.all(np.isfinite(disp))
        mag = resp.derived_magnitude()
        assert 3.0 < mag < 6.0

    def test_penny_crack_non_default_poisson(self):
        """nu != 0.25 must stay elastically consistent: lambda is derived
        from nu in the moment density and Hooke's law (previously
        hard-wired to lambda=mu, i.e. nu=0.25, regardless of the
        configured Poisson ratio)."""
        mu, nu, p, a = 33e9, 0.3, 10.0, 1000.0
        engine = BEMEngine([BoundaryCondition("normal", [0], [0], traction=p)],
                           mesh_size=450.0, poissons_ratio=nu,
                           shear_modulus=mu, check_mesh_intersection=False,
                           medium="fullspace", quadrature_level=1,
                           near_quadrature_level=5)
        resp = engine.process([DiskBEMSource(depth=50e3, a_half_axis=a)],
                              np.array([[0.0, 0.0]]))
        assert resp.is_valid
        mesh = resp.meshes[0]
        r = np.linalg.norm(mesh.centroids[:, :2], axis=1)
        d0 = 4 * (1 - nu) * p * 1e6 * a / (np.pi * mu)
        inner = r < 0.4 * a
        np.testing.assert_allclose(np.abs(resp.slips[inner]).mean(), d0,
                                   rtol=0.12)

    def test_buried_observation_up_convention(self):
        """3-D observation points return (east, north, UP) like the
        surface branch: just below the free surface the two must agree."""
        from beat_tpu.bem.tde import displacement_matrix

        src = DiskBEMSource(depth=3e3, a_half_axis=800.0)
        mesh = src.discretize(400.0)
        bcs = [BoundaryCondition("normal", [0], [0], traction=1.0)]
        obs2d = np.array([[500.0, 0.0], [0.0, 1500.0]])
        obs3d = np.column_stack([obs2d, np.full(2, 1.0)])  # 1 m deep
        D2 = displacement_matrix([mesh], obs2d, boundary_conditions=bcs,
                                 medium="halfspace")
        D3 = displacement_matrix([mesh], obs3d, boundary_conditions=bcs,
                                 medium="halfspace")
        # same sign and ~same value for every (obs, component, column)
        np.testing.assert_allclose(D3, D2, rtol=0.05, atol=1e-18)

    @pytest.mark.slow
    def test_shallow_sill_free_surface_amplification(self):
        """A horizontal pressurized crack at depth ~ its radius opens
        MORE in the halfspace than in the full space (the free surface
        adds compliance) — the physics the reference's cutde-HS BEM mode
        exists for (``beat/bem/base.py:14-19``); a fullspace solve would
        underpredict shallow-source opening."""
        mu, nu, p, a = 33e9, 0.25, 10.0, 1000.0
        depth = 1000.0
        openings = {}
        for medium in ("fullspace", "halfspace"):
            engine = BEMEngine(
                [BoundaryCondition("normal", [0], [0], traction=p)],
                mesh_size=450.0, poissons_ratio=nu, shear_modulus=mu,
                check_mesh_intersection=False, medium=medium,
                quadrature_level=1, near_quadrature_level=5)
            resp = engine.process([DiskBEMSource(depth=depth, a_half_axis=a)],
                                  np.array([[0.0, 0.0]]))
            assert resp.is_valid
            # pressurized sill: opening and surface UPLIFT above the center
            assert resp.slips.max() > 0
            assert resp.displacements[0, 2] > 0
            openings[medium] = np.abs(resp.slips).max()
        amp = openings["halfspace"] / openings["fullspace"]
        # Fialko et al. (2001): the d/a=1 sill opens a few tens of percent
        # more than the infinite-medium Sneddon solution
        assert 1.05 < amp < 2.0, amp


class TestMindlinKernel:
    """The Mindlin point-force solution is verified by its defining
    properties (uniqueness ⇒ correctness): free-surface traction vanishes,
    Kelvin at depth, Boussinesq-Cerruti at c→0, elastic reciprocity."""

    mu, nu = 33e9, 0.25

    def test_deep_limit_is_kelvin(self, x64):
        from beat_tpu.bem.tde import kelvin_displacement, mindlin_displacement

        x = jnp.array([300.0, -200.0, 500e3])
        xi = jnp.array([0.0, 0.0, 500.4e3])
        M = mindlin_displacement(x, xi, self.mu, self.nu)
        K = kelvin_displacement(x, xi, self.mu, self.nu)
        assert float(jnp.max(jnp.abs(M - K)) / jnp.max(jnp.abs(K))) < 2e-3

    def test_surface_source_limit_is_boussinesq_cerruti(self, x64):
        from beat_tpu.bem.tde import boussinesq_cerruti_displacement, mindlin_displacement

        x = jnp.array([250.0, 120.0, 400.0])
        M = mindlin_displacement(x, jnp.array([0.0, 0.0, 1e-3]), self.mu, self.nu)
        B = boussinesq_cerruti_displacement(x, jnp.zeros(3), self.mu, self.nu)
        assert float(jnp.max(jnp.abs(M - B)) / jnp.max(jnp.abs(B))) < 1e-4

    def test_free_surface_traction_vanishes(self, x64):
        """σ(z=0)·ẑ == 0 for every force direction — computed by autodiff
        of the displacement field, i.e. the actual field the BEM uses."""
        import jax

        from beat_tpu.bem.tde import mindlin_displacement

        mu = self.mu
        lam = mu
        xi = jnp.array([0.0, 0.0, 800.0])

        def traction_z(xs, col):
            grad = jax.jacfwd(
                lambda pnt: mindlin_displacement(pnt, xi, mu, self.nu)[:, col])(xs)
            eps = 0.5 * (grad + grad.T)
            sig = lam * jnp.trace(eps) * jnp.eye(3) + 2 * mu * eps
            return sig @ jnp.array([0.0, 0.0, 1.0])

        for col in range(3):
            for pt in ([500.0, 300.0, 0.0], [-1200.0, 50.0, 0.0],
                       [100.0, -2000.0, 0.0]):
                t = traction_z(jnp.asarray(pt), col)
                ref = traction_z(jnp.asarray([pt[0], pt[1], 1600.0]), col)
                assert float(jnp.max(jnp.abs(t))
                             / (jnp.max(jnp.abs(ref)) + 1e-30)) < 1e-9

    def test_reciprocity_with_surface_green_function(self, x64):
        """G_kp(surface, buried) == G_pk(buried, surface): the Mindlin
        field at z=0 must equal the transposed Boussinesq-Cerruti field —
        ties the interaction kernel to the (Okada-validated) surface
        displacement kernel."""
        from beat_tpu.bem.tde import boussinesq_cerruti_displacement, mindlin_displacement

        xs = jnp.array([700.0, -300.0, 0.0])
        xi = jnp.array([0.0, 0.0, 900.0])
        M = mindlin_displacement(xs, xi, self.mu, self.nu)
        B = boussinesq_cerruti_displacement(xi, xs, self.mu, self.nu)
        assert float(jnp.max(jnp.abs(M - B.T)) / jnp.max(jnp.abs(B))) < 1e-12
