"""
FFI machinery tests: eikonal (JAX vs Gauss-Seidel reference, port of
``test/test_fastsweep.py``), Voronoi (port of ``test/test_voronoi.py``),
fault discretization, Laplacian operators (port of
``test/test_laplacian.py`` shape/symmetry checks), and GF-library
stacking (nearest + multilinear vs host reference, the strategy of
``test/test_ffi_gfstacking.py``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beat_tpu.ffi import (
    FaultGeometry,
    GeodeticGFLibrary,
    SeismicGFLibrary,
    discretize_sources,
    geo_construct_gf_linear,
    get_smoothing_operator_correlated,
    get_smoothing_operator_nearest_neighbor,
)
from beat_tpu.ffi.gflibrary import stack_all_numpy
from beat_tpu.ops import (
    eikonal_rupture_times,
    eikonal_rupture_times_numpy,
    nearest_voronoi_node,
    nearest_voronoi_node_numpy,
)
from beat_tpu.sources import RectangularSource


class TestEikonal:
    def test_uniform_velocity_matches_numpy(self):
        n_dip, n_strike = 6, 10
        slowness = np.full((n_dip, n_strike), 1.0 / 3.5)  # s/km at v=3.5 km/s
        got = np.asarray(eikonal_rupture_times(jnp.asarray(slowness), 1.0, 2, 3))
        want = eikonal_rupture_times_numpy(slowness, 1.0, 2, 3)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_heterogeneous_velocity_matches_numpy(self):
        rng = np.random.default_rng(0)
        n_dip, n_strike = 8, 8
        slowness = 1.0 / rng.uniform(1.0, 5.0, size=(n_dip, n_strike))
        got = np.asarray(eikonal_rupture_times(jnp.asarray(slowness), 2.0, 0, 0))
        want = eikonal_rupture_times_numpy(slowness, 2.0, 0, 0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_nucleation_zero_and_monotone(self):
        slowness = np.full((5, 5), 0.5)
        t = np.asarray(eikonal_rupture_times(jnp.asarray(slowness), 1.0, 2, 2))
        assert t[2, 2] == 0.0
        assert np.all(t >= 0)
        # distance-1 neighbors arrive at f*h = 0.5
        np.testing.assert_allclose(t[2, 3], 0.5, atol=1e-6)

    def test_vmap_over_nucleation(self):
        slowness = jnp.full((4, 4), 0.4)
        f = jax.vmap(lambda nd, ns: eikonal_rupture_times(slowness, 1.0, nd, ns))
        times = f(jnp.asarray([0, 3]), jnp.asarray([0, 3]))
        assert times.shape == (2, 4, 4)
        assert float(times[0, 0, 0]) == 0.0 and float(times[1, 3, 3]) == 0.0


class TestVoronoi:
    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        nodes_s, nodes_d = rng.uniform(0, 30, 12), rng.uniform(0, 15, 12)
        patch_s, patch_d = rng.uniform(0, 30, 100), rng.uniform(0, 15, 100)
        got = np.asarray(nearest_voronoi_node(
            jnp.asarray(nodes_s), jnp.asarray(nodes_d),
            jnp.asarray(patch_s), jnp.asarray(patch_d)))
        want = nearest_voronoi_node_numpy(nodes_s, nodes_d, patch_s, patch_d)
        np.testing.assert_array_equal(got, want)


class TestFaultGeometry:
    def make_fault(self):
        ref = RectangularSource(east_shift=0.0, north_shift=0.0, depth=1e3,
                                strike=30.0, dip=60.0, rake=90.0,
                                length=12e3, width=8e3, slip=1.0)
        return discretize_sources([ref], patch_length=2e3, patch_width=2e3)

    def test_discretization_counts(self):
        fault = self.make_fault()
        sf = fault.get_subfault(0)
        assert (sf.n_strike, sf.n_dip) == (6, 4)
        assert fault.npatches == 24
        assert len(fault.get_all_patches()) == 24

    def test_patch_depths_increase_downdip(self):
        fault = self.make_fault()
        centers = fault.get_subfault(0).patch_centers_enz()
        depths = centers[:, 2].reshape(4, 6)
        assert np.all(np.diff(depths, axis=0) > 0)

    def test_moment_magnitude(self):
        fault = self.make_fault()
        slips = np.ones(fault.npatches)
        m0 = fault.moment(slips)
        np.testing.assert_allclose(m0, 33e9 * 12e3 * 8e3, rtol=1e-10)
        assert 6.0 < fault.magnitude(slips) < 7.0

    def test_point2starttimes(self):
        fault = self.make_fault()
        vels = np.full(fault.npatches, 3000.0)
        times = np.asarray(fault.point2starttimes(0, jnp.asarray(vels), 1e3, 1e3))
        assert times.min() == 0.0
        assert times.max() < 12e3 / 3000.0 * 2  # bounded by fault length / v

    def test_euler_backslip_sign_thrust(self):
        """Aki & Richards rake: for a pure thrust (rake=90) a plate
        velocity pointing UP-dip projects POSITIVELY onto the slip
        direction (previously the dip-slip projection used the down-dip
        vector, flipping the sign of signed backslip rates)."""
        ref = RectangularSource(depth=5e3, strike=0.0, dip=30.0, rake=90.0,
                                length=12e3, width=8e3, slip=1.0)
        fault = discretize_sources([ref], patch_length=4e3, patch_width=4e3)
        rates = np.asarray(fault.euler_pole2slips(
            pole_lat=45.0, pole_lon=0.3, omega=1.0,
            event_lat=0.0, event_lon=0.5))
        # strike=0, rake=90 (pure thrust): up-dip horizontal = -east, so
        # the backslip rate must equal MINUS the east velocity component
        from beat_tpu.heart.corrections import velocities_from_pole

        import jax.numpy as jnp

        v = np.asarray(velocities_from_pole(jnp.asarray([0.0]),
                                            jnp.asarray([0.5]),
                                            45.0, 0.3, 1.0))  # (1, NEU)
        assert abs(v[0, 1]) > 0
        assert np.all(np.sign(rates) == -np.sign(v[0, 1]))

    def test_ordering(self):
        fault = self.make_fault()
        ordering = fault.ordering
        assert ordering.npatches == 24
        v = np.arange(24)
        np.testing.assert_array_equal(ordering.vector2subfault(0, v), v)


class TestLaplacian:
    def test_nearest_neighbor_shape_and_rowsum(self):
        L = get_smoothing_operator_nearest_neighbor(6, 4, 2.0, 2.0)
        assert L.shape == (24, 24)
        np.testing.assert_allclose(L.sum(axis=1), 0.0, atol=1e-12)
        np.testing.assert_allclose(L, L.T)

    def test_interior_stencil(self):
        L = get_smoothing_operator_nearest_neighbor(5, 5, 1.0, 1.0)
        i = 2 * 5 + 2  # center patch
        assert L[i, i] == -4.0
        assert L[i, i - 1] == L[i, i + 1] == L[i, i - 5] == L[i, i + 5] == 1.0

    def test_correlated_rowsum_zero(self):
        rng = np.random.default_rng(2)
        coords = rng.uniform(0, 10, size=(20, 3))
        for cf in ("gaussian", "exponential"):
            L = get_smoothing_operator_correlated(coords, cf)
            np.testing.assert_allclose(L.sum(axis=0), 0.0, atol=1e-10)


class TestGeodeticGFLibrary:
    def test_matches_direct_forward(self):
        """G·s must equal the summed Okada forward of the slip distribution
        (the static analogue of ``test_ffi_gfstacking``)."""
        ref = RectangularSource(depth=2e3, strike=0.0, dip=45.0, rake=90.0,
                                length=6e3, width=4e3, slip=1.0)
        fault = discretize_sources([ref], patch_length=2e3, patch_width=2e3)
        rng = np.random.default_rng(3)
        coords = rng.uniform(-1e4, 1e4, size=(30, 2))
        los = np.tile(np.array([0.4, -0.1, 0.91]), (30, 1))
        los /= np.linalg.norm(los, axis=1, keepdims=True)

        lib = geo_construct_gf_linear(fault, coords, los, components=("uparr",))
        slips = rng.uniform(0, 2, fault.npatches)
        stacked = np.asarray(lib.stack_all(uparr=jnp.asarray(slips)))

        direct = np.zeros(30)
        for patch, s in zip(fault.get_all_patches(), slips):
            from beat_tpu.heart.okada import okada_surface_displacement

            disp = np.asarray(okada_surface_displacement(
                jnp.asarray(coords), east_shift=patch.east_shift,
                north_shift=patch.north_shift, depth=patch.depth,
                strike=patch.strike, dip=patch.dip, rake=patch.rake,
                length=patch.length, width=patch.width, slip=float(s)))
            direct += (disp * los).sum(axis=1)
        np.testing.assert_allclose(stacked, direct, rtol=5e-4, atol=1e-8)

    def test_components_and_save_load(self, tmp_path):
        ref = RectangularSource(depth=2e3, length=4e3, width=2e3)
        fault = discretize_sources([ref], patch_length=2e3, patch_width=2e3)
        coords = np.zeros((5, 2)) + 1e3
        los = np.tile([0.0, 0.0, 1.0], (5, 1))
        lib = geo_construct_gf_linear(fault, coords, los,
                                      components=("uparr", "uperp", "utens"))
        assert set(lib.gfs) == {"uparr", "uperp", "utens"}
        p = str(tmp_path / "geo_gf.npz")
        lib.save(p)
        lib2 = GeodeticGFLibrary.load(p)
        np.testing.assert_allclose(np.asarray(lib2.gfs["uparr"]),
                                   np.asarray(lib.gfs["uparr"]), rtol=1e-6)


class TestSeismicGFStacking:
    """Nearest + multilinear stacking vs the host reference implementation
    (reference equivalence test: ``test/test_ffi_gfstacking.py`` rtol 5e-6)."""

    @pytest.fixture
    def lib(self):
        rng = np.random.default_rng(7)
        nt, npch, nd, nst, ns = 3, 8, 4, 12, 32
        data = rng.normal(size=(nt, npch, nd, nst, ns)).astype(np.float32)
        return SeismicGFLibrary(
            data=jnp.asarray(data), duration_min=0.5, duration_sampling=0.5,
            starttime_min=0.0, starttime_sampling=0.25)

    def test_nearest(self, lib):
        rng = np.random.default_rng(8)
        durations = rng.uniform(0.5, 2.0, lib.npatches)
        starttimes = rng.uniform(0.0, 2.5, (lib.ntargets, lib.npatches))
        slips = rng.uniform(0, 3, lib.npatches)
        got = np.asarray(lib.stack_all(jnp.asarray(durations), jnp.asarray(starttimes),
                                       jnp.asarray(slips), "nearest_neighbor"))
        want = stack_all_numpy(lib, durations, starttimes, slips, "nearest_neighbor")
        np.testing.assert_allclose(got, want, rtol=5e-6, atol=5e-6)

    def test_multilinear(self, lib):
        rng = np.random.default_rng(9)
        durations = rng.uniform(0.6, 1.9, lib.npatches)
        starttimes = rng.uniform(0.1, 2.4, (lib.ntargets, lib.npatches))
        slips = rng.uniform(0, 3, lib.npatches)
        got = np.asarray(lib.stack_all(jnp.asarray(durations), jnp.asarray(starttimes),
                                       jnp.asarray(slips), "multilinear"))
        want = stack_all_numpy(lib, durations, starttimes, slips, "multilinear")
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_multilinear_exact_on_grid(self, lib):
        """On exact grid nodes multilinear equals nearest."""
        durations = np.full(lib.npatches, 1.0)   # exact grid point
        starttimes = np.full((lib.ntargets, lib.npatches), 0.5)
        slips = np.ones(lib.npatches)
        a = np.asarray(lib.stack_all(jnp.asarray(durations), jnp.asarray(starttimes),
                                     jnp.asarray(slips), "multilinear"))
        b = np.asarray(lib.stack_all(jnp.asarray(durations), jnp.asarray(starttimes),
                                     jnp.asarray(slips), "nearest_neighbor"))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_save_load(self, lib, tmp_path):
        lib.save(str(tmp_path), "seis_gf")
        lib2 = SeismicGFLibrary.load(str(tmp_path), "seis_gf")
        np.testing.assert_allclose(np.asarray(lib2.data), np.asarray(lib.data))
        assert lib2.duration_sampling == lib.duration_sampling


class TestPSCMPExport:
    def test_write_fault_to_pscmp(self, tmp_path):
        from beat_tpu.ffi import discretize_sources, write_fault_to_pscmp

        ref = RectangularSource(east_shift=2e3, north_shift=-1e3, depth=1e3,
                                strike=30.0, dip=60.0, length=6e3, width=4e3)
        fault = discretize_sources([ref], patch_length=2e3, patch_width=2e3)
        rng = np.random.default_rng(0)
        point = {"uparr": rng.uniform(0, 2, fault.npatches),
                 "uperp": rng.uniform(-0.5, 0.5, fault.npatches)}
        path = str(tmp_path / "fault.pscmp")
        write_fault_to_pscmp(path, fault, point, lat0=10.0, lon0=20.0)

        text = open(path).read()
        assert "PSCMP" in text
        rows = [ln for ln in text.splitlines()
                if ln and not ln.startswith("#")]
        # header row: n_faults lat0 lon0
        n_sf, lat0, lon0 = rows[0].split()
        assert int(n_sf) == 1 and float(lat0) == 10.0
        # subfault row: index, ul_lat, ul_lon, depth, L, W, strike, dip, np_st, np_di, t
        sf_row = rows[1].split()
        assert int(sf_row[8]) == 3 and int(sf_row[9]) == 2  # 3x2 patches
        np.testing.assert_allclose(float(sf_row[4]), 6.0)   # length km
        np.testing.assert_allclose(float(sf_row[7]), 60.0)  # dip
        # patch rows: pos_s pos_d slip_strike slip_dip opening
        patch_rows = rows[2:]
        assert len(patch_rows) == fault.npatches
        first = [float(x) for x in patch_rows[0].split()]
        np.testing.assert_allclose(first[:2], [1.0, 1.0])   # center of 2km patch
        np.testing.assert_allclose(first[2], point["uparr"][0], rtol=1e-4)
        np.testing.assert_allclose(first[4], 0.0)

        with pytest.raises(IOError):
            write_fault_to_pscmp(path, fault, point)
        write_fault_to_pscmp(path, fault, point, force=True)


class TestLSQInitialization:
    def test_lsq_start_centers_on_solution(self):
        """initialization='lsq' (reference FFIConfig) jitters the start
        population around the NNLS warm start within the prior bounds."""
        from beat_tpu.covariance import Covariance
        from beat_tpu.ffi import discretize_sources, geo_construct_gf_linear
        from beat_tpu.heart.geodesy import GeodeticDataset
        from beat_tpu.models.distributer import GeodeticDistributerComposite
        from beat_tpu.models.problem import Problem
        from beat_tpu.parameter import Parameter, PriorSet

        rng = np.random.default_rng(6)
        ref = RectangularSource(depth=1e3, dip=60.0, length=6e3, width=4e3)
        fault = discretize_sources([ref], patch_length=2e3, patch_width=2e3)
        coords = rng.uniform(-8e3, 8e3, (40, 2))
        los = np.tile([0.0, 0.0, 1.0], (40, 1))
        lib = geo_construct_gf_linear(fault, coords, los, components=("uparr",))
        true = rng.uniform(0.5, 1.5, fault.npatches)
        synth = np.asarray(lib.stack_all(uparr=jnp.asarray(true)))
        sd = 0.02 * np.abs(synth).max()
        ds = GeodeticDataset(name="s", typ="SAR", coords=coords,
                             displacement=synth + rng.normal(0, sd, 40),
                             los_vector=los,
                             covariance=Covariance(data=np.eye(40) * sd**2))
        comp = GeodeticDistributerComposite([ds], lib, fault)
        priors = PriorSet().add(Parameter("uparr", np.zeros(fault.npatches),
                                          np.full(fault.npatches, 3.0)))
        problem = Problem(priors, {"geodetic": comp},
                          initialization="lsq")
        lo, hi = problem.priors.bounds_arrays()
        start = problem._lsq_start(64, lo, hi, seed=1)
        assert start.shape == (64, lo.size)
        assert (start >= lo).all() and (start <= hi).all()
        sl = problem.ordering["uparr"].slc
        # centered on the composite's NNLS solution (clipping at the
        # lower bound biases zero-slip patches slightly upward)
        sol = comp.lsq_solution()["uparr"]
        np.testing.assert_allclose(start[:, sl].mean(axis=0), sol, atol=0.2)
        # jitter sd = 10% of the bound range, far tighter than the prior
        assert start[:, sl].std(axis=0).max() < 0.45  # prior sd ~0.87
