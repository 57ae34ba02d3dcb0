"""
Layered 1-D velocity models and first-arrival ray tracing — the native
replacement for the reference's pyrocko/cake takeoff-angle and
travel-time computations (``beat/heart.py:2333,825-839``).
"""

import numpy as np
import pytest

from beat_tpu.heart.velocity_model import (
    LayeredModel,
    ensemble_earthmodels,
    first_arrival,
    takeoff_angles,
    travel_times,
    vary_model,
)


class TestModelContainer:
    def test_homogeneous_properties(self):
        m = LayeredModel.homogeneous(vp=6000.0, vs=3500.0, rho=2700.0)
        assert m.nlayers == 1
        assert m.properties_at(12e3) == (6000.0, 3500.0, 2700.0)

    def test_layer_lookup(self):
        m = LayeredModel.default_crust()
        assert m.layer_of(0.0) == 0
        assert m.layer_of(25e3) == 1
        assert m.layer_of(100e3) == 2

    def test_validation(self):
        with pytest.raises(ValueError, match="surface"):
            LayeredModel(tops=[1e3, 2e3], vp=[6e3, 7e3], vs=[3e3, 4e3],
                         rho=[2700, 2800])

    def test_nd_roundtrip(self, tmp_path):
        nd = """0.0   5.8  3.36  2.72
20.0  5.8  3.36  2.72
20.0  6.5  3.75  2.92
35.0  6.5  3.75  2.92
moho
35.0  8.04 4.47  3.32
77.5  8.04 4.47  3.32
"""
        m = LayeredModel.from_nd(nd, name="ak135ish")
        assert m.nlayers >= 3
        assert abs(m.vp[0] - 5800.0) < 1.0
        assert m.vp[-1] > 8000.0
        p = tmp_path / "model.npz"
        m.save(str(p))
        m2 = LayeredModel.load(str(p))
        np.testing.assert_allclose(m2.vp, m.vp)
        assert m2.name == "ak135ish"


class TestFirstArrival:
    def test_homogeneous_matches_straight_ray(self):
        m = LayeredModel.homogeneous(vp=6000.0)
        zs = 8e3
        for x in (0.0, 5e3, 40e3, 120e3):
            t, takeoff, p = first_arrival(m, zs, x, "p")
            t_exp = np.hypot(x, zs) / 6000.0
            to_exp = np.degrees(np.pi - np.arctan2(x, zs))
            assert abs(t - t_exp) < 1e-4 * max(t_exp, 1.0)
            assert abs(takeoff - to_exp) < 0.05

    def test_two_layer_head_wave_crossover(self):
        """Classic refraction: beyond the crossover distance the head wave
        along the fast halfspace arrives first; its travel time and the
        downward takeoff at the critical angle are analytic."""
        v1, v2, h, zs = 5000.0, 8000.0, 10e3, 2e3
        m = LayeredModel(tops=[0.0, h], vp=[v1, v2], vs=[v1 / 1.73, v2 / 1.73],
                         rho=[2700.0, 3300.0])
        # near: direct (upgoing, takeoff > 90 deg)
        t_near, to_near, _ = first_arrival(m, zs, 3e3, "p")
        assert abs(t_near - np.hypot(3e3, zs) / v1) < 1e-3
        assert to_near > 90.0
        # far: head wave wins; analytic refraction time, takeoff at the
        # critical angle asin(v1/v2), DOWNGOING (< 90 deg)
        x = 200e3
        t_far, to_far, _ = first_arrival(m, zs, x, "p")
        eta = np.sqrt(1.0 / v1**2 - 1.0 / v2**2)
        t_exp = x / v2 + (2 * h - zs) * eta
        assert abs(t_far - t_exp) < 1e-3
        assert abs(to_far - np.degrees(np.arcsin(v1 / v2))) < 0.05

    def test_travel_time_monotonic(self):
        m = LayeredModel.default_crust()
        ts = travel_times(m, 10e3, np.linspace(0, 300e3, 40), "p")
        assert (np.diff(ts) > 0).all()
        # s slower than p everywhere
        ts_s = travel_times(m, 10e3, np.linspace(0, 300e3, 40), "s")
        assert (ts_s > ts).all()

    def test_takeoff_flips_down_at_distance(self):
        """Layered crust: nearby stations see upgoing rays, distant ones
        the downgoing refracted ray — the physics the straight-ray
        approximation got wrong for regional polarity data."""
        m = LayeredModel.default_crust()
        to = np.degrees(takeoff_angles(m, 10e3, [5e3, 400e3], "p"))
        assert to[0] > 90.0
        assert to[1] < 90.0


class TestPolarityIntegration:
    def test_targets_from_distances(self, tmp_path):
        """polarity_data.npz without takeoffs: ray-traced through the
        project model from the event depth (reference cake path)."""
        from beat_tpu.config import load_polarity_targets

        proj = tmp_path / "proj"
        proj.mkdir()
        n = 6
        np.savez_compressed(
            proj / "polarity_data.npz",
            stations=np.array([f"S{i}" for i in range(n)]),
            azimuths_deg=np.linspace(0, 300, n),
            distances_m=np.linspace(10e3, 350e3, n),
            polarities=np.ones(n, dtype=int))
        targets = load_polarity_targets(str(proj), source_depth=12e3)
        to = np.degrees([t.takeoff_rad for t in targets])
        assert to[0] > 90.0          # near station: upgoing
        assert to[-1] < 90.0         # far station: refracted downgoing
        with pytest.raises(ValueError, match="depth"):
            load_polarity_targets(str(proj))

    def test_velocity_models_plot(self, tmp_path, monkeypatch):
        import matplotlib

        matplotlib.use("Agg")
        monkeypatch.chdir(tmp_path)
        from beat_tpu.heart.velocity_model import LayeredModel
        from beat_tpu.plotting.seismic import plot_velocity_models

        path = plot_velocity_models(
            models=[LayeredModel.default_crust(),
                    LayeredModel.homogeneous()])
        import os

        assert os.path.exists(path)
        os.remove(path)


class TestEnsembleEarthmodels:
    """vary_model / ensemble_earthmodels (reference heart.py:1722-1899):
    Gaussian model perturbations feeding Covariance.pred_v."""

    def test_vary_model_stays_physical(self):
        base = LayeredModel.default_crust()
        rng = np.random.default_rng(7)
        for _ in range(20):
            varied, cost = vary_model(base, rng=rng)
            assert isinstance(cost, int) and cost >= 0
            assert varied.tops[0] == 0.0
            assert (np.diff(varied.tops) > 0).all()
            # rejection keeps velocity increasing with depth
            assert (np.diff(varied.vp) >= 0).all()
            # vs scaled with the layer's vp/vs ratio => ratio preserved
            np.testing.assert_allclose(varied.vp / varied.vs,
                                       base.vp / base.vs, rtol=1e-9)
            # rho untouched (the reference does not vary densities)
            np.testing.assert_array_equal(varied.rho, base.rho)

    def test_depth_limit_freezes_deep_layers(self):
        base = LayeredModel.default_crust()
        varied, _ = vary_model(base, depth_limit_variation=25e3,
                               rng=np.random.default_rng(3))
        # the 35 km mantle top is below the limit: boundary + material fixed
        assert varied.tops[2] == base.tops[2]
        assert varied.vp[2] == base.vp[2]
        # the shallow crust did vary
        assert varied.vp[0] != base.vp[0]

    def test_ensemble_reproducible_and_distinct(self):
        base = LayeredModel.default_crust()
        ens1 = ensemble_earthmodels(base, num_vary=4,
                                    rng=np.random.default_rng(11))
        ens2 = ensemble_earthmodels(base, num_vary=4,
                                    rng=np.random.default_rng(11))
        assert len(ens1) == 4
        for a, b in zip(ens1, ens2):
            np.testing.assert_array_equal(a.vp, b.vp)
            np.testing.assert_array_equal(a.tops, b.tops)
        vps = np.stack([m.vp for m in ens1])
        assert np.std(vps, axis=0).min() > 0  # members genuinely differ

    def test_cost_counts_rejections(self):
        """Large velocity errors force ordering-violation retries — the
        cost counter (the reference's unlikeliness measure) must see them."""
        base = LayeredModel.default_crust()
        rng = np.random.default_rng(5)
        costs = [vary_model(base, error_velocities=1.5, rng=rng)[1]
                 for _ in range(30)]
        assert max(costs) > 0
        # and ensemble filtering keeps only the low-cost draws
        ens = ensemble_earthmodels(base, num_vary=3, error_velocities=1.5,
                                   max_cost=5, rng=np.random.default_rng(5))
        assert len(ens) == 3
        for m in ens:
            assert (np.diff(m.vp) >= 0).all()


class TestAK135AndJoin:
    """The embedded ak135-f-average base model + the reference's
    custom-model join semantics (``beat/utility.py:1223`` join_models:
    base model appended verbatim below the crustal model's max depth)."""

    CUSTOM = """0.    5.51 3.1  2.6  1264. 600.
7.2   5.51 3.1  2.6  1264. 600.
7.2   6.23 3.6  2.8  1283. 600.
21.64 6.23 3.6  2.8  1283. 600.
mantle
21.64 7.95 4.45 3.2  1449. 600."""

    def test_ak135_model(self):
        from beat_tpu.heart.velocity_model import LayeredModel

        m = LayeredModel.ak135_f_average()
        assert m.nlayers >= 14
        assert np.all(np.diff(m.tops) > 0)
        # Moho jump at 35 km; mantle gradient reaches the 410 jump
        i35 = m.layer_of(36e3)
        assert m.vp[i35] > 8.0e3
        assert m.vp[m.layer_of(420e3)] > 9.3e3
        assert m.qs is not None and np.all(m.qs > 0)

    def test_join_keeps_custom_crust_appends_base(self):
        from beat_tpu.heart.velocity_model import (LayeredModel,
                                                   join_nd_with_ak135)

        txt = join_nd_with_ak135(self.CUSTOM)
        m = LayeredModel.from_nd(txt, "joined")
        # custom crust intact
        assert m.vp[m.layer_of(5e3)] == pytest.approx(5510.0)
        assert m.vp[m.layer_of(15e3)] == pytest.approx(6230.0)
        # below the custom max depth the BASE model continues — the
        # custom below-side sample (7.95) has zero extent, ak135's
        # remaining crust (6.5) governs 21.64-35 km (velocity inversion
        # preserved, exactly like cake's joined model)
        assert m.vp[m.layer_of(30e3)] == pytest.approx(6500.0)
        assert m.vp[m.layer_of(40e3)] == pytest.approx(8042.5, rel=1e-3)
        assert m.tops[-1] == pytest.approx(660e3)

    def test_earth_flattening_travel_times(self):
        """EFT correctness: for a ray in the flattened model, the
        travel time to distance x must match the SPHERICAL travel time
        along the great circle — for a homogeneous sphere the chord ray
        gives t = 2(a−z?)·… ; here we check the well-known property that
        the flattened model reproduces the spherical P time better than
        the unflattened one for a deep-diving ray (the transform's whole
        purpose), and that shallow geometry is untouched."""
        from beat_tpu.heart.velocity_model import (LayeredModel,
                                                   first_arrival,
                                                   join_nd_with_ak135)

        m = LayeredModel.from_nd(join_nd_with_ak135(self.CUSTOM), "j")
        mf = m.earth_flattened()
        # near-surface layers essentially unchanged (< 0.1 % at z<22 km)
        assert mf.vp[0] == pytest.approx(m.vp[0], rel=1e-3)
        # flattened velocities grow with depth relative to spherical
        i200 = mf.layer_of(200e3)
        f = mf.vp[i200] / m.vp[m.layer_of(195e3)]
        assert 1.02 < f < 1.05
        # flattened travel time at 900 km is EARLIER (faster effective
        # medium), by the few-seconds scale the transform is known to
        # contribute at regional distances
        t_flat = first_arrival(mf, 8e3, 900e3, "p")[0]
        t_sph = first_arrival(m, 8e3, 900e3, "p")[0]
        assert 0.0 < t_sph - t_flat < 8.0
        # Q columns survive both transforms
        assert mf.qs is not None and np.all(mf.qs > 0)

    def test_flattening_subdivision_bounded(self):
        """Layer count stays small (cost guard for the Kennett
        recursion): 1 % velocity step ⇒ tens, not hundreds, of layers."""
        from beat_tpu.heart.velocity_model import (LayeredModel,
                                                   join_nd_with_ak135)

        m = LayeredModel.from_nd(join_nd_with_ak135(self.CUSTOM), "j")
        mf = m.earth_flattened()
        assert m.nlayers < mf.nlayers < 60
