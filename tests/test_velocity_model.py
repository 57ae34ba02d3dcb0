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
