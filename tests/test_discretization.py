"""Resolution-based discretization tests (ports the intent of the
reference ``test_resolution_subsampling.py``)."""

import numpy as np
import pytest

from beat_tpu.ffi.discretization import (
    IrregularSubfault,
    ResolutionDiscretizationConfig,
    _divide_patch,
    model_resolution,
    normalized_resolution_spread,
    optimize_damping,
    optimize_discretization,
)
from beat_tpu.sources import RectangularSource


@pytest.fixture
def scene():
    rng = np.random.default_rng(0)
    g = 14
    e = np.linspace(-15e3, 15e3, g)
    coords = np.stack(np.meshgrid(e, e), -1).reshape(-1, 2)
    los = np.tile([0.4, -0.1, 0.91], (coords.shape[0], 1))
    los /= np.linalg.norm(los, axis=1, keepdims=True)
    src = RectangularSource(depth=500.0, strike=0.0, dip=60.0, rake=90.0,
                            length=16e3, width=12e3)
    return src, coords, los


class TestDivision:
    def test_divide_along_strike_preserves_area(self):
        p = RectangularSource(depth=2e3, strike=30.0, dip=50.0,
                              length=4e3, width=2e3)
        halves = _divide_patch(p)
        assert len(halves) == 2
        assert sum(h.length * h.width for h in halves) == pytest.approx(4e3 * 2e3)
        assert all(h.length == 2e3 for h in halves)

    def test_divide_down_dip_deepens(self):
        p = RectangularSource(depth=2e3, strike=0.0, dip=45.0,
                              length=2e3, width=4e3)
        top, bottom = _divide_patch(p)
        assert top.depth == p.depth
        assert bottom.depth > top.depth
        assert top.width == bottom.width == 2e3

    def test_centers_stay_on_plane(self):
        p = RectangularSource(depth=2e3, strike=37.0, dip=53.0,
                              length=4e3, width=4e3)
        for h in _divide_patch(p):
            # center depth between top and bottom of parent
            assert p.depth <= h.center()[2] <= p.bottom_depth + 1.0


class TestResolution:
    def test_resolution_diag_bounded(self, scene):
        src, coords, los = scene
        patches = src.patches(4, 3)
        from beat_tpu.ffi.discretization import _build_G

        G = _build_G(patches, coords, los)
        centers = np.stack([p.center() for p in patches]) / 1e3
        R = model_resolution(G, centers, epsilon=0.01)
        d = np.diag(R)
        assert np.all(d > -0.05) and np.all(d < 1.05)
        # shallow patches better resolved than the deepest row
        assert d[:4].mean() > d[-4:].mean()

    def test_spread_increases_with_damping(self, scene):
        src, coords, los = scene
        patches = src.patches(4, 3)
        from beat_tpu.ffi.discretization import _build_G

        G = _build_G(patches, coords, los)
        centers = np.stack([p.center() for p in patches]) / 1e3
        s_small = normalized_resolution_spread(model_resolution(G, centers, 1e-4))
        s_big = normalized_resolution_spread(model_resolution(G, centers, 10.0))
        assert s_big > s_small


class TestOptimizeDiscretization:
    @pytest.mark.slow
    def test_refines_shallow_region(self, scene):
        src, coords, los = scene
        config = ResolutionDiscretizationConfig(
            epsilon=0.05, resolution_thresh=0.97, alpha=0.3,
            patch_lengths_min=2e3, patch_widths_min=2e3,
            patch_lengths_max=8e3, patch_widths_max=8e3)
        fault, r_diag, quality = optimize_discretization(
            src, coords, los, config, max_generations=6)
        patches = fault.get_all_patches()
        assert fault.npatches == len(patches) > 6  # refined beyond the start
        # total area preserved
        area = sum(p.length * p.width for p in patches)
        assert area == pytest.approx(src.length * src.width, rel=1e-6)
        # shallow patches smaller on average than deepest patches
        depths = np.array([p.center()[2] for p in patches])
        areas = np.array([p.length * p.width for p in patches])
        order = np.argsort(depths)
        third = max(1, len(patches) // 3)
        shallow = areas[order[:third]].mean()
        deep = areas[order[-third:]].mean()
        assert shallow <= deep
        assert 0.0 < quality <= 1.01

    def test_smoothing_operator_on_irregular(self, scene):
        src, coords, los = scene
        config = ResolutionDiscretizationConfig(
            epsilon=0.05, patch_lengths_min=3e3, patch_widths_min=3e3,
            patch_lengths_max=8e3, patch_widths_max=8e3)
        fault, _, _ = optimize_discretization(src, coords, los, config,
                                              max_generations=3)
        L = fault.get_smoothing_operator("gaussian")
        assert L.shape == (fault.npatches, fault.npatches)
        np.testing.assert_allclose(L.sum(axis=0), 0.0, atol=1e-9)
        # nearest_neighbor has no grid on irregular faults: falls back to
        # the correlated operator instead of crashing
        L2 = fault.get_smoothing_operator("nearest_neighbor")
        assert L2.shape == (fault.npatches, fault.npatches)

    def test_irregular_fault_moment_and_rdiag_consistent(self, scene):
        """moment/magnitude/patch_areas work on resolution-discretized
        faults, and diag(R) matches the returned patch count even when
        the generation cap ends the loop right after a division."""
        src, coords, los = scene
        config = ResolutionDiscretizationConfig(
            epsilon=0.05, patch_lengths_min=1e3, patch_widths_min=1e3,
            patch_lengths_max=8e3, patch_widths_max=8e3)
        fault, r_diag, quality = optimize_discretization(
            src, coords, los, config, max_generations=1)
        assert len(r_diag) == fault.npatches
        areas = fault.patch_areas()
        assert areas.shape == (fault.npatches,)
        np.testing.assert_allclose(areas.sum(), src.length * src.width,
                                   rtol=1e-6)
        slips = np.ones(fault.npatches)
        m = fault.moment(slips)
        np.testing.assert_allclose(m, 33e9 * areas.sum(), rtol=1e-6)
        assert 4.0 < fault.magnitude(slips) < 9.0


@pytest.mark.slow
def test_optimize_damping_elbow(scene):
    src, coords, los = scene
    config = ResolutionDiscretizationConfig(
        epsilon=0.02, epsilon_search_runs=4,
        patch_lengths_min=3e3, patch_widths_min=3e3,
        patch_lengths_max=8e3, patch_widths_max=8e3)
    fault, eps, results = optimize_damping(src, coords, los, config)
    assert len(results) == 4
    assert results[0]["epsilon"] <= eps <= results[-1]["epsilon"]
    # at minimum the max-patch-size constraint forces a 2x2 division
    assert fault.npatches >= 4
