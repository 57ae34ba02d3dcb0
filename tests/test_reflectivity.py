"""
Kennett R/T recursion vs the global-matrix DWN solver.

The recursion (``beat_tpu.heart.reflectivity``) must reproduce the
global-matrix force kernels (``layered_waveforms.dynamic_force_kernels``,
itself cross-validated against analytic ground truths in
tests/test_external_validation.py) and the band table builder — it is a
reformulation of the same physics, not a new approximation.
"""

import numpy as np
import pytest

from beat_tpu.heart.layered_waveforms import (
    _kernels_band_safe, build_layered_waveform_table, dynamic_force_kernels,
    mt_spectra_kennett_bucket, elementary_mt_spectra_band,
    dynamic_integration_grid, nudge_depths_off_interfaces)
from beat_tpu.heart.reflectivity import reflectivity_force_kernels
from beat_tpu.heart.velocity_model import LayeredModel

KERNELS = ("U0", "V0", "U1", "V1", "W1")


def crust_model(with_q=True):
    return LayeredModel(
        tops=np.array([0.0, 2e3, 8e3, 20e3]),
        vp=np.array([4000.0, 5800.0, 6400.0, 8000.0]),
        vs=np.array([2300.0, 3400.0, 3700.0, 4600.0]),
        rho=np.array([2400.0, 2700.0, 2850.0, 3300.0]),
        qp=np.array([300.0, 600.0, 800.0, 1200.0]) if with_q else None,
        qs=np.array([150.0, 300.0, 400.0, 600.0]) if with_q else None)


@pytest.mark.parametrize("zs", [1000.0, 5000.0, 12000.0, 25000.0])
@pytest.mark.parametrize("f", [0.05, 0.2, 0.8])
def test_kernels_match_global_matrix(zs, f):
    """Source in every layer (incl. the halfspace), propagating and
    evanescent regimes."""
    model = crust_model()
    k = np.geomspace(1e-6, 5e-3, 40)
    w_c = 2 * np.pi * f - 1j * 0.006
    ref = dynamic_force_kernels(model, zs, w_c, k)
    new = reflectivity_force_kernels(model, zs, w_c, k)
    for name in KERNELS:
        scale = np.abs(ref[name]).max()
        np.testing.assert_allclose(new[name], ref[name],
                                   atol=1e-8 * scale, rtol=0,
                                   err_msg=f"{name} zs={zs} f={f}")


def test_kernels_match_without_q():
    model = crust_model(with_q=False)
    k = np.geomspace(1e-6, 3e-3, 24)
    w_c = 2 * np.pi * 0.1 - 1j * 0.01
    ref = dynamic_force_kernels(model, 5000.0, w_c, k)
    new = reflectivity_force_kernels(model, 5000.0, w_c, k)
    for name in KERNELS:
        scale = np.abs(ref[name]).max()
        np.testing.assert_allclose(new[name], ref[name],
                                   atol=1e-8 * scale, rtol=0)


def test_low_frequency_precision_escalation():
    """As ω → 0 the P-SV basis degenerates and the c128 recursion loses
    ~|ω|⁻⁵ digits; _kernels_band_safe must hold ~1e-6 against the
    global-matrix solver by escalating to complex256 (SH never
    degenerates and needs nothing)."""
    model = crust_model()
    zs = 1000.0
    k = np.geomspace(1e-6, 5e-3, 40)
    w_c = np.array([0.0, 0.002, 0.01, 0.05, 0.2]) * 2 * np.pi - 1j * 0.0061
    kerns = _kernels_band_safe(model, [zs], w_c, k)[zs]
    for jf, w in enumerate(w_c):
        ref = dynamic_force_kernels(model, zs, complex(w), k)
        for name in KERNELS:
            scale = np.abs(ref[name]).max()
            err = np.abs(kerns[name][jf] - ref[name]).max() / scale
            assert err < 5e-6, f"{name} |w|={abs(w):.3g}: {err:.2e}"


def test_bucket_spectra_match_band_builder():
    """The bucketed Kennett band synthesis ≡ the (validated) per-depth
    band path — same k-grid, same FD stencil physics (the bucket uses a
    shared, smaller horizontal step, so agreement is to FD truncation,
    not roundoff)."""
    model = crust_model()
    distances = np.array([30e3, 60e3, 110e3])
    depths = [3000.0, 4000.0]
    nt, dt = 128, 0.5
    T = nt * dt
    freqs = np.fft.rfftfreq(nt, dt)[:9]
    w_band = 2 * np.pi * freqs - 1j * np.pi / T
    w_abs = float(np.abs(w_band).max())
    k_grid = dynamic_integration_grid(model, min(depths), distances.max(),
                                      T, w_abs, tail_coeff=30.0)

    spec_k = mt_spectra_kennett_bucket(model, depths, distances, w_band,
                                       k_grid, rel_step=1e-3)
    for iz, zs in enumerate(depths):
        ref = elementary_mt_spectra_band(model, zs, distances, w_band,
                                         k_grid, rel_step=1e-3)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(spec_k[iz], ref, atol=2e-5 * scale,
                                   rtol=0, err_msg=f"zs={zs}")


def test_hybrid_tail_interpolation_accuracy():
    """At regional scale the kennett path solves the evanescent tail on
    a log-subsampled grid and spline-expands — compare against the full
    dense-grid solve at a size where both are feasible."""
    from beat_tpu.heart.layered_waveforms import (_expand_kernels,
                                                  _hybrid_solve_grid,
                                                  _kernels_band_safe)

    model = crust_model()
    T = 128.0
    w_band = 2 * np.pi * np.fft.rfftfreq(256, 0.5)[:17] - 1j * np.pi / T
    w_abs = float(np.abs(w_band).max())
    zs = 1500.0
    k_grid = dynamic_integration_grid(model, zs, 400e3, T, w_abs,
                                      tail_coeff=40.0)
    solve_grid, n_dense = _hybrid_solve_grid(model, k_grid, w_abs)
    assert n_dense < k_grid.size // 4, "tail must actually engage"

    full = _kernels_band_safe(model, [zs], w_band, k_grid)[zs]
    sub = _kernels_band_safe(model, [zs], w_band, solve_grid)[zs]
    exp = _expand_kernels(sub, solve_grid, n_dense, k_grid, zs)
    for name in KERNELS:
        scale = np.abs(full[name]).max(axis=1) + 1e-300
        err = np.abs(exp[name] - full[name]).max(axis=1) / scale
        assert err.max() < 1e-6, f"{name}: tail interp err {err.max():.2e}"


@pytest.mark.slow
def test_table_builder_kennett_equals_band():
    """End-to-end: GreensTable spectra via method='kennett' ≡ 'band'."""
    model = crust_model()
    distances = np.linspace(25e3, 90e3, 4)
    depths = nudge_depths_off_interfaces(model, np.array([3e3, 5e3]))
    kw = dict(nt=128, dt=0.5, t0=0.0, fmax=0.4, tail_coeff=30.0)
    tab_b = build_layered_waveform_table(model, distances, depths,
                                         method="band", **kw)
    tab_k = build_layered_waveform_table(model, distances, depths,
                                         method="kennett", **kw)
    a = np.asarray(tab_b.spectra, dtype=np.float64)
    b = np.asarray(tab_k.spectra, dtype=np.float64)
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, atol=3e-5 * scale, rtol=0)
