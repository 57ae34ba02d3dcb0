"""Covariance toolkit tests (ports reference ``test/test_covariance.py``
non-Toeplitz structure checks + chol_inverse identities)."""

import numpy as np
import pytest
import scipy.linalg

from beat_tpu.covariance import (
    Covariance,
    SeismicNoiseAnalyser,
    autocovariance,
    calc_sample_covariance,
    chol_inverse,
    exponential_data_covariance,
    init_proposal_covariance,
    log_determinant,
    non_toeplitz_covariance,
    non_toeplitz_covariance_2d,
)


@pytest.fixture
def spd():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(20, 20))
    return A @ A.T / 20 + np.eye(20)


def test_chol_inverse_identity(spd):
    W = chol_inverse(spd)
    np.testing.assert_allclose(W @ spd @ W.T, np.eye(20), atol=1e-8)


def test_chol_inverse_non_psd_fallback():
    C = np.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite
    W = chol_inverse(C)
    assert np.isfinite(W).all()


def test_log_determinant(spd):
    _, want = np.linalg.slogdet(spd)
    np.testing.assert_allclose(log_determinant(spd), want, rtol=1e-10)


def test_covariance_container(spd):
    cov = Covariance(data=spd, pred_g=np.eye(20) * 0.1)
    total = cov.p_total
    np.testing.assert_allclose(total, spd + 0.1 * np.eye(20))
    W = cov.chol_inverse
    np.testing.assert_allclose(W @ total @ W.T, np.eye(20), atol=1e-8)


def test_exponential_structure():
    C = exponential_data_covariance(10, dt=0.5, tzero=2.0)
    assert C[0, 0] == 1.0
    np.testing.assert_allclose(C[0, 1], np.exp(-0.25))
    np.testing.assert_allclose(C, C.T)


def test_autocovariance_white_noise():
    rng = np.random.default_rng(0)
    x = rng.normal(size=50000)
    acov = autocovariance(x)
    np.testing.assert_allclose(acov[0], 1.0, atol=0.02)
    assert np.all(np.abs(acov[1:10]) < 0.02)


def test_non_toeplitz_covariance_psd():
    rng = np.random.default_rng(1)
    res = rng.normal(size=200) * np.linspace(0.5, 2.0, 200)
    C = non_toeplitz_covariance(res, window_size=40)
    assert C.shape == (200, 200)
    # diagonal should roughly track the squared local scale
    assert C[190, 190] > C[5, 5]


def test_non_toeplitz_2d_psd():
    rng = np.random.default_rng(2)
    coords = rng.uniform(0, 10, size=(60, 2))
    data = rng.normal(size=60)
    C = non_toeplitz_covariance_2d(coords, data, max_dist_perc=0.3)
    assert np.all(np.linalg.eigvalsh(C) > -1e-8)


def test_k_nearest_neighbor_rms_variants():
    from beat_tpu.covariance import k_nearest_neighbor_rms

    rng = np.random.default_rng(5)
    coords = rng.uniform(0, 10, size=(80, 2))
    data = rng.normal(size=80) * np.linspace(0.5, 3.0, 80)
    # radius mode tracks the local scale
    r = k_nearest_neighbor_rms(coords, data, max_dist_perc=0.15)
    assert r.shape == (80,) and np.all(r > 0)
    # k mode: k=data.size reproduces the global RMS at every point
    rk = k_nearest_neighbor_rms(coords, data, k=80, max_dist_perc=None)
    np.testing.assert_allclose(rk, np.sqrt(np.mean(data**2)), rtol=1e-12)
    with pytest.raises(ValueError):
        k_nearest_neighbor_rms(coords, data, k=5, max_dist_perc=0.2)


def test_variance_noise_analyser():
    rng = np.random.default_rng(4)
    noise = rng.normal(size=50) * 0.3
    signal = np.concatenate([noise, np.ones(50) * 5.0])
    analyser = SeismicNoiseAnalyser(structure="variance")
    C = analyser.get_data_covariance(signal, dt=1.0, arrival_index=50)
    np.testing.assert_allclose(C[0, 0], noise.var(), rtol=1e-6)


def test_proposal_covariance_shapes():
    cov = init_proposal_covariance(np.zeros(3), np.ones(3))
    assert cov.shape == (3, 3)
    pop = np.random.default_rng(0).normal(size=(100, 3))
    llks = np.random.default_rng(1).normal(size=100)
    c = calc_sample_covariance(pop, llks, beta=0.5)
    assert c.shape == (3, 3)
    assert np.all(np.linalg.eigvalsh(c) > 0)
