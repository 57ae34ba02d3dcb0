"""
Likelihood functions vs scipy ground truth — port of the reference's
``test/test_models.py`` strategy (normal_logpdf_cov cross-check).
"""

import numpy as np
import pytest
from scipy import stats

import jax.numpy as jnp

from beat_tpu.covariance import chol_inverse, log_determinant
from beat_tpu.distributions import (
    hyper_normal,
    multivariate_normal_chol,
    multivariate_normal_chol_batched,
    polarity_llk,
    uniform_prior_logp,
)


@pytest.fixture
def dataset():
    rng = np.random.default_rng(42)
    n = 32
    A = rng.normal(size=(n, n))
    C = A @ A.T / n + np.eye(n)
    r = rng.normal(size=n)
    return C, r


def scipy_llk(C, r, h):
    return stats.multivariate_normal.logpdf(r, mean=np.zeros(r.size), cov=np.exp(2 * h) * C)


class TestMvnChol:
    @pytest.mark.parametrize("h", [0.0, 0.7, -1.2])
    def test_matches_scipy(self, dataset, h):
        C, r = dataset
        W = chol_inverse(C)
        slog_pdet = log_determinant(C)
        got = float(multivariate_normal_chol(
            jnp.asarray(r), jnp.asarray(W), slog_pdet, h))
        want = scipy_llk(C, r, h)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_batched(self, dataset):
        C, r = dataset
        rng = np.random.default_rng(1)
        C2 = C * 2.0
        r2 = rng.normal(size=r.size)
        Ws = np.stack([chol_inverse(C), chol_inverse(C2)])
        pdets = np.array([log_determinant(C), log_determinant(C2)])
        rs = np.stack([r, r2])
        hs = np.array([0.3, -0.5])
        ns = np.array([r.size, r.size])
        got = np.asarray(multivariate_normal_chol_batched(
            jnp.asarray(rs), jnp.asarray(Ws), jnp.asarray(pdets), jnp.asarray(hs), jnp.asarray(ns)))
        want = np.array([scipy_llk(C, r, 0.3), scipy_llk(C2, r2, -0.5)])
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hyper_normal_consistency(dataset):
    """hyper_normal on precomputed ||Wr||^2 equals the full llk."""
    C, r = dataset
    W = chol_inverse(C)
    pdet = log_determinant(C)
    h = 0.4
    quad = float((W @ r) @ (W @ r))
    got = float(hyper_normal(jnp.asarray([quad]), jnp.asarray([pdet]),
                             jnp.asarray([h]), jnp.asarray([r.size]))[0])
    want = scipy_llk(C, r, h)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_polarity_llk_limits():
    # strongly positive synthetic amplitude + observed +1 => p ~ 1-gamma
    llk = np.asarray(polarity_llk(jnp.asarray([1.0]), jnp.asarray([100.0]), 0.01, 1.0))
    np.testing.assert_allclose(np.exp(llk), 0.99, rtol=1e-4)
    # sign mismatch should be strongly penalised
    llk_bad = np.asarray(polarity_llk(jnp.asarray([-1.0]), jnp.asarray([100.0]), 0.01, 1.0))
    assert llk_bad[0] < llk[0] - 3.0


def test_uniform_prior_logp():
    lo = jnp.asarray([0.0, 0.0])
    hi = jnp.asarray([1.0, 2.0])
    assert float(uniform_prior_logp(jnp.asarray([0.5, 1.0]), lo, hi)) == 0.0
    assert np.isneginf(float(uniform_prior_logp(jnp.asarray([1.5, 1.0]), lo, hi)))
