"""
Proposal catalog (reference ``test/test_proposals.py`` generalized from
smoke draws to statistical checks): every proposal draws the right
shape, is symmetric/zero-centered, the multivariate normal reproduces
the requested covariance, heavy-tailed proposals have heavier tails,
and the discrete proposals step on integers.
"""

import numpy as np
import pytest

import jax

from beat_tpu.samplers.base import choose_proposal, proposal_catalog

DIM = 3
N = 20000


@pytest.fixture(scope="module")
def cov_chol():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(DIM, DIM)) * 0.3
    cov = A @ A.T + np.eye(DIM)
    import jax.numpy as jnp

    return jnp.asarray(np.linalg.cholesky(cov), dtype=jnp.float32), cov


@pytest.mark.parametrize("name", sorted(proposal_catalog))
def test_shape_and_symmetry(name, cov_chol):
    chol, _ = cov_chol
    d = np.asarray(choose_proposal(name)(jax.random.PRNGKey(1), N, chol))
    assert d.shape == (N, DIM)
    assert np.isfinite(d).all()
    # zero-centered (median for the heavy-tailed ones)
    assert np.abs(np.median(d, axis=0)).max() < 0.2


def test_unknown_proposal_lists_options():
    with pytest.raises(ValueError, match="MultivariateNormal"):
        choose_proposal("nope")


def test_mv_normal_covariance(cov_chol):
    chol, cov = cov_chol
    d = np.asarray(choose_proposal("MultivariateNormal")(
        jax.random.PRNGKey(2), N, chol))
    np.testing.assert_allclose(np.cov(d, rowvar=False), cov, atol=0.12)


def test_univariate_normal_ignores_correlations(cov_chol):
    chol, cov = cov_chol
    d = np.asarray(choose_proposal("Normal")(jax.random.PRNGKey(3), N, chol))
    got = np.cov(d, rowvar=False)
    np.testing.assert_allclose(np.diag(got), np.diag(cov), rtol=0.1)
    off = got[~np.eye(DIM, dtype=bool)]
    assert np.abs(off).max() < 0.1 * np.diag(cov).min()


@pytest.mark.parametrize("name", ["Cauchy", "MultivariateCauchy",
                                  "MultivariateStudentT"])
def test_heavy_tails(name, cov_chol):
    chol, _ = cov_chol
    key = jax.random.PRNGKey(4)
    heavy = np.asarray(choose_proposal(name)(key, N, chol))
    normal = np.asarray(choose_proposal("MultivariateNormal")(key, N, chol))
    q999 = lambda x: np.quantile(np.abs(x[:, 0]), 0.999)  # noqa: E731
    assert q999(heavy) > 1.5 * q999(normal)


@pytest.mark.parametrize("name", ["Poisson", "DiscreteBoundedUniform"])
def test_discrete_steps_are_integers(name, cov_chol):
    chol, _ = cov_chol
    d = np.asarray(choose_proposal(name)(jax.random.PRNGKey(5), 2000, chol))
    np.testing.assert_allclose(d, np.round(d))
    assert np.abs(d).max() > 0


def test_deterministic_by_key(cov_chol):
    chol, _ = cov_chol
    for name in proposal_catalog:
        f = choose_proposal(name)
        a = np.asarray(f(jax.random.PRNGKey(7), 16, chol))
        b = np.asarray(f(jax.random.PRNGKey(7), 16, chol))
        np.testing.assert_array_equal(a, b)
