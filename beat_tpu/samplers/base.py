"""
Proposal distributions (JAX), generating batched perturbations for all
chains at once.

Reference: ``beat/sampler/base.py:74-207`` (Proposal classes +
``choose_proposal``).  A proposal here is a function
``(key, n, cov_chol) -> (n, dim) deltas``; the multivariate ones consume
the lower Cholesky factor of the proposal covariance, the univariate ones
its diagonal standard deviations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _std_from_chol(cov_chol):
    # Row norms of the lower Cholesky factor = per-dimension std deviations.
    return jnp.sqrt(jnp.sum(cov_chol**2, axis=1))


def normal_proposal(key, n, cov_chol):
    dim = cov_chol.shape[0]
    return jax.random.normal(key, (n, dim)) * _std_from_chol(cov_chol)


def cauchy_proposal(key, n, cov_chol):
    dim = cov_chol.shape[0]
    return jax.random.cauchy(key, (n, dim)) * _std_from_chol(cov_chol)


def laplace_proposal(key, n, cov_chol):
    dim = cov_chol.shape[0]
    return jax.random.laplace(key, (n, dim)) * _std_from_chol(cov_chol)


def mv_normal_proposal(key, n, cov_chol):
    dim = cov_chol.shape[0]
    z = jax.random.normal(key, (n, dim))
    return z @ cov_chol.T


def mv_cauchy_proposal(key, n, cov_chol):
    dim = cov_chol.shape[0]
    kz, kg = jax.random.split(key)
    z = jax.random.normal(kz, (n, dim)) @ cov_chol.T
    # Cauchy = Normal / sqrt(Chi2_1): one shared scalar per draw.
    g = jnp.abs(jax.random.normal(kg, (n, 1)))
    return z / jnp.maximum(g, 1e-12)


def mv_student_t_proposal(key, n, cov_chol, df: float = 5.0):
    dim = cov_chol.shape[0]
    kz, kg = jax.random.split(key)
    z = jax.random.normal(kz, (n, dim)) @ cov_chol.T
    g = jax.random.gamma(kg, df / 2.0, (n, 1)) * 2.0 / df
    return z / jnp.sqrt(jnp.maximum(g, 1e-12))


def poisson_proposal(key, n, cov_chol):
    """Symmetric discrete perturbations (reference ``Poisson`` proposal):
    difference of two Poisson draws scaled by the proposal stds."""
    dim = cov_chol.shape[0]
    k1, k2 = jax.random.split(key)
    lam = jnp.maximum(_std_from_chol(cov_chol), 1e-6)
    d = (jax.random.poisson(k1, lam, (n, dim))
         - jax.random.poisson(k2, lam, (n, dim))).astype(jnp.float32)
    return d


def discrete_bounded_uniform_proposal(key, n, cov_chol):
    """Integer steps uniform in ±3σ (reference ``DiscreteBoundedUniform``,
    used for trans-dimensional index variables)."""
    dim = cov_chol.shape[0]
    width = jnp.maximum(jnp.round(3.0 * _std_from_chol(cov_chol)), 1.0)
    u = jax.random.uniform(key, (n, dim), minval=-width, maxval=width + 1.0)
    return jnp.floor(u)


proposal_catalog = {
    "Normal": normal_proposal,
    "Cauchy": cauchy_proposal,
    "Laplace": laplace_proposal,
    "Poisson": poisson_proposal,
    "DiscreteBoundedUniform": discrete_bounded_uniform_proposal,
    "MultivariateNormal": mv_normal_proposal,
    "MultivariateCauchy": mv_cauchy_proposal,
    "MultivariateStudentT": mv_student_t_proposal,
}


def choose_proposal(name: str):
    """Return the proposal generator by its reference-compatible name."""
    try:
        return proposal_catalog[name]
    except KeyError:
        raise ValueError(
            f"Unknown proposal '{name}'; available: "
            f"{sorted(proposal_catalog) + ['MALA', 'HMC']} "
            "(MALA and HMC are gradient-based and handled by the step "
            "kernel, samplers/metropolis.py)"
        ) from None
