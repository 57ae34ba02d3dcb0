"""MAP estimation + Laplace approximation (beat_tpu/optimize.py) — a
gradient capability the reference lacks entirely (its pytensor graphs
expose no gradients, beat/pytensorf.py:5-7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beat_tpu.optimize import laplace_approximation, map_estimate


def test_map_and_laplace_gaussian():
    """Correlated Gaussian: MAP == mean, Laplace cov == cov, Laplace
    evidence == analytic box evidence."""
    cov = np.array([[0.04, 0.018], [0.018, 0.02]])
    icov = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)
    mu = np.array([0.7, -0.4])

    def logp(x):
        d = x - jnp.asarray(mu, jnp.float32)
        return -0.5 * d @ icov @ d

    lo = np.full(2, -2.0)
    hi = np.full(2, 2.0)
    q_map, llk, all_llks = map_estimate(logp, lo, hi, n_restarts=8,
                                        n_steps=100, seed=0)
    np.testing.assert_allclose(q_map, mu, atol=1e-3)
    assert llk > -1e-4
    lap = laplace_approximation(logp, q_map, lo, hi)
    np.testing.assert_allclose(lap["cov"], cov, rtol=0.02, atol=2e-4)
    # analytic: Z = 2*pi*sqrt(det(cov)) / vol
    want = float(np.log(2 * np.pi * np.sqrt(np.linalg.det(cov)) / 16.0))
    assert abs(lap["log_evidence"] - want) < 0.02, (lap["log_evidence"], want)
    assert lap["curvature_ok"]


def test_laplace_agrees_with_smc_evidence(tmp_path):
    """The two independent evidence estimators (Laplace curvature vs the
    SMC transitional product) must agree on a Gaussian posterior."""
    from beat_tpu.backend import SampleStage
    from beat_tpu.samplers import SMCParams, smc_sample

    sigma2 = 0.04
    mu = jnp.asarray([0.3, -0.2])

    def logp(x):
        return -0.5 * jnp.sum((x - mu) ** 2) / sigma2

    lo = np.full(2, -2.0)
    hi = np.full(2, 2.0)
    q_map, _, _ = map_estimate(logp, lo, hi, n_restarts=4, n_steps=80)
    lap = laplace_approximation(logp, q_map, lo, hi)

    home = str(tmp_path / "ev")
    smc_sample(logp, lo, hi,
               SMCParams(n_chains=1200, n_steps=25, tune_interval=10, seed=5),
               homepath=home, progress=False)
    log_z_smc = float(SampleStage(home).load_state(-1)["log_evidence"])
    assert abs(lap["log_evidence"] - log_z_smc) < 0.2, \
        (lap["log_evidence"], log_z_smc)


def test_fixed_dims_held_constant():
    """lower == upper pins a parameter: it must stay exactly at the pin,
    carry sd 0, and not enter the evidence volume."""
    def logp(x):
        return -0.5 * jnp.sum((x - 0.5) ** 2) / 0.01

    lo = np.array([-2.0, 1.25, -2.0])
    hi = np.array([2.0, 1.25, 2.0])
    q_map, _, _ = map_estimate(logp, lo, hi, n_restarts=4, n_steps=80)
    assert q_map[1] == 1.25
    np.testing.assert_allclose(q_map[[0, 2]], 0.5, atol=1e-3)
    lap = laplace_approximation(logp, q_map, lo, hi)
    assert lap["sd"][1] == 0.0
    assert lap["cov"].shape == (2, 2)
    np.testing.assert_allclose(lap["sd"][[0, 2]], 0.1, rtol=0.02)


def test_multimodal_restarts_find_global_mode():
    """Multi-restart must escape the local mode of an asymmetric
    mixture."""
    def logp(x):
        a = -0.5 * jnp.sum((x - 0.8) ** 2) / 0.005
        b = -0.5 * jnp.sum((x + 0.8) ** 2) / 0.005 + 3.0
        return jnp.logaddexp(a, b)

    lo = np.full(1, -2.0)
    hi = np.full(1, 2.0)
    q_map, llk, all_llks = map_estimate(logp, lo, hi, n_restarts=16,
                                        n_steps=100, seed=1)
    np.testing.assert_allclose(q_map, [-0.8], atol=1e-2)
    # restarts report both basins
    assert all_llks.max() - all_llks.min() > 1.0


def test_map_on_flagship_problem():
    """End-to-end through the Problem surface: MAP on the synthetic
    FullMT flagship recovers the planted source in seconds of optimizer
    time (the reference needs a full MCMC run for any point estimate)."""
    import __graft_entry__ as ge

    problem = ge._build_flagship(n_stations=4, nt=128)
    logp, data = problem.make_logp_fn()
    lower, upper = problem.priors.bounds_arrays()
    # the waveform misfit is multimodal in (time, depth) — cycle
    # skipping — so the basin quality is set by the restart count; 48
    # lockstep restarts cost the same wall-clock per step as one
    q_map, llk, _ = map_estimate(logp, lower, upper, n_restarts=48,
                                 n_steps=200, seed=2, logp_args=(data,),
                                 start=problem.priors.test_array()[None])
    point = problem.ordering.to_point(q_map)
    assert abs(float(np.asarray(point["depth"])) - 9e3) < 600
    assert abs(float(np.asarray(point["magnitude"])) - 5.8) < 0.15
    lap = laplace_approximation(logp, q_map, lower, upper,
                                logp_args=(data,))
    assert np.isfinite(lap["log_evidence"])
