"""
Posterior-SHAPE acceptance (round-3 verdict weak #4 / next-round #5):

* Simulation-based calibration (Talts et al. 2018): across many
  prior-predictive replicates, the rank of the true parameter among the
  sampler's posterior draws must be uniform — a miscalibrated sampler
  (too narrow, too wide, skewed) fails even when its moments look fine.
  Run for SMC, MALA-SMC, and PT on a conjugate Gaussian model whose
  exact posterior is known.
* Cross-sampler agreement on the reference's bimodal mixture
  (``test/test_smc.py:38-115``): all three samplers must recover the
  MODE WEIGHTS (0.1/0.9), not just the mode locations the moment tests
  check.

Test power: with M replicates and B rank bins the χ² statistic has
B−1 dof; at M=48, B=6 the 99.5 % quantile is 16.75.  A sampler whose
posterior width is off by 2× concentrates ranks in the central (or
outer) bins with expected χ² ≫ 100 at M=48 — the test has essentially
full power against the gross miscalibrations it is meant to catch,
while a correct sampler fails with probability 0.005 per (sampler, dim)
cell.
"""

import numpy as np
import pytest
from scipy import stats

import jax
import jax.numpy as jnp

from beat_tpu.samplers import PTParams, SMCParams, pt_sample, smc_sample

DIM = 2
SIGMA = 0.25
LO = -1.0 * np.ones(DIM)
HI = 1.0 * np.ones(DIM)
M_REPLICATES = 48
N_BINS = 6
CHI2_CRIT = stats.chi2(N_BINS - 1).ppf(0.995)


def gaussian_logp(x, y):
    """Likelihood of one observation vector y = θ + N(0, σ²I)."""
    r = (y - x) / SIGMA
    return -0.5 * jnp.sum(r * r)


def _ranks_uniform_chi2(ranks: np.ndarray, n_draws: int) -> float:
    """χ² statistic of the rank histogram vs uniform on {0..n_draws}."""
    edges = np.linspace(0, n_draws + 1, N_BINS + 1)
    counts, _ = np.histogram(ranks, bins=edges)
    expected = len(ranks) / N_BINS
    return float(((counts - expected) ** 2 / expected).sum())


def _sbc_ranks(run_replicate, n_draws: int) -> np.ndarray:
    """(M, DIM) ranks of θ* among the sampler's posterior draws."""
    rng = np.random.default_rng(42)
    ranks = np.empty((M_REPLICATES, DIM))
    for m in range(M_REPLICATES):
        theta = rng.uniform(LO, HI)
        y = theta + rng.normal(0.0, SIGMA, DIM)
        draws = run_replicate(jnp.asarray(y, dtype=jnp.float32), m)
        assert draws.shape[0] >= n_draws
        draws = draws[:n_draws]
        ranks[m] = (draws < theta[None, :]).sum(axis=0)
    return ranks


@pytest.mark.slow
class TestSBC:
    """Rank-uniformity for each sampler.  The posterior here is a
    truncated Gaussian N(y, σ²) ∩ [lo, hi] — SBC needs no closed form,
    only that draws come from the same joint as (θ*, y)."""

    N_DRAWS = 63

    def _check(self, ranks):
        for d in range(DIM):
            chi2 = _ranks_uniform_chi2(ranks[:, d], self.N_DRAWS)
            assert chi2 < CHI2_CRIT, (
                f"SBC rank histogram non-uniform in dim {d}: χ²={chi2:.1f} "
                f"(crit {CHI2_CRIT:.1f}) — posterior mis-calibrated")

    def test_smc_random_walk(self):
        def run(y, m):
            params = SMCParams(n_chains=self.N_DRAWS + 1, n_steps=40,
                               tune_interval=20, seed=1000 + m)
            q_tr, _ = smc_sample(gaussian_logp, LO, HI, params,
                                 progress=False, logp_args=(y,))
            return np.asarray(q_tr[-1])

        self._check(_sbc_ranks(run, self.N_DRAWS))

    def test_smc_mala(self):
        def run(y, m):
            params = SMCParams(n_chains=self.N_DRAWS + 1, n_steps=30,
                               tune_interval=15, proposal_name="MALA",
                               seed=2000 + m)
            q_tr, _ = smc_sample(gaussian_logp, LO, HI, params,
                                 progress=False, logp_args=(y,))
            return np.asarray(q_tr[-1])

        self._check(_sbc_ranks(run, self.N_DRAWS))

    def test_smc_hmc(self):
        def run(y, m):
            params = SMCParams(n_chains=self.N_DRAWS + 1, n_steps=25,
                               tune_interval=15, proposal_name="HMC",
                               n_leapfrog=5, seed=4000 + m)
            q_tr, _ = smc_sample(gaussian_logp, LO, HI, params,
                                 progress=False, logp_args=(y,))
            return np.asarray(q_tr[-1])

        self._check(_sbc_ranks(run, self.N_DRAWS))

    def test_pt(self):
        def run(y, m):
            params = PTParams(n_chains=8, n_chains_posterior=2,
                              n_samples=800, tune_interval=50,
                              seed=3000 + m)
            q_tr, _, _ = pt_sample(gaussian_logp, LO, HI, params,
                                   logp_args=(y,))
            # q_tr: (n_rec, n_posterior, dim); drop burn-in, thin to
            # roughly-independent draws
            draws = q_tr[q_tr.shape[0] // 3:].reshape(-1, DIM)
            step = max(1, len(draws) // self.N_DRAWS)
            return np.asarray(draws[::step])

        self._check(_sbc_ranks(run, self.N_DRAWS))


@pytest.mark.slow
class TestCrossSamplerAgreement:
    """All three samplers on the reference mixture must agree on the
    mode WEIGHTS (0.1/0.9), not just the |mean| the moment tests pin."""

    def test_mode_weights(self, tmp_path):
        from tests.test_samplers import LOWER, UPPER, make_mixture_logp

        logp = make_mixture_logp()
        dim = LOWER.size
        weights = {}

        params = SMCParams(n_chains=400, n_steps=80, tune_interval=20,
                           seed=11)
        q_tr, _ = smc_sample(logp, LOWER, UPPER, params, progress=False)
        weights["smc"] = float((q_tr[-1][:, 0] < 0).mean())

        params = SMCParams(n_chains=400, n_steps=60, tune_interval=20,
                           proposal_name="MALA", seed=12)
        q_tr, _ = smc_sample(logp, LOWER, UPPER, params, progress=False)
        weights["smc_mala"] = float((q_tr[-1][:, 0] < 0).mean())

        params = PTParams(n_chains=12, n_chains_posterior=4,
                          n_samples=6000, seed=13)
        q_tr, _, _ = pt_sample(logp, LOWER, UPPER, params)
        draws = q_tr[q_tr.shape[0] // 4:].reshape(-1, dim)
        weights["pt"] = float((draws[:, 0] < 0).mean())

        for name, w in weights.items():
            assert abs(w - 0.9) < 0.1, \
                f"{name} mode weight {w:.3f} vs true 0.9 ({weights})"
        spread = max(weights.values()) - min(weights.values())
        assert spread < 0.12, f"samplers disagree on mode weights: {weights}"
