"""
North-star benchmark: SMC forward-model evaluations/sec/chip on the
FullMT-style flagship problem (BASELINE.json metric).

Runs the jitted lockstep Metropolis stage (the SMC inner loop) at the
reference FullMT scale — n_chains=2000 (``data/examples/FullMT/
config_geometry.yaml:190``) — and reports evaluations per second.

vs_baseline: the reference publishes no numbers (BASELINE.md); we
estimate CPU BEAT's rate from its own docs: the FullMT example
(2000 chains x 300 steps x ~15 SMC stages ~= 9M forward evaluations)
takes "several hours" on 25 CPUs (``docs/examples/FullMT_regional.rst:317``)
— assume 12 h => ~208 evals/s for the whole 25-core machine.
"""

import json
import time

import numpy as np

BASELINE_EVALS_PER_SEC = 208.0  # estimated 25-core CPU BEAT (see module docstring)

N_CHAINS = 2000
N_STEPS = 50


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from beat_tpu.samplers.metropolis import init_metropolis_state, run_metropolis_stage

    problem = _build_flagship(n_stations=8, nt=256)
    logp, data = problem.make_logp_fn()
    lower, upper = problem.priors.bounds_arrays()
    dim = lower.size

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.uniform(lower, upper, size=(N_CHAINS, dim)), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    state = init_metropolis_state(logp, q0, key, logp_args=(data,))

    cov_chol = jnp.eye(dim, dtype=jnp.float32) * 0.01
    lo = jnp.asarray(lower, dtype=jnp.float32)
    hi = jnp.asarray(upper, dtype=jnp.float32)

    def run(n_steps):
        final, _ = run_metropolis_stage(
            logp, state, jnp.float32(0.7), cov_chol, lo, hi,
            n_steps=n_steps, tune_interval=25, record_every=n_steps,
            logp_args=(data,))
        jax.block_until_ready(final.q)
        return final

    run(N_STEPS)  # warmup/compile
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        run(N_STEPS)
    elapsed = (time.perf_counter() - t0) / n_rep

    evals = N_CHAINS * N_STEPS
    evals_per_sec = evals / elapsed
    print(json.dumps({
        "metric": "SMC forward-model evals/sec/chip (FullMT)",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / BASELINE_EVALS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
