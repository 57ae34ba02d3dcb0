"""
North-star benchmarks (BASELINE.json metric: "SMC forward-model
evals/sec/chip (FullMT); FFI GF-stack wall-clock").

1. SMC inner-loop throughput: the jitted lockstep Metropolis stage at
   the reference FullMT scale — n_chains=2000 (``data/examples/FullMT/
   config_geometry.yaml:190``) — in evaluations per second.
2. Kinematic FFI GF-stack wall-clock: the fused Pallas stacking kernel
   for a 2000-chain lockstep batch (multilinear interpolation) at the
   FFI demo scale, in ms per lockstep evaluation (reference hot kernel
   ``ffi/base.py:607-709``).

Timing methodology: the deployment TPU is reached through a tunnel
whose per-dispatch RTT (~30-50 ms, jittery) can exceed device time, and
same-argument replays can complete without a round-trip.  Both metrics
therefore use the SLOPE method: the work loop runs on-device
(``lax.scan`` / the stage's internal scan) at two iteration counts, a
host fetch forces real completion, and the difference isolates device
time per iteration.

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
N_SMALL = 5
N_LARGE = 105


def bench_smc_evals():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from beat_tpu.samplers.metropolis import (init_metropolis_state,
                                              run_metropolis_stage)

    problem = _build_flagship(n_stations=8, nt=256)
    logp, data = problem.make_logp_fn()
    lower, upper = problem.priors.bounds_arrays()
    dim = lower.size

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.uniform(lower, upper, size=(N_CHAINS, dim)),
                     dtype=jnp.float32)
    # distinct states per rep: same-argument replays can be served
    # without real device work on the tunnelled backend
    states = [init_metropolis_state(logp, q0, jax.random.PRNGKey(i),
                                    logp_args=(data,)) for i in range(4)]

    cov_chol = jnp.eye(dim, dtype=jnp.float32) * 0.01
    lo = jnp.asarray(lower, dtype=jnp.float32)
    hi = jnp.asarray(upper, dtype=jnp.float32)

    from beat_tpu.profiling import slope_time

    def run(n_steps, rep):
        final, _ = run_metropolis_stage(
            logp, states[rep], jnp.float32(0.7), cov_chol, lo, hi,
            n_steps=n_steps, tune_interval=1_000_000, record_every=n_steps,
            logp_args=(data,))
        float(jnp.sum(final.llk))  # host fetch = real sync

    per_step = slope_time(run, N_SMALL, N_LARGE)
    return N_CHAINS / per_step


def bench_gf_stack():
    """ms per lockstep (2000-chain) multilinear GF stack, Pallas vs XLA."""
    from tools.bench_gfstack import bench_stack, make_problem

    lib, durations, starttimes, slips = make_problem(
        C=2000, T=8, P=12, D=6, S=16, N=256)
    pallas_ms = bench_stack(lib, durations, starttimes, slips,
                            "multilinear", "pallas", target_ms=400.0)
    xla_ms = bench_stack(lib, durations, starttimes, slips,
                         "multilinear", "xla", target_ms=400.0)
    return pallas_ms, xla_ms


def bench_fullmt_inversion():
    """
    The BASELINE.json north star in its own terms: a **full FullMT SMC
    inversion** (n_chains=500, n_steps=300 — the reference FullMT
    per-stage step count, ``config_geometry.yaml:190``) end-to-end on
    chip, reported as wall-clock seconds with a posterior-moment check
    against the synthetic truth (depth 9 km, Mw 5.8).

    vs-CPU: the reference's FullMT run (n_chains=2000) takes "several
    hours / few days" on its multi-CPU author machine
    (``docs/examples/FullMT_regional.rst:317``); assume 12 h and linear
    scaling in chains → 500 chains ≈ 3 h = 10 800 s.  Documented
    estimate, not a measurement — the reference publishes no numbers.
    """
    from __graft_entry__ import _build_flagship
    from beat_tpu.samplers import SMCParams

    problem = _build_flagship(n_stations=8, nt=256)
    problem.sampler_params = SMCParams(n_chains=500, n_steps=300, seed=3)
    t0 = time.time()
    q_tr, _ = problem.sample()
    wall = time.time() - t0

    final = np.asarray(q_tr[-1])
    est = problem.ordering.to_point(final.mean(axis=0))
    depth = float(np.asarray(est["depth"]))
    mag = float(np.asarray(est["magnitude"]))
    moments_ok = bool(abs(depth - 9e3) < 500.0 and abs(mag - 5.8) < 0.05)
    return wall, depth, mag, moments_ok


FULLMT_CPU_SECONDS = 10_800.0  # documented estimate (see bench_fullmt_inversion)


def _probe_backend(attempts: int = 3, timeout_s: int = 120) -> None:
    """Fail fast (with retries) when the TPU tunnel is unreachable —
    backend init otherwise hangs for many minutes before erroring."""
    import subprocess
    import sys

    probe = ("import jax; d = jax.devices(); "
             "print(d[0].platform, len(d))")
    last = None
    for i in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=timeout_s)
            if out.returncode == 0:
                return
            last = out.stderr.strip().splitlines()[-1:] or ["rc != 0"]
        except subprocess.TimeoutExpired:
            last = [f"backend init did not answer within {timeout_s}s"]
        if i + 1 < attempts:
            time.sleep(30)
    print(f"bench: JAX backend unavailable after {attempts} probes: "
          f"{last[0] if last else 'unknown'}", file=sys.stderr)
    sys.exit(2)


def main():
    _probe_backend()
    evals_per_sec = bench_smc_evals()
    stack_pallas_ms, stack_xla_ms = bench_gf_stack()
    inv_wall, inv_depth, inv_mag, inv_ok = bench_fullmt_inversion()
    print(json.dumps({
        "metric": "SMC forward-model evals/sec/chip (FullMT)",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / BASELINE_EVALS_PER_SEC, 2),
        "extra": {
            "ffi_gf_stack_pallas_ms_per_2000chain_eval": round(stack_pallas_ms, 3),
            "ffi_gf_stack_xla_ms_per_2000chain_eval": round(stack_xla_ms, 3),
            "ffi_gf_stack_speedup": round(stack_xla_ms / stack_pallas_ms, 2),
            # BASELINE.json north star: full FullMT inversion, 500 chains
            "fullmt_inversion_500chain_wallclock_s": round(inv_wall, 1),
            "fullmt_inversion_vs_cpu_estimate": round(
                FULLMT_CPU_SECONDS / inv_wall, 1),
            "fullmt_posterior_depth_m": round(inv_depth, 1),
            "fullmt_posterior_mag": round(inv_mag, 3),
            "fullmt_posterior_moments_ok": inv_ok,
        },
    }))


if __name__ == "__main__":
    main()
