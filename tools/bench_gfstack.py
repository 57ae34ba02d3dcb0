"""
Kinematic GF-stack micro-benchmark (the BASELINE.json second metric:
"FFI GF-stack wall-clock").

Measures the fused Pallas kernel vs the XLA gather+einsum fallback for a
lockstep chain batch, using an ON-DEVICE ``lax.scan`` loop and the slope
between two iteration counts — the only reliable method over a remote
(tunnelled) TPU where per-dispatch wall-clock is dominated by ~30-50 ms
RTT jitter and small computations can complete before a single
round-trip (see STATUS.md "Benchmarking over the axon tunnel").

Usage: python tools/bench_gfstack.py C T P D S N {nearest_neighbor|multilinear} {pallas|xla} [target_ms]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_problem(C, T, P, D, S, N, seed=0, keep_data=None):
    from beat_tpu.ffi import SeismicGFLibrary

    rng = np.random.default_rng(seed)
    data = rng.normal(size=(T, P, D, S, N)).astype(np.float32)
    if keep_data is None:
        # big libraries: stacking layout only (halves the HBM footprint)
        keep_data = data.nbytes < 2 << 30
    lib = SeismicGFLibrary(
        data=jnp.asarray(data), duration_min=0.5, duration_sampling=0.5,
        starttime_min=0.0,
        starttime_sampling=0.25).with_stacking_layout(keep_data=keep_data)
    durations = jnp.asarray(rng.uniform(0.5, 2.0, (C, P)).astype(np.float32))
    starttimes = jnp.asarray(rng.uniform(0.0, 2.0, (C, T, P)).astype(np.float32))
    slips = jnp.asarray(rng.uniform(0, 3, (C, P)).astype(np.float32))
    return lib, durations, starttimes, slips


def bench_stack(lib, durations, starttimes, slips, interp, mode,
                target_ms=600.0):
    """Returns ms per lockstep stack evaluation
    (:func:`beat_tpu.profiling.slope_time`)."""
    from beat_tpu.ops.gfstack import stack_all_pallas
    from beat_tpu.profiling import slope_time

    if mode == "pallas":
        def stack(lib, d, s, w):
            return jax.vmap(lambda dd, ss, ww: stack_all_pallas(
                lib, dd, ss, ww, interp))(d, s, w)
    else:
        def stack(lib, d, s, w):
            return jax.vmap(lambda dd, ss, ww: lib.stack_all(
                dd, ss, ww, interp))(d, s, w)

    @partial(jax.jit, static_argnums=(4,))
    def scan_stacks(lib, d, s, w, n):
        def body(eps, _):
            out = stack(lib, d, s, w + eps)
            return jnp.float32(1e-20) * jnp.sum(out), 0
        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return eps

    def run(n, rep):
        w = slips + jnp.float32(1e-7 * rep)
        float(scan_stacks(lib, durations, starttimes, w, n))

    # pilot estimate, then scale n_hi so slope·(n_hi−n_lo) ≳ target_ms
    n_lo, n_hi = 2, 34
    pilot = slope_time(run, n_lo, n_hi, reps=1)
    if pilot * (n_hi - n_lo) * 1e3 < target_ms:
        n_hi = n_lo + max(32, min(4096, int(target_ms / max(pilot * 1e3, 1e-3))))
    return slope_time(run, n_lo, n_hi) * 1e3


def main():
    C, T, P, D, S, N = map(int, sys.argv[1:7])
    interp, mode = sys.argv[7], sys.argv[8]
    target = float(sys.argv[9]) if len(sys.argv) > 9 else 600.0
    lib, durations, starttimes, slips = make_problem(C, T, P, D, S, N)
    ms = bench_stack(lib, durations, starttimes, slips, interp, mode, target)
    print(f"{mode} {interp[:5]} C={C} T={T} P={P} D={D} S={S} N={N}: "
          f"{ms:.3f} ms/eval")


if __name__ == "__main__":
    main()
