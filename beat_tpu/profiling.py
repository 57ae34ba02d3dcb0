"""
Structured profiling: per-stage timing registry + JAX profiler hooks.

The reference has only ad-hoc timers (``Metropolis.time_per_sample``
``beat/sampler/metropolis.py:259``, debug timers around synthesis
``heart.py:3656-3695``, ``utility.time_method`` ``utility.py:1576``);
SURVEY §5 prescribes native JAX-profiler integration and a per-stage
timing surface for the rebuild.

Three layers:

* :class:`TimingRegistry` / :func:`stage_timer` — samplers record each
  stage's wall-clock + evaluation count; ``timings.report()`` gives a
  structured dict (also dumped next to the trace stages as
  ``timings.json`` when sampling with a homepath).
* :func:`time_method` — decorator logging call durations (reference
  ``utility.time_method``) into the registry.
* :func:`jax_trace` — context manager around ``jax.profiler.trace``
  writing a TensorBoard/perfetto trace; activated for sampling runs via
  ``BEAT_TPU_PROFILE_DIR`` or the CLI ``sample --profile``.
* :func:`time_per_sample` — measures the jitted per-evaluation cost of
  a logp function with the slope method (two scan lengths), robust to
  dispatch/tunnel latency (reference ``Metropolis.time_per_sample``).
"""

from __future__ import annotations

import contextlib
import functools
import json
import logging
import os
import time
from dataclasses import dataclass, field

logger = logging.getLogger("beat_tpu.profiling")


@dataclass
class StageRecord:
    name: str
    wall_s: float
    n_evals: int | None = None
    extra: dict = field(default_factory=dict)

    @property
    def evals_per_s(self):
        if not self.n_evals or self.wall_s <= 0:
            return None
        return self.n_evals / self.wall_s


@dataclass
class TimingRegistry:
    """Accumulates named timing records for the current process."""

    records: list = field(default_factory=list)

    def add(self, name, wall_s, n_evals=None, **extra):
        rec = StageRecord(name, wall_s, n_evals, extra)
        self.records.append(rec)
        return rec

    def reset(self):
        self.records.clear()

    def report(self) -> dict:
        """Structured report: per-record rows + totals."""
        rows = []
        for r in self.records:
            row = {"name": r.name, "wall_s": round(r.wall_s, 6)}
            if r.n_evals:
                row["n_evals"] = r.n_evals
                rate = r.evals_per_s   # None when wall_s is degenerate
                if rate is not None:
                    row["evals_per_s"] = round(rate, 1)
            row.update(r.extra)
            rows.append(row)
        total = sum(r.wall_s for r in self.records)
        evals = sum(r.n_evals or 0 for r in self.records)
        return {"stages": rows, "total_wall_s": round(total, 6),
                "total_evals": evals}

    def summary(self) -> str:
        rep = self.report()
        lines = [f"{row['name']:<24} {row['wall_s']:>10.3f} s"
                 + (f"  {row['evals_per_s']:>12.1f} evals/s"
                    if "evals_per_s" in row else "")
                 for row in rep["stages"]]
        lines.append(f"{'total':<24} {rep['total_wall_s']:>10.3f} s")
        return "\n".join(lines)

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=1)


#: process-global registry the samplers record into
timings = TimingRegistry()


@contextlib.contextmanager
def stage_timer(name: str, n_evals: int | None = None, registry=None, **extra):
    """Record a named stage's wall-clock into the registry."""
    reg = registry if registry is not None else timings
    t0 = time.perf_counter()
    try:
        yield
    finally:
        rec = reg.add(name, time.perf_counter() - t0, n_evals, **extra)
        logger.debug("%s: %.3f s%s", name, rec.wall_s,
                     f" ({rec.evals_per_s:.1f} evals/s)"
                     if rec.evals_per_s else "")


def time_method(fn):
    """Decorator recording each call's duration (reference
    ``utility.time_method``)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with stage_timer(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapped


@contextlib.contextmanager
def jax_trace(logdir: str | None = None):
    """JAX profiler trace around a block.  ``logdir=None`` resolves from
    ``BEAT_TPU_PROFILE_DIR`` (no-op when unset)."""
    logdir = logdir or os.environ.get("BEAT_TPU_PROFILE_DIR")
    if not logdir:
        yield None
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    logger.info("JAX profiler trace -> %s", logdir)
    with jax.profiler.trace(logdir):
        yield logdir


def annotate(name: str):
    """Named profiler region for device work inside a traced block
    (shows up in the TensorBoard timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def slope_time(run, n_lo: int = 2, n_hi: int = 32, reps: int = 3) -> float:
    """
    Seconds per iteration via the two-length slope method — the one
    reliable way to time device work over a remote/tunnelled backend
    where per-dispatch RTT (~30-50 ms, jittery) can exceed device time
    and same-argument replays may complete without a round-trip.

    ``run(n, rep)`` must execute ``n`` iterations on device and
    host-sync before returning; distinct ``rep`` values must vary the
    arguments slightly (replay-cache workaround).  Both lengths are
    invoked once first to absorb compilation.
    """
    run(n_lo, 0)
    run(n_hi, 0)

    def timed(n):
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            run(n, r + 1)
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(n_hi) - timed(n_lo)) / (n_hi - n_lo), 1e-12)


def time_per_sample(logp_fn, q, logp_args=(), n_lo: int = 2, n_hi: int = 32):
    """
    Per-evaluation device time of a (chain-batched) logp via
    :func:`slope_time` over an on-device ``lax.scan`` (reference
    ``Metropolis.time_per_sample`` times 10 evals naively — meaningless
    over a remote tunnel).

    Returns seconds per lockstep evaluation (all chains in ``q``).
    """
    import jax
    import jax.numpy as jnp

    batched = jax.vmap(lambda x: logp_fn(x, *logp_args))

    @functools.partial(jax.jit, static_argnums=(1,))
    def scan_evals(q, n):
        def body(eps, _):
            return jnp.float32(1e-20) * jnp.sum(batched(q + eps)), None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return eps

    def run(n, rep):
        float(scan_evals(q + jnp.float32(1e-7 * rep), n))

    return slope_time(run, n_lo, n_hi)
