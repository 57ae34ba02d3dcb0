"""Profiling subsystem: per-stage timing registry, time_method,
JAX-profiler hook, slope-method per-eval timing (SURVEY §5)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from beat_tpu.profiling import (TimingRegistry, jax_trace, stage_timer,
                                time_method, time_per_sample, timings)


def test_registry_and_stage_timer():
    reg = TimingRegistry()
    with stage_timer("stage_a", n_evals=1000, registry=reg, beta=0.5):
        sum(range(10000))
    with stage_timer("stage_b", registry=reg):
        pass
    rep = reg.report()
    assert [r["name"] for r in rep["stages"]] == ["stage_a", "stage_b"]
    assert rep["stages"][0]["n_evals"] == 1000
    assert rep["stages"][0]["evals_per_s"] > 0
    assert rep["stages"][0]["beta"] == 0.5
    assert rep["total_wall_s"] >= rep["stages"][0]["wall_s"]
    assert "stage_a" in reg.summary() and "evals/s" in reg.summary()


def test_time_method_decorator():
    reg_len = len(timings.records)

    @time_method
    def work():
        return 42

    assert work() == 42
    assert len(timings.records) == reg_len + 1
    assert timings.records[-1].name.endswith("work")


def test_jax_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("BEAT_TPU_PROFILE_DIR", raising=False)
    with jax_trace() as d:
        assert d is None


def test_jax_trace_writes(tmp_path):
    logdir = str(tmp_path / "prof")
    with jax_trace(logdir):
        jnp.sum(jnp.ones((32, 32)) @ jnp.ones((32, 32))).block_until_ready()
    found = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert found, "profiler trace produced no files"


def test_time_per_sample_slope():
    def logp(x):
        return -0.5 * jnp.sum(x**2)

    q = jnp.asarray(np.random.default_rng(0).normal(size=(64, 4)),
                    dtype=jnp.float32)
    dt = time_per_sample(logp, q)
    assert 0 < dt < 1.0  # seconds per lockstep eval, sane on CPU


def test_smc_dumps_timings(tmp_path):
    from beat_tpu.samplers import SMCParams, smc_sample

    def logp(x):
        return -0.5 * jnp.sum((x - 1.0) ** 2) / 0.09

    lo, hi = np.zeros(2), np.full(2, 3.0)
    timings.reset()
    smc_sample(logp, lo, hi, SMCParams(n_chains=32, n_steps=10, seed=1),
               homepath=str(tmp_path / "run"))
    tf = tmp_path / "run" / "timings.json"
    assert tf.exists()
    rep = json.loads(tf.read_text())
    assert rep["total_evals"] > 0
    names = [r["name"] for r in rep["stages"]]
    assert any(n.startswith("smc_stage_") for n in names)
    assert names[-1] == "smc_stage_-1"
