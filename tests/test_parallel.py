"""
Chain-parallel sharding over the (virtual, 8-device) mesh: the sampler
must produce identical results sharded vs single-device, with chain
state actually distributed (replaces the reference's fork-pool tests,
e.g. ``test/test_paripool.py`` — process semantics have no analogue
here; what must hold is SPMD correctness).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beat_tpu.parallel import (
    CHAIN_AXIS,
    chain_sharding,
    make_chain_mesh,
    pad_chains,
    replicated,
    shard_chain_state,
)
from beat_tpu.samplers.metropolis import init_metropolis_state, run_metropolis_stage


def logp(x):
    return -0.5 * jnp.sum(x * x) / 0.04


N_CHAINS = 32
DIM = 3


def make_state(key):
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.uniform(-1, 1, size=(N_CHAINS, DIM)), dtype=jnp.float32)
    return init_metropolis_state(logp, q0, key)


def run(state, cov_chol, lo, hi):
    final, (q_tr, llk_tr) = run_metropolis_stage(
        logp, state, jnp.float32(1.0), cov_chol, lo, hi,
        n_steps=20, tune_interval=10)
    return final


class TestChainMesh:
    def test_mesh_has_8_devices(self):
        mesh = make_chain_mesh()
        assert mesh.devices.size == 8

    def test_pad_chains(self):
        assert pad_chains(30, 8) == 32
        assert pad_chains(32, 8) == 32

    def test_sharded_equals_unsharded(self):
        key = jax.random.PRNGKey(7)
        cov_chol = jnp.eye(DIM, dtype=jnp.float32) * 0.1
        lo = jnp.full((DIM,), -2.0)
        hi = jnp.full((DIM,), 2.0)

        final_single = run(make_state(key), cov_chol, lo, hi)

        mesh = make_chain_mesh()
        state = shard_chain_state(make_state(key), mesh)
        cov_r = jax.device_put(cov_chol, replicated(mesh))
        final_sharded = run(state, cov_r,
                            jax.device_put(lo, replicated(mesh)),
                            jax.device_put(hi, replicated(mesh)))

        np.testing.assert_allclose(np.asarray(final_sharded.q),
                                   np.asarray(final_single.q), atol=1e-6)
        np.testing.assert_allclose(np.asarray(final_sharded.llk),
                                   np.asarray(final_single.llk), atol=1e-5)

    def test_state_is_actually_sharded(self):
        mesh = make_chain_mesh()
        state = shard_chain_state(make_state(jax.random.PRNGKey(0)), mesh)
        shardings = {len(d) for d in [state.q.sharding.device_set]}
        assert len(state.q.sharding.device_set) == 8
        # per-device shard holds N_CHAINS/8 rows
        shard = state.q.addressable_shards[0]
        assert shard.data.shape == (N_CHAINS // 8, DIM)

    def test_dryrun_multichip(self):
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
