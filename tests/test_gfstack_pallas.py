"""Pallas kinematic-stack kernel vs the XLA reference (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beat_tpu.ffi import SeismicGFLibrary
from beat_tpu.ops.gfstack import stack_all_pallas


@pytest.fixture
def lib():
    rng = np.random.default_rng(0)
    nt, npch, nd, nst, ns = 3, 11, 4, 9, 128
    data = rng.normal(size=(nt, npch, nd, nst, ns)).astype(np.float32)
    return SeismicGFLibrary(
        data=jnp.asarray(data), duration_min=0.5, duration_sampling=0.5,
        starttime_min=0.0, starttime_sampling=0.25)


def test_pallas_matches_xla(lib):
    rng = np.random.default_rng(1)
    durations = rng.uniform(0.5, 2.0, lib.npatches)
    starttimes = rng.uniform(0.0, 2.0, (lib.ntargets, lib.npatches))
    slips = rng.uniform(0, 3, lib.npatches).astype(np.float32)

    want = np.asarray(lib.stack_all(jnp.asarray(durations), jnp.asarray(starttimes),
                                    jnp.asarray(slips), "nearest_neighbor"))
    didx, _ = lib.durations2idxs(jnp.asarray(durations))
    sidx, _ = lib.starttimes2idxs(jnp.asarray(starttimes))
    got = np.asarray(stack_all_pallas(jnp.asarray(lib.data), didx, sidx,
                                      jnp.asarray(slips), interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_nonmultiple_patch_block(lib):
    """npatches=11 is not a multiple of the DMA block — padding must mask."""
    slips = np.zeros(lib.npatches, dtype=np.float32)
    slips[-1] = 2.0  # only the last patch contributes
    didx = jnp.zeros(lib.npatches, dtype=jnp.int32)
    sidx = jnp.ones((lib.ntargets, lib.npatches), dtype=jnp.int32)
    got = np.asarray(stack_all_pallas(jnp.asarray(lib.data), didx, sidx,
                                      jnp.asarray(slips), interpret=True))
    want = 2.0 * np.asarray(lib.data)[:, -1, 0, 1, :]
    np.testing.assert_allclose(got, want, rtol=1e-6)
