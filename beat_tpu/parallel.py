"""
Device-mesh helpers: chain-parallel sharding over TPU meshes.

Replaces the reference's process-level runtime wholesale
(``beat/parallel.py`` fork pools + RawArray shared memory,
``beat/sampler/distributed.py`` MPI): Markov chains are rows of device
arrays sharded over a 1-D ``chains`` mesh axis; Green's-function tables
and weight matrices are replicated (or sharded when larger than HBM).
XLA inserts the collectives — swaps and resampling become gathers /
permutations on sharded arrays, not messages.
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("beat_tpu.parallel")

CHAIN_AXIS = "chains"


def make_chain_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first n) local devices.

    Fails loudly when fewer devices exist than requested — a silent
    1-device mesh would fake multi-chip results."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available "
                f"(platform={devices[0].platform})")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (CHAIN_AXIS,))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Rows (chains) split across the mesh; trailing dims replicated."""
    return NamedSharding(mesh, P(CHAIN_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_chain_state(state, mesh: Mesh):
    """
    Place a :class:`MetropolisState` (or any pytree whose array leaves
    have a leading chains axis) on the mesh: chain-indexed leaves are
    sharded, scalars/keys replicated.
    """
    cs = chain_sharding(mesh)
    rep = replicated(mesh)
    n_chains = state.q.shape[0]

    def place(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == n_chains:
            return jax.device_put(leaf, cs)
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map(place, state)


def pad_chains(n_chains: int, n_devices: int) -> int:
    """Round the chain count up to a multiple of the device count."""
    return ((n_chains + n_devices - 1) // n_devices) * n_devices
