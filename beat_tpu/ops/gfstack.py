"""
Pallas TPU kernel for the kinematic Green's-function stack — THE hot op
of kinematic FFI (reference ``SeismicGFLibrary.stack_all``
``beat/ffi/base.py:607``: pytensor ``batched_dot`` over a 5-D fancy
gather).

Computes, for the 5-D library ``data[target, patch, duration, start, t]``:

    out[target, t] = Σ_p data[target, p, didx[p], sidx[target, p], t] · slips[p]

Design: one grid step per target; the (duration, starttime) cell of each
patch is DMA'd HBM→VMEM in blocks of 8 patches (sublane-aligned) with
double buffering, using scalar-prefetched indices
(``PrefetchScalarGridSpec``); the weighted accumulation runs on the VPU
while the next block is in flight.  This avoids materialising the
gathered (ntargets, npatches, nsamples) intermediate that the XLA
gather+einsum path writes to HBM.

The XLA fallback (:meth:`SeismicGFLibrary.stack_all`) remains the
reference implementation; ``stack_all_pallas`` must match it exactly
(tested in interpret mode on CPU, at speed on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_BLOCK = 8  # sublane-aligned DMA block


def _stack_kernel(didx_ref, sidx_ref, slips_ref, data_hbm, out_ref,
                  scratch, sems, *, npatches, nsamples, nblocks):
    t = pl.program_id(0)

    def start_block(slot, block):
        def start_one(j, _):
            p = block * PATCH_BLOCK + j

            @pl.when(p < npatches)
            def _():
                d = didx_ref[p]
                s = sidx_ref[t * npatches + p]
                cp = pltpu.make_async_copy(
                    data_hbm.at[t, p, d, s],
                    scratch.at[slot, j],
                    sems.at[slot, j],
                )
                cp.start()
            return 0

        jax.lax.fori_loop(0, PATCH_BLOCK, start_one, 0)

    def wait_block(slot, block):
        def wait_one(j, _):
            p = block * PATCH_BLOCK + j

            @pl.when(p < npatches)
            def _():
                d = didx_ref[p]
                s = sidx_ref[t * npatches + p]
                pltpu.make_async_copy(
                    data_hbm.at[t, p, d, s],
                    scratch.at[slot, j],
                    sems.at[slot, j],
                ).wait()
            return 0

        jax.lax.fori_loop(0, PATCH_BLOCK, wait_one, 0)

    out_ref[...] = jnp.zeros((1, nsamples), dtype=out_ref.dtype)
    start_block(0, 0)

    def body(block, _):
        slot = block % 2

        @pl.when(block + 1 < nblocks)
        def _():
            start_block((block + 1) % 2, block + 1)

        wait_block(slot, block)

        # weights for this block; rows beyond npatches were never DMA'd
        # (may hold garbage) — mask the values, not just the weights
        base = block * PATCH_BLOCK
        pids = base + jax.lax.broadcasted_iota(jnp.int32, (PATCH_BLOCK, 1), 0)[:, 0]
        mask = pids < npatches
        w = jax.lax.dynamic_slice(slips_ref[...], (base,), (PATCH_BLOCK,))
        contrib = jnp.where(mask[:, None], scratch[slot] * w[:, None], 0.0)
        out_ref[...] += jnp.sum(contrib, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)


def stack_all_pallas(data, didx, sidx, slips, interpret: bool = False):
    """
    Nearest-neighbour kinematic stack via the fused Pallas kernel.

    data : (ntargets, npatches, ndur, nstart, nsamples) float32 (HBM)
    didx : (npatches,) int32 duration indexes
    sidx : (ntargets, npatches) int32 starttime indexes
    slips : (npatches,) float32

    Returns (ntargets, nsamples) float32.
    """
    ntargets, npatches, ndur, nstart, nsamples = data.shape
    # slips padded so dynamic_slice blocks stay in range
    npatches_pad = ((npatches + PATCH_BLOCK - 1) // PATCH_BLOCK) * PATCH_BLOCK
    slips_pad = jnp.zeros(npatches_pad, jnp.float32).at[:npatches].set(
        slips.astype(jnp.float32))
    nblocks = npatches_pad // PATCH_BLOCK

    kernel = functools.partial(_stack_kernel, npatches=npatches,
                               nsamples=nsamples, nblocks=nblocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # didx, sidx (flattened)
        grid=(ntargets,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # slips
            pl.BlockSpec(memory_space=pl.ANY),    # data stays in HBM
        ],
        out_specs=pl.BlockSpec((1, nsamples), lambda t, didx, sidx: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, PATCH_BLOCK, nsamples), jnp.float32),
            pltpu.SemaphoreType.DMA((2, PATCH_BLOCK)),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntargets, nsamples), jnp.float32),
        interpret=interpret,
    )(didx.astype(jnp.int32), sidx.reshape(-1).astype(jnp.int32),
      slips_pad, data)


def stack_all_auto(lib, durations, starttimes, slips,
                   interpolation="nearest_neighbor", use_pallas=None):
    """
    Dispatch between the Pallas kernel (TPU, nearest-neighbour) and the
    XLA gather+einsum fallback.
    """
    if use_pallas is None:
        use_pallas = (interpolation == "nearest_neighbor"
                      and jax.devices()[0].platform == "tpu")
    if not use_pallas or interpolation != "nearest_neighbor":
        return lib.stack_all(durations, starttimes, slips, interpolation)
    didx, _ = lib.durations2idxs(durations, "nearest_neighbor")
    sidx, _ = lib.starttimes2idxs(starttimes, "nearest_neighbor")
    return stack_all_pallas(jnp.asarray(lib.data), didx, sidx, slips)
