"""
Pallas TPU kernel for the kinematic Green's-function stack — THE hot op
of kinematic FFI (reference ``SeismicGFLibrary.stack_all``
``beat/ffi/base.py:607``: pytensor ``batched_dot`` over a 5-D fancy
gather).

Computes, for the 5-D library ``data[target, patch, duration, start, t]``:

    out[target, t] = Σ_p data[target, p, didx[p], sidx[target, p], t] · slips[p]

Design: one grid step per target; the (duration, starttime) cell of each
patch is DMA'd HBM→VMEM in blocks of 8 patches (sublane-aligned, loop
unrolled so scratch indices are static for Mosaic) with double
buffering, using scalar-prefetched indices
(``PrefetchScalarGridSpec``); the weighted accumulation runs on the VPU
while the next block is in flight, and the finished row is DMA'd back to
the HBM output (dynamic row stores into VMEM blocks are not
sublane-provable).  This avoids materialising the gathered
(ntargets, npatches, nsamples) intermediate of the XLA gather path.

The XLA fallback (:meth:`SeismicGFLibrary.stack_all`) remains the
reference implementation; ``stack_all_pallas`` must match it exactly
(tested in interpret mode on CPU).

Deployment note: the current Mosaic compiler rejects single-row HBM
slices along the tiled starttime axis ("slice shape along dimension 3
must be aligned to tiling (8)"), so native TPU compilation of this
kernel needs either an (ndur·nstart)-padded row layout or a newer
Mosaic.  Until then the kernel is opt-in (``BEAT_TPU_USE_PALLAS=1``) and
the default path is the XLA gather+einsum, whose gathered intermediate
is small at FFI scales (tens of MB) and HBM-bandwidth bound either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_BLOCK = 8  # sublane-aligned DMA block


def _stack_kernel(didx_ref, sidx_ref, slips_ref, data_hbm, out_hbm,
                  scratch, acc, sems, out_sem, *, npatches, nsamples, nblocks):
    # didx/sidx/slips are scalar-prefetch (SMEM): arbitrary dynamic
    # indexing is legal there, unlike VMEM lanes
    t = pl.program_id(0)

    def patch_dma(slot, j, block):
        p = block * PATCH_BLOCK + j
        p_safe = jnp.minimum(p, npatches - 1)
        d = didx_ref[p_safe]
        s = sidx_ref[t * npatches + p_safe]
        return pltpu.make_async_copy(
            data_hbm.at[t, p_safe, d, s],
            scratch.at[slot, j],      # j static (unrolled) → provable offset
            sems.at[slot, j],
        )

    def start_block(slot, block):
        for j in range(PATCH_BLOCK):  # unrolled: static scratch indices
            patch_dma(slot, j, block).start()

    def wait_block(slot, block):
        for j in range(PATCH_BLOCK):
            patch_dma(slot, j, block).wait()

    acc[...] = jnp.zeros((1, nsamples), dtype=acc.dtype)
    start_block(0, 0)

    def body(block, _):
        slot = block % 2

        @pl.when(block + 1 < nblocks)
        def _():
            start_block((block + 1) % 2, block + 1)

        wait_block(slot, block)

        # mask rows beyond npatches (they hold the clamped duplicate row);
        # weights gathered elementwise from SMEM (unrolled, static shape)
        base = block * PATCH_BLOCK
        w = jnp.stack([jnp.where(base + j < npatches,
                                 slips_ref[jnp.minimum(base + j, npatches - 1)],
                                 0.0)
                       for j in range(PATCH_BLOCK)])
        acc[...] += jnp.sum(scratch[slot] * w[:, None], axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)

    # ship the finished row to HBM (dynamic-row VMEM stores are not
    # sublane-provable; HBM DMA offsets may be dynamic)
    out_cp = pltpu.make_async_copy(acc.at[0], out_hbm.at[t], out_sem)
    out_cp.start()
    out_cp.wait()


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
    npatches_pad = ((npatches + PATCH_BLOCK - 1) // PATCH_BLOCK) * PATCH_BLOCK
    nblocks = npatches_pad // PATCH_BLOCK

    kernel = functools.partial(_stack_kernel, npatches=npatches,
                               nsamples=nsamples, nblocks=nblocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # didx, sidx (flattened), slips
        grid=(ntargets,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # data stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # written via DMA
        scratch_shapes=[
            pltpu.VMEM((2, PATCH_BLOCK, nsamples), jnp.float32),
            pltpu.VMEM((1, nsamples), jnp.float32),
            pltpu.SemaphoreType.DMA((2, PATCH_BLOCK)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntargets, nsamples), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(didx.astype(jnp.int32), sidx.reshape(-1).astype(jnp.int32),
      slips.astype(jnp.float32), data)


def stack_all_auto(lib, durations, starttimes, slips,
                   interpolation="nearest_neighbor", use_pallas=None):
    """
    Dispatch between the Pallas kernel (TPU, nearest-neighbour) and the
    XLA gather+einsum fallback.  The Pallas path is opt-in
    (``use_pallas=True`` or ``BEAT_TPU_USE_PALLAS=1``) until validated on
    the deployment's Mosaic version.
    """
    import os

    if use_pallas is None:
        use_pallas = (os.environ.get("BEAT_TPU_USE_PALLAS") == "1"
                      and interpolation == "nearest_neighbor"
                      and jax.devices()[0].platform == "tpu")
    if not use_pallas or interpolation != "nearest_neighbor":
        return lib.stack_all(durations, starttimes, slips, interpolation)
    didx, _ = lib.durations2idxs(durations, "nearest_neighbor")
    sidx, _ = lib.starttimes2idxs(starttimes, "nearest_neighbor")
    return stack_all_pallas(jnp.asarray(lib.data), didx, sidx, slips)
