"""
True-DMA row gather for large GF tables.

``out[i] = tbl[idx[i]]`` with per-row asynchronous HBM→VMEM copies.

First-generation table-size-independent gather, kept as a measured
baseline: 4 separate row DMAs per query plus an HBM blend round trip
leave it DMA-issue bound at ~65-77 GB/s effective
(tools/bench_gather).  SUPERSEDED by the fused corner-block kernel in
:mod:`beat_tpu.ops.bilgather` (one strided ``[cd:cd+2, z0:z0+2]`` DMA
per query, blended in VMEM, ~860 GB/s raw — the TPU default for
tables past 8 MB).  The reference's analogous hot path is the pyrocko
store read in ``engine.process``, ``beat/heart.py:3564``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128
#: in-flight row DMAs per grid step (ring of semaphores)
N_BUF = 64


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnums=(2, 3))
def _gather_rows_call(tbl3, idx, block_rows: int, interpret: bool):
    """``tbl3 (R, 8, L)`` — each logical row pre-shaped as one full
    (8, L)-sublane tile so a single-row DMA slice is tiling-aligned
    (Mosaic rejects 1-sublane slices of a 2-D operand)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, _, L = tbl3.shape
    n = idx.shape[0]

    def kernel(idx_ref, tbl_ref, out_ref):
        i = pl.program_id(0)

        def body(sem):
            def copy(k, slot):
                r = idx_ref[i * block_rows + k]
                return pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(r, 1)],
                    out_ref.at[pl.ds(k, 1)],
                    sem.at[slot])

            for k0 in range(min(N_BUF, block_rows)):
                copy(k0, k0).start()

            def loop(k, _):
                copy(k, jax.lax.rem(k, N_BUF)).wait()

                @pl.when(k + N_BUF < block_rows)
                def _():
                    kn = k + N_BUF
                    copy(kn, jax.lax.rem(kn, N_BUF)).start()

                return 0

            jax.lax.fori_loop(0, block_rows, loop, 0)

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((N_BUF,)))

    grid = (n // block_rows,)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((block_rows, 8, L),
                                   lambda i, idx_ref: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, 8, L), tbl3.dtype),
        interpret=interpret,
    )(idx, tbl3)


def gather_rows_pallas(tbl, idx, block_rows: int = 256,
                       interpret: bool = False):
    """
    ``tbl (R, M) f32, idx (n,) int32 → (n, M)``: row gather whose HBM
    traffic is ``n`` rows + the output — independent of ``R`` (XLA's
    gather/one-hot lowering streams all ``R`` rows instead).

    The table's row length is padded to a lane multiple and ``idx`` to
    a block multiple internally; both paddings are trimmed from the
    result.
    """
    R, M = tbl.shape
    # each row padded to a full (8, L) f32 tile, L a lane multiple
    Mp = _ceil_to(M, 8 * LANE)
    if Mp != M:
        # per-call pad/reshape: loop-invariant under scan/vmap, XLA
        # hoists it out of the sampler's step loop
        tbl = jnp.pad(tbl, ((0, 0), (0, Mp - M)))
    tbl3 = jnp.reshape(tbl, (R, 8, Mp // 8))
    n = int(idx.shape[0])
    block_rows = min(block_rows, _ceil_to(n, N_BUF))
    npad = _ceil_to(n, block_rows)
    idx_p = jnp.clip(jnp.pad(idx.astype(jnp.int32), (0, npad - n)), 0, R - 1)
    out = _gather_rows_call(tbl3, idx_p, block_rows, interpret)
    return jnp.reshape(out, (npad, Mp))[:n, :M]


def gather_rows_reference(tbl, idx):
    """numpy reference for tests."""
    return np.asarray(tbl)[np.asarray(idx)]
