"""
Fused bilinear row gather+blend for large GF tables.

``out[i] = Σ_{a,b∈{0,1}} w[i,a,b] · tbl[cd[i]+a, z0[i]+b]`` — the
4-corner bilinear interpolation of :meth:`GreensTable.gather_spectra`
(``beat_tpu/heart/gftable.py``) as ONE asynchronous HBM→VMEM DMA per
output row.

Why this kernel (round-5 measurements, ``bench_hbm_measured``):

* XLA lowers both the one-hot matmul and ``jnp.take`` corner gathers
  into whole-table streaming — per-eval cost grows linearly with table
  bytes (~13-17 effective passes of a 305 MB table per 512-chain eval).
* The first-generation row-gather (``ops/rowgather.py``) reads only the
  needed rows but pays 4 separate row DMAs per output plus a full
  materialize-then-blend round trip through HBM; it is DMA-issue-latency
  bound at ~54 GB/s.
* Here the table is laid out ``(3·nd, nz, row)`` so the 4 bilinear
  corners of a query are the CONTIGUOUS block ``[cd:cd+2, z0:z0+2]``:
  one strided DMA fetches all 4 corner rows, and the weighted blend
  happens in VMEM before a single blended row is written back.  Per
  output: 4 rows read + 1 written — table-size independent, with 4×
  fewer DMA issues and 2.25× less HBM traffic than rowgather.py.

The reference's analogous hot path is the per-draw pyrocko store read
in ``engine.process`` (``beat/heart.py:3564``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128
#: in-flight corner-block DMAs (ring of semaphores)
N_BUF = 32


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnums=(4, 5))
def _bilinear_rows_call(tbl4, cd, z0, wT, block_rows: int, interpret: bool):
    """tbl4 (CD, NZ, 8, L); cd/z0 (n,) int32 corner cell indices
    (cd ≤ CD-2, z0 ≤ NZ-2); wT (4, n) f32 corner weights in
    (00, 01, 10, 11) order — (d, z) corner offsets.  Weights ride
    TRANSPOSED through scalar prefetch: SMEM operands are lane-padded
    on the last axis, so (n, 4) would blow the 1 MB SMEM budget 32×."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CD, NZ, _, L = tbl4.shape
    n = cd.shape[0]

    def kernel(cd_ref, z0_ref, w_ref, tbl_ref, out_ref, buf, sems):
        i = pl.program_id(0)
        nb = min(N_BUF, block_rows)

        def copy(k, slot):
            c = cd_ref[i * block_rows + k]
            z = z0_ref[i * block_rows + k]
            return pltpu.make_async_copy(
                tbl_ref.at[pl.ds(c, 2), pl.ds(z, 2)],
                buf.at[slot],
                sems.at[slot])

        for k0 in range(nb):
            copy(k0, k0).start()

        def loop(k, _):
            slot = jax.lax.rem(k, nb)
            copy(k, slot).wait()
            j = i * block_rows + k
            out_ref[k] = (w_ref[0, j] * buf[slot, 0, 0]
                          + w_ref[1, j] * buf[slot, 0, 1]
                          + w_ref[2, j] * buf[slot, 1, 0]
                          + w_ref[3, j] * buf[slot, 1, 1])

            @pl.when(k + nb < block_rows)
            def _():
                kn = k + nb
                copy(kn, jax.lax.rem(kn, nb)).start()

            return 0

        jax.lax.fori_loop(0, block_rows, loop, 0)

    grid = (n // block_rows,)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((block_rows, 8, L),
                                   lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((N_BUF, 2, 2, 8, L), tbl4.dtype),
                pltpu.SemaphoreType.DMA((N_BUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n, 8, L), tbl4.dtype),
        interpret=interpret,
    )(cd, z0, wT, tbl4)


def pack_table(tbl, nd_eff: int, nz: int):
    """(ncells, M) flat table → (3·nd, nz, 8, L) DMA layout, row padded
    to a full f32 (8, 128·k) tile.  ``nd_eff = ncells // nz`` (the
    channel axis is folded into the leading dim).  Loop-invariant under
    scan/vmap — XLA hoists the pad/reshape out of the sampler loop."""
    R, M = tbl.shape
    assert R == nd_eff * nz, (R, nd_eff, nz)
    Mp = _ceil_to(M, 8 * LANE)
    if Mp != M:
        tbl = jnp.pad(tbl, ((0, 0), (0, Mp - M)))
    return jnp.reshape(tbl, (nd_eff, nz, 8, Mp // 8))


def bilinear_rows_pallas(tbl4, cd, z0, w4, block_rows: int = 256,
                         interpret: bool = False):
    """
    Blended bilinear gather on a packed table (see :func:`pack_table`).

    tbl4 : (CD, NZ, 8, L) f32 — L = padded_row/8
    cd, z0 : (n,) int — lower corner cell indices; every query must
        satisfy ``cd ≤ CD-2`` and ``z0 ≤ NZ-2`` (the gather clamps cell
        indices to the last cell upstream, so this always holds for
        grids with ≥2 nodes per axis).
    w4 : (n, 4) f32 — corner weights, (d,z) offsets (00, 01, 10, 11).

    Returns (n, 8·L) blended padded rows; slice ``[:, :M]`` for the
    logical row.
    """
    CD, NZ, _, L = tbl4.shape
    n = int(cd.shape[0])
    block_rows = min(block_rows, _ceil_to(max(n, 1), N_BUF))
    npad = _ceil_to(max(n, 1), block_rows)
    pad = npad - n
    cd_p = jnp.clip(jnp.pad(cd.astype(jnp.int32), (0, pad)), 0,
                    max(CD - 2, 0))
    z0_p = jnp.clip(jnp.pad(z0.astype(jnp.int32), (0, pad)), 0,
                    max(NZ - 2, 0))
    wT_p = jnp.pad(jnp.transpose(w4.astype(tbl4.dtype)), ((0, 0), (0, pad)))
    out = _bilinear_rows_call(tbl4, cd_p, z0_p, wT_p, block_rows, interpret)
    return jnp.reshape(out, (npad, 8 * L))[:n]


@functools.partial(jax.jit, static_argnums=(3, 4))
def _corner_rows_call(tbl4, cd, z0, block_rows: int, interpret: bool):
    """Unblended variant for the VJP: out (n, 2, 2, 8, L) = the 4
    corner rows of each query — same one-DMA-per-output structure, the
    blend skipped (the cotangent w.r.t. the weights needs the rows)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CD, NZ, _, L = tbl4.shape
    n = cd.shape[0]

    def kernel(cd_ref, z0_ref, tbl_ref, out_ref, sems):
        i = pl.program_id(0)
        nb = min(N_BUF, block_rows)

        def copy(k, slot):
            c = cd_ref[i * block_rows + k]
            z = z0_ref[i * block_rows + k]
            return pltpu.make_async_copy(
                tbl_ref.at[pl.ds(c, 2), pl.ds(z, 2)],
                out_ref.at[k],
                sems.at[slot])

        for k0 in range(nb):
            copy(k0, k0).start()

        def loop(k, _):
            slot = jax.lax.rem(k, nb)
            copy(k, slot).wait()

            @pl.when(k + nb < block_rows)
            def _():
                kn = k + nb
                copy(kn, jax.lax.rem(kn, nb)).start()

            return 0

        jax.lax.fori_loop(0, block_rows, loop, 0)

    grid = (n // block_rows,)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((block_rows, 2, 2, 8, L),
                                   lambda i, *_: (i, 0, 0, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((N_BUF,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n, 2, 2, 8, L), tbl4.dtype),
        interpret=interpret,
    )(cd, z0, tbl4)


def corner_rows_pallas(tbl4, cd, z0, block_rows: int = 256,
                       interpret: bool = False):
    """(n, 4, 8·L) unblended corner rows, order (00, 01, 10, 11)."""
    CD, NZ, _, L = tbl4.shape
    n = int(cd.shape[0])
    block_rows = min(block_rows, _ceil_to(max(n, 1), N_BUF))
    npad = _ceil_to(max(n, 1), block_rows)
    pad = npad - n
    cd_p = jnp.clip(jnp.pad(cd.astype(jnp.int32), (0, pad)), 0,
                    max(CD - 2, 0))
    z0_p = jnp.clip(jnp.pad(z0.astype(jnp.int32), (0, pad)), 0,
                    max(NZ - 2, 0))
    out = _corner_rows_call(tbl4, cd_p, z0_p, block_rows, interpret)
    return jnp.reshape(out, (npad, 4, 8 * L))[:n]


# ---------------------------------------------------------------------------
# Differentiable, vmappable wrapper — what the GreensTable gather calls
# ---------------------------------------------------------------------------
#
# The samplers vmap the log-posterior over chains (cd/z0/w4 gain a batch
# axis; the table does not) and MALA/HMC/MAP differentiate it.  Two
# custom rules make the kernel a drop-in for the one-hot matmul path:
#
# * custom_vmap: flatten (B, n) queries into one (B·n,) kernel call —
#   the kernel's DMA pipeline wants one long queue, not B tiny grids.
# * custom_vjp: d/dw4 re-gathers the 4 corner rows (one unblended DMA
#   pass) and dots them with the cotangent; the table cotangent is a
#   structural zero (XLA DCEs it — the table is data, never
#   differentiated), int index cotangents are float0.

from jax.custom_batching import custom_vmap  # noqa: E402


def _flatq(x, batched, axis_size):
    if not batched:
        x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    return jnp.reshape(x, (-1,) + x.shape[2:])


@custom_vmap
def _blended(tbl4, cd, z0, w4):
    return bilinear_rows_pallas(tbl4, cd, z0, w4,
                                interpret=_interp())


@_blended.def_vmap
def _blended_vmap(axis_size, in_batched, tbl4, cd, z0, w4):
    tb, cb, zb, wb = in_batched
    if tb:
        raise NotImplementedError("GF table must not be vmapped")
    out = _blended(tbl4, _flatq(cd, cb, axis_size),
                   _flatq(z0, zb, axis_size), _flatq(w4, wb, axis_size))
    return jnp.reshape(out, (axis_size, -1, out.shape[-1])), True


@custom_vmap
def _corners(tbl4, cd, z0):
    return corner_rows_pallas(tbl4, cd, z0, interpret=_interp())


@_corners.def_vmap
def _corners_vmap(axis_size, in_batched, tbl4, cd, z0):
    tb, cb, zb = in_batched
    if tb:
        raise NotImplementedError("GF table must not be vmapped")
    out = _corners(tbl4, _flatq(cd, cb, axis_size),
                   _flatq(z0, zb, axis_size))
    return jnp.reshape(out, (axis_size, -1) + out.shape[1:]), True


def _interp() -> bool:
    """interpret-mode fallback off-TPU (tests on the virtual CPU mesh)."""
    return jax.devices()[0].platform != "tpu"


@jax.custom_vjp
def bilinear_rows(tbl4, cd, z0, w4):
    """Differentiable blended bilinear gather (see
    :func:`bilinear_rows_pallas`); gradients flow through ``w4`` only —
    the table is treated as data."""
    return _blended(tbl4, cd, z0, w4)


def _bil_fwd(tbl4, cd, z0, w4):
    return _blended(tbl4, cd, z0, w4), (tbl4, cd, z0)


def _bil_bwd(res, g):
    tbl4, cd, z0 = res
    rows = _corners(tbl4, cd, z0)                      # (..., 4, 8L)
    dw4 = jnp.einsum("...j,...cj->...c", g, rows)
    dcd = np.zeros(cd.shape, dtype=jax.dtypes.float0)
    dz0 = np.zeros(z0.shape, dtype=jax.dtypes.float0)
    # structural zero — the table is a jit argument that is never
    # differentiated, so XLA dead-code-eliminates this allocation
    return jnp.zeros_like(tbl4), dcd, dz0, dw4


bilinear_rows.defvjp(_bil_fwd, _bil_bwd)


def bilinear_rows_reference(tbl4, cd, z0, w4):
    """numpy reference for tests: same padded-row output."""
    t = np.asarray(tbl4)
    CD, NZ, _, L = t.shape
    t = t.reshape(CD, NZ, 8 * L)
    cd = np.asarray(cd)
    z0 = np.asarray(z0)
    w4 = np.asarray(w4)
    return (w4[:, 0, None] * t[cd, z0]
            + w4[:, 1, None] * t[cd, z0 + 1]
            + w4[:, 2, None] * t[cd + 1, z0]
            + w4[:, 3, None] * t[cd + 1, z0 + 1])
