"""
Pallas TPU kernel for the kinematic Green's-function stack — THE hot op
of kinematic FFI (reference ``SeismicGFLibrary.stack_all``
``beat/ffi/base.py:607``: pytensor ``batched_dot`` over a 5-D fancy
gather).

Computes, for the library ``data[target, patch, duration, start, t]``
and a lockstep batch of ``C`` chains:

    out[c, target, t] = Σ_p Σ_corner w_corner ·
        data[target, p, didx[c,p]±, sidx[c,target,p]±, t] · slips[c, p]

TPU-first design (measured on v5e: the XLA gather materialises a
(C, ntargets, npatches, nsamples) intermediate and runs at ~15 % of HBM
peak — 4.7 ms at C=2000, T=8, P=12, N=256; 36 ms at Laquila-ish scale):

* the library is pre-transposed ONCE to the *stacking layout*
  ``(T, P, N, D·S_pad)`` so each (duration, starttime) grid cell of a
  patch is a **lane column**;
* the kernel grid is ``(T, P₈/PATCH_BLOCK)`` — the library streams
  HBM→VMEM exactly once per lockstep evaluation (speed-of-light
  traffic), while the accumulators for ALL chains stay resident in
  VMEM;
* the per-chain (d, s) cell selection runs on the **MXU as one-hot
  matmuls**: per 128-lane slab q and 128-chain block,
  ``W[k, c] = Σ_corner (k == flat_corner[c] − q·128) · weight_corner[c]``
  and the contribution is ``cell_slab @ W`` — all interpolation corners
  fold into the same W, so multilinear costs the same matmuls as
  nearest-neighbour.  (Alternatives measured on v5e and rejected:
  per-row DMAs are descriptor-issue bound; the VPU lane
  ``dynamic_gather`` is vreg-issue bound at ~26 µs/grid-step; the
  gathered (C, T, P, N) HBM intermediate of the XLA path is the thing
  we are deleting.)

Batching: the public op is a :func:`jax.custom_batching.custom_vmap`,
so a per-chain ``logp`` that calls it scalar-wise dispatches to the
single fused all-chain kernel when the sampler vmaps over chains.

The XLA gather (:meth:`SeismicGFLibrary.stack_all`) remains the
reference implementation and the fallback off-TPU; the kernel matches
it to the selection-matmul algorithm's error floor (tested in interpret
mode on CPU and natively on TPU).  The default algorithm is the
explicit bf16x3 decomposition (:func:`_stack_precision`): measured on
v5e at the bench shape (C=2000, T=8, P=12, D=6, S=16, N=256) it runs
0.279 ms/eval vs 0.541 ms for the exact 6-pass f32 algorithm (1.94×)
at 7.1e-6 scaled max error — the kernel is MXU-issue bound, so halving
the matmul passes halves the wall-clock.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


PATCH_BLOCK = 8  # max patches per grid step (amortises per-step overhead)


def to_stacking_layout(data5, dtype=jnp.float32):
    """(T, P, D, S, N) → (T, P₈, N, D·S padded to a lane multiple), with
    the patch axis zero-padded to a PATCH_BLOCK multiple.

    ``dtype=jnp.bfloat16`` stores the library lossily at half the HBM
    footprint/traffic (~1e-2 relative per sample; accumulation stays
    f32) — an opt-in for HBM-bound production libraries."""
    T, P, D, S, N = data5.shape
    ds = D * S
    dsp = _ceil_to(ds, LANE)
    pp = _ceil_to(P, PATCH_BLOCK)
    a = jnp.transpose(jnp.reshape(jnp.asarray(data5, dtype),
                                  (T, P, ds, N)), (0, 1, 3, 2))
    return jnp.pad(a, ((0, 0), (0, pp - P), (0, 0), (0, dsp - ds)))


def to_stacking_layout_np(data5: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Host-side :func:`to_stacking_layout` — for production-scale
    libraries where the on-device transpose temp would not fit HBM."""
    T, P, D, S, N = data5.shape
    ds = D * S
    dsp = _ceil_to(ds, LANE)
    pp = _ceil_to(P, PATCH_BLOCK)
    a = np.transpose(np.reshape(np.asarray(data5).astype(dtype),
                                (T, P, ds, N)), (0, 1, 3, 2))
    return np.pad(a, ((0, 0), (0, pp - P), (0, 0), (0, dsp - ds)))


def to_stacking_layout_chunked(data5, dtype=jnp.float32):
    """On-device :func:`to_stacking_layout` in per-target chunks with a
    donated accumulator: peak HBM ≈ data5 + layout + one target slice
    (vs 3× for the whole-array transpose), and a GiB-scale library never
    round-trips through the host (a remote/tunnelled device would pay
    two full-size transfers on the numpy path)."""
    from functools import partial

    T, P, D, S, N = data5.shape
    ds = D * S
    dsp = _ceil_to(ds, LANE)
    pp = _ceil_to(P, PATCH_BLOCK)

    @partial(jax.jit, donate_argnums=(0,))
    def put(out, chunk, t):
        a = jnp.transpose(jnp.reshape(chunk.astype(dtype), (P, ds, N)),
                          (0, 2, 1))
        a = jnp.pad(a, ((0, pp - P), (0, 0), (0, dsp - ds)))
        return jax.lax.dynamic_update_slice(out, a[None], (t, 0, 0, 0))

    out = jnp.zeros((T, pp, N, dsp), dtype=dtype)
    for t in range(T):
        out = put(out, jnp.asarray(data5[t]), jnp.int32(t))
    return out


def _fits_vmem(N: int, DSP: int, Cp: int = 2048) -> bool:
    """Conservative VMEM guard (~16 MB/core on v5e): out block (N, Cp)
    + double-buffered cell (N, DSP) + double-buffered index rows
    (5 × (8, Cp) worst case) + gather temporaries, worst-case lockstep
    batch Cp=2048."""
    need = 4 * (N * Cp * 2 + 2 * N * DSP + 10 * 8 * Cp + 4 * N * LANE)
    return need < 12 * 1024 * 1024


def _stack_precision() -> str:
    """MXU pass count for the one-hot selection matmuls.

    The kernel is MXU-issue bound (the HBM stream finishes first), so
    the matmul algorithm is the throughput knob: ``highest`` = 6-pass
    exact f32 (~33 TF/s executed on v5e), ``x3`` = explicit bf16x3
    (hi/lo split of both operands, lo·lo dropped — ≲2⁻¹⁸ ≈ 4e-6
    relative on the selected products, inside the stack's 2e-5
    acceptance bar, at up to 2× the matmul issue rate; Mosaic has no
    ``Precision.HIGH`` so the decomposition is hand-rolled), and
    ``default`` = 1-pass bf16 (~4e-3 relative, for lossy bf16 libraries
    where the data is already rounded).  Override with
    ``BEAT_TPU_STACK_PRECISION=highest|x3|default``.
    """
    name = os.environ.get("BEAT_TPU_STACK_PRECISION", "x3").lower()
    if name not in ("highest", "x3", "default"):
        raise ValueError(f"BEAT_TPU_STACK_PRECISION={name!r} "
                         "(want highest|x3|default)")
    return name


def _split_bf16(x):
    """f32 → (hi, lo) bf16 pair with hi + lo ≈ x to ~2⁻¹⁸ relative."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _prep_cell(cell, mode):
    """Precision-specific preprocessing of one (N, DSP) grid cell —
    hoisted out of the chain-block loop (the split is VPU work shared by
    every 128-chain block)."""
    if mode == "x3":
        return _split_bf16(cell)
    if mode == "default":
        return (cell.astype(jnp.bfloat16),)
    return (cell.astype(jnp.float32),)


def _onehot_mm(cellp, corners, nslabs, mode):
    """Weighted cell-column selection as MXU one-hot matmuls.

    The per-chain (duration, starttime) gather runs on the MXU: within a
    128-lane slab q, ``W[k, c] = Σ_corner (k == flat_corner[c] − q·128) ·
    weight_corner[c]`` and the contribution is ``cell_slab @ W``.  All
    interpolation corners fold into the same W, so multilinear costs the
    same matmul issue as nearest-neighbour.  (Measured on v5e: the VPU
    ``dynamic_gather`` variant is ~26 µs/grid-step — vreg-issue bound —
    while one (N,128)×(128,128) matmul is ~0.1 µs of MXU time.)

    cellp : tuple from :func:`_prep_cell` — (cell,) f32 for ``highest``,
        (hi, lo) bf16 for ``x3``, (cell,) bf16 for ``default``
    corners : iterable of (flat (1, 128) i32, weight (1, 128) f32) —
        chain ROWS; the one-hot build broadcasts them along sublanes
        against a sublane iota.  (Row orientation keeps the HBM layout
        of the (…, 1, Cp) index arrays 8×-padded instead of the 128×
        blow-up of a trailing singleton lane axis.)
    returns (N, 128) f32
    """
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    acc = None
    for q in range(nslabs):
        W = None                                # (k, chain) one-hot
        for flat, weight in corners:
            Wc = jnp.where(k_iota == flat - q * LANE, weight, 0.0)
            W = Wc if W is None else W + Wc
        sl = slice(q * LANE, (q + 1) * LANE)
        if mode == "x3":
            ch, cl = cellp[0][:, sl], cellp[1][:, sl]
            W_hi, W_lo = _split_bf16(W)
            part = (jnp.dot(ch, W_hi, preferred_element_type=jnp.float32)
                    + jnp.dot(ch, W_lo, preferred_element_type=jnp.float32)
                    + jnp.dot(cl, W_hi, preferred_element_type=jnp.float32))
        elif mode == "default":
            part = jnp.dot(cellp[0][:, sl], W.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        else:
            part = jnp.dot(cellp[0][:, sl], W,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        acc = part if acc is None else acc + part
    return acc


def _nearest_kernel(didx_ref, sidx_ref, slips_ref, cell_ref, out_ref,
                    *, S, nslabs, nCB, PB, mode):
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    N = out_ref.shape[1]
    for j in range(PB):                               # static unroll
        # patch outer / chain-block inner: the precision-specific cell
        # prep (bf16 hi/lo split for x3) is shared by all chain blocks
        cellp = _prep_cell(cell_ref[0, j].astype(jnp.float32), mode)
        for cb in range(nCB):
            sl = slice(cb * LANE, (cb + 1) * LANE)
            # (1, LANE) slab rows at lane-offset 0 (Mosaic-broadcastable)
            flat = (didx_ref[j, cb:cb + 1, :] * S
                    + sidx_ref[0, j, cb:cb + 1, :])
            w = slips_ref[j, cb:cb + 1, :]
            out_ref[0, :, sl] += _onehot_mm(cellp, ((flat, w),),
                                            nslabs, mode)


def _multilinear_kernel(didx_ref, rtf_ref, sidx_ref, stf_ref, slips_ref,
                        cell_ref, out_ref, *, S, nslabs, nCB, PB, mode):
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    N = out_ref.shape[1]
    for j in range(PB):                       # static unroll
        cellp = _prep_cell(cell_ref[0, j].astype(jnp.float32), mode)
        for cb in range(nCB):
            sl = slice(cb * LANE, (cb + 1) * LANE)
            cbs = slice(cb, cb + 1)
            d = didx_ref[j, cbs, :]           # ceil duration idx (1, LANE)
            s = sidx_ref[0, j, cbs, :]        # ceil starttime idx
            rf = rtf_ref[j, cbs, :]           # floor-duration weight
            sf = stf_ref[0, j, cbs, :]        # floor-starttime weight
            w = slips_ref[j, cbs, :]
            # corner (dur_floor/ceil, start_floor/ceil) weights —
            # reference ffi/base.py:680-698
            corners = (((d - 1) * S + (s - 1), w * rf * sf),
                       ((d - 1) * S + s, w * rf * (1.0 - sf)),
                       (d * S + (s - 1), w * (1.0 - rf) * sf),
                       (d * S + s, w * (1.0 - rf) * (1.0 - sf)))
            out_ref[0, :, sl] += _onehot_mm(cellp, corners, nslabs, mode)


def stack_batched_pallas(data_tr, S, didx, sidx, slips, rtf=None, stf=None,
                         interpret: bool = False, mode: str | None = None):
    """
    Fused all-chain kinematic stack.

    data_tr : (T, P, N, DSP) stacking layout (:func:`to_stacking_layout`)
    S : nstarttimes (static)
    didx : (C, P) i32 — duration indices (ceil for multilinear)
    sidx : (C, T, P) i32 — starttime indices
    slips : (C, P) f32
    rtf, stf : floor-cell weights (C, P) / (C, T, P) — multilinear only
    mode : matmul algorithm for the one-hot selection
        (:func:`_stack_precision` default)

    Returns (C, T, N) f32.
    """
    T, Pp, N, DSP = data_tr.shape
    C, P = didx.shape
    nslabs = DSP // LANE
    Cp = _ceil_to(max(C, 1), LANE)
    nCB = Cp // LANE
    # patches per grid step: amortise per-step pipeline overhead, bounded
    # by VMEM (cell blocks are double-buffered)
    PB = PATCH_BLOCK
    while PB > 1 and 4 * (2 * PB * N * DSP + N * Cp) > 10 * 1024 * 1024:
        PB //= 2

    def padc(x):
        """Pad chains → Cp and patches → Pp.  Padded entries carry
        index 1 / weight 0 so they gather in-bounds and contribute 0."""
        fill = 1 if np.issubdtype(x.dtype, np.integer) else 0
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, Pp - P),),
                    constant_values=fill)
        return jnp.pad(x, ((0, Cp - C),) + ((0, 0),) * (x.ndim - 1))

    # chains as (nCB, LANE) slab rows: the kernel statically indexes one
    # (1, LANE) full-width row per 128-chain block — lane offset 0, which
    # Mosaic can broadcast along sublanes in the one-hot build — and the
    # HBM layout is exactly tile-shaped (zero padding).  (A trailing
    # (…, Cp, 1) sublane orientation pads the minor axis 128× — at
    # production scale that blew a 47 MB index array up to 5.9 GB and
    # OOM'd the chip; a (…, 1, Cp) row layout fixes HBM but its
    # lane-offset slab slices are layouts Mosaic refuses to broadcast.)
    def per_patch(x):                                   # (Pp, nCB, LANE)
        return jnp.transpose(padc(x), (1, 0)).reshape(Pp, nCB, LANE)

    def per_target_patch(x):                            # (T, Pp, nCB, LANE)
        return jnp.transpose(padc(x), (1, 2, 0)).reshape(T, Pp, nCB, LANE)

    didxT = per_patch(didx.astype(jnp.int32))
    sidxT = per_target_patch(sidx.astype(jnp.int32))
    slipsT = per_patch(slips.astype(jnp.float32))

    pp_spec = pl.BlockSpec((PB, nCB, LANE), lambda t, p: (p, 0, 0),
                           memory_space=pltpu.VMEM)
    tp_spec = pl.BlockSpec((1, PB, nCB, LANE), lambda t, p: (t, p, 0, 0),
                           memory_space=pltpu.VMEM)

    mode = mode or _stack_precision()
    multilinear = rtf is not None
    if multilinear:
        rtfT = per_patch(rtf.astype(jnp.float32))
        stfT = per_target_patch(stf.astype(jnp.float32))
        kernel = functools.partial(_multilinear_kernel, S=S, nslabs=nslabs,
                                   nCB=nCB, PB=PB, mode=mode)
        idx_args = (didxT, rtfT, sidxT, stfT, slipsT)
        idx_specs = [pp_spec, pp_spec, tp_spec, tp_spec, pp_spec]
    else:
        kernel = functools.partial(_nearest_kernel, S=S, nslabs=nslabs,
                                   nCB=nCB, PB=PB, mode=mode)
        idx_args = (didxT, sidxT, slipsT)
        idx_specs = [pp_spec, tp_spec, pp_spec]

    out = pl.pallas_call(
        kernel,
        grid=(T, Pp // PB),
        in_specs=idx_specs + [
            pl.BlockSpec((1, PB, N, DSP), lambda t, p: (t, p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, Cp), lambda t, p: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N, Cp), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*idx_args, data_tr)

    return jnp.moveaxis(out, 2, 0)[:C]        # (C, T, N)


# ---------------------------------------------------------------------------
# custom_vmap wrapper: per-chain logp calls dispatch to the fused kernel
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_stack_op(S: int, multilinear: bool, interpret: bool, mode: str):
    """custom_vmap op over the per-chain args — (didx, sidx, slips) plus
    (rtf, stf) when multilinear; one construction serves both modes."""

    @jax.custom_batching.custom_vmap
    def op(data_tr, *args):
        return stack_batched_pallas(data_tr, S, *(a[None] for a in args),
                                    interpret=interpret, mode=mode)[0]

    @op.def_vmap
    def _rule(axis_size, in_batched, data_tr, *args):
        db, *rest = in_batched
        if db:
            raise NotImplementedError("batched GF library unsupported")

        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        bargs = [bc(a, b) for a, b in zip(args, rest)]
        return stack_batched_pallas(data_tr, S, *bargs,
                                    interpret=interpret, mode=mode), True

    return op


def stack_all_pallas(lib, durations, starttimes, slips,
                     interpolation="nearest_neighbor",
                     interpret: bool = False, mode: str | None = None):
    """Per-chain entry point (use under ``vmap`` for the fused batch).

    ``lib`` must carry the stacking layout
    (:meth:`SeismicGFLibrary.with_stacking_layout`).

    ``mode`` selects the selection-matmul algorithm: ``'highest'``
    (exact 6-pass f32, ~2e-5 rel. vs the XLA reference), ``'x3'``
    (bf16x3, ~1e-4 rel., ~2× faster — the DEFAULT since round 4; users
    comparing bit-for-bit against :meth:`SeismicGFLibrary.stack_all`
    should pass ``mode='highest'``), or ``'default'`` (1-pass bf16,
    ~4e-3 rel., for bf16-stored libraries).  ``None`` reads
    ``BEAT_TPU_STACK_PRECISION`` (default ``x3``).
    """
    if lib.data_tr is None:
        raise ValueError("library lacks stacking layout — call "
                         "lib.with_stacking_layout() first")
    didx, rtf = lib.durations2idxs(durations, interpolation)
    sidx, stf = lib.starttimes2idxs(starttimes, interpolation)
    op = _make_stack_op(lib.nstarttimes,
                        interpolation == "multilinear", interpret,
                        mode or _stack_precision())
    if interpolation == "multilinear":
        return op(jnp.asarray(lib.data_tr), didx, sidx, slips, rtf, stf)
    return op(jnp.asarray(lib.data_tr), didx, sidx, slips)


def want_pallas(use_pallas=None, interpret: bool = False) -> bool:
    """Resolve the use_pallas default: env override, else on-TPU auto."""
    env = os.environ.get("BEAT_TPU_USE_PALLAS")
    if env == "0":
        return False
    if use_pallas is None:
        return env == "1" or interpret or jax.devices()[0].platform == "tpu"
    return bool(use_pallas)


def pallas_ok(lib, use_pallas=None, interpret: bool = False) -> bool:
    """Should this stack use the fused kernel?"""
    if not want_pallas(use_pallas, interpret):
        return False
    if getattr(lib, "data_tr", None) is None:
        return False
    T, P, N, DSP = lib.data_tr.shape
    return _fits_vmem(N, DSP)   # guard at the worst-case chain batch


def stack_all_auto(lib, durations, starttimes, slips,
                   interpolation="nearest_neighbor", use_pallas=None,
                   interpret: bool = False, precision: str | None = None):
    """
    Dispatch between the fused Pallas kernel (default on TPU when the
    library carries the stacking layout) and the XLA gather+einsum
    fallback.  ``BEAT_TPU_USE_PALLAS=0/1`` overrides.

    ``precision`` (Pallas path only) selects the selection-matmul
    algorithm — ``'highest'`` | ``'x3'`` | ``'default'``; the built-in
    default is ``x3`` (bf16x3, ~1e-4 rel. error vs the exact XLA path —
    changed from 6-pass-exact in round 4).  Pass ``'highest'`` for
    bit-comparable results against :meth:`SeismicGFLibrary.stack_all`.
    """
    if pallas_ok(lib, use_pallas, interpret):
        return stack_all_pallas(lib, durations, starttimes, slips,
                                interpolation, interpret, mode=precision)
    return lib.stack_all(durations, starttimes, slips, interpolation)
