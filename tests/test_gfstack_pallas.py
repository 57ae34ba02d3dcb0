"""Fused Pallas kinematic-stack kernel vs the XLA reference gather
(interpret mode on CPU; the same kernel compiles natively on TPU —
see STATUS.md for the on-chip timings).

The default one-hot matmul algorithm is the explicit bf16x3
decomposition (``gfstack._stack_precision``): ~2x the MXU issue rate of
the exact 6-pass f32 algorithm at a ~2^-18-per-product error floor, so
the default-mode comparisons accept 1e-4 (measured max ~4e-5 — far
below GF-table physics error); ``mode="highest"`` is pinned separately
at the exact-algorithm 2e-5 bar."""

# x3 default-mode acceptance vs the exact XLA gather
TOL = dict(rtol=1e-4, atol=1e-4)

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beat_tpu.ffi import SeismicGFLibrary
from beat_tpu.ops.gfstack import (
    stack_all_auto,
    stack_all_pallas,
    stack_batched_pallas,
    to_stacking_layout,
)


def make_lib(nt=3, npch=11, nd=4, nst=9, ns=100, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(nt, npch, nd, nst, ns)).astype(np.float32)
    return SeismicGFLibrary(
        data=jnp.asarray(data), duration_min=0.5, duration_sampling=0.5,
        starttime_min=0.0, starttime_sampling=0.25).with_stacking_layout()


@pytest.fixture
def lib():
    return make_lib()


def rand_point(lib, seed, nchains=None):
    rng = np.random.default_rng(seed)
    shp = () if nchains is None else (nchains,)
    durations = rng.uniform(0.5, 2.0, shp + (lib.npatches,))
    starttimes = rng.uniform(0.0, 2.0, shp + (lib.ntargets, lib.npatches))
    slips = rng.uniform(0, 3, shp + (lib.npatches,)).astype(np.float32)
    return jnp.asarray(durations), jnp.asarray(starttimes), jnp.asarray(slips)


@pytest.mark.parametrize("interpolation", ["nearest_neighbor", "multilinear"])
def test_pallas_matches_xla_unbatched(lib, interpolation):
    durations, starttimes, slips = rand_point(lib, 1)
    want = np.asarray(lib.stack_all(durations, starttimes, slips, interpolation))
    got = np.asarray(stack_all_pallas(lib, durations, starttimes, slips,
                                      interpolation, interpret=True))
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("interpolation", ["nearest_neighbor", "multilinear"])
def test_pallas_matches_xla_vmapped(lib, interpolation):
    """The custom_vmap rule must dispatch the lockstep batch to the fused
    kernel and match per-chain XLA stacking."""
    nchains = 5
    durations, starttimes, slips = rand_point(lib, 2, nchains)

    want = np.asarray(jax.vmap(
        lambda d, s, w: lib.stack_all(d, s, w, interpolation))(
            durations, starttimes, slips))
    got = np.asarray(jax.vmap(
        lambda d, s, w: stack_all_pallas(lib, d, s, w, interpolation,
                                         interpret=True))(
            durations, starttimes, slips))
    np.testing.assert_allclose(got, want, **TOL)


def test_vmap_unbatched_slips(lib):
    """Unbatched operands must broadcast inside the custom_vmap rule."""
    nchains = 3
    durations, starttimes, _ = rand_point(lib, 3, nchains)
    slips = jnp.asarray(np.random.default_rng(4).uniform(
        0, 1, lib.npatches).astype(np.float32))
    want = np.asarray(jax.vmap(
        lambda d, s: lib.stack_all(d, s, slips, "multilinear"))(
            durations, starttimes))
    got = np.asarray(jax.vmap(
        lambda d, s: stack_all_pallas(lib, d, s, slips, "multilinear",
                                      interpret=True))(
            durations, starttimes))
    np.testing.assert_allclose(got, want, **TOL)


def test_padding_masks_chains_and_patches(lib):
    """Chain padding to the 128-lane block must not leak; only the
    requested chains come back."""
    durations, starttimes, slips = rand_point(lib, 5, 2)
    out = stack_batched_pallas(
        jnp.asarray(lib.data_tr), lib.nstarttimes,
        lib.durations2idxs(durations)[0],
        lib.starttimes2idxs(starttimes)[0], slips, interpret=True)
    assert out.shape == (2, lib.ntargets, lib.nsamples)
    want = np.asarray(jax.vmap(
        lambda d, s, w: lib.stack_all(d, s, w, "nearest_neighbor"))(
            durations, starttimes, slips))
    np.testing.assert_allclose(np.asarray(out), want, **TOL)


def test_stacking_layout_padding():
    """D·S not a lane multiple → zero-padded lanes; patch axis padded to
    the PATCH_BLOCK multiple."""
    lib = make_lib(nt=2, npch=3, nd=5, nst=30, ns=16)  # DS=150 → 2 slabs
    assert lib.data_tr.shape == (2, 8, 16, 256)
    durations, starttimes, slips = rand_point(lib, 6, 4)
    want = np.asarray(jax.vmap(
        lambda d, s, w: lib.stack_all(d, s, w, "multilinear"))(
            durations, starttimes, slips))
    got = np.asarray(jax.vmap(
        lambda d, s, w: stack_all_pallas(lib, d, s, w, "multilinear",
                                         interpret=True))(
            durations, starttimes, slips))
    np.testing.assert_allclose(got, want, **TOL)


def test_stack_all_auto_fallback(lib):
    """Off-TPU without interpret, auto dispatch must use the XLA path and
    still be correct."""
    durations, starttimes, slips = rand_point(lib, 7)
    want = np.asarray(lib.stack_all(durations, starttimes, slips,
                                    "multilinear"))
    got = np.asarray(stack_all_auto(lib, durations, starttimes, slips,
                                    "multilinear"))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_to_stacking_layout_roundtrip():
    lib = make_lib(nt=1, npch=2, nd=2, nst=3, ns=8)
    tr = np.asarray(to_stacking_layout(lib.data))
    assert tr.shape == (1, 8, 8, 128)           # P→8, DS=6→128
    data = np.asarray(lib.data)
    for d in range(2):
        for s in range(3):
            np.testing.assert_array_equal(tr[0, 1, :, d * 3 + s],
                                          data[0, 1, d, s, :])
    np.testing.assert_array_equal(tr[0, 0, :, 6:], 0.0)
    np.testing.assert_array_equal(tr[0, 2:], 0.0)


def test_bfloat16_stacking_layout():
    """Opt-in bf16 library storage: half footprint, ~1e-2 relative
    accuracy vs the f32 stack (f32 accumulation)."""
    import jax
    import jax.numpy as jnp

    from beat_tpu.ffi import SeismicGFLibrary
    from beat_tpu.ops.gfstack import stack_all_pallas

    rng = np.random.default_rng(11)
    T, P, D, S, N = 3, 5, 4, 6, 64
    data = rng.normal(size=(T, P, D, S, N)).astype(np.float32)
    base = SeismicGFLibrary(data=jnp.asarray(data), duration_min=0.5,
                            duration_sampling=0.5, starttime_min=0.0,
                            starttime_sampling=0.25)
    lib32 = base.with_stacking_layout()
    lib16 = base.with_stacking_layout(dtype=jnp.bfloat16)
    assert lib16.data_tr.dtype == jnp.bfloat16
    assert lib16.data_tr.nbytes == lib32.data_tr.nbytes // 2

    durations = jnp.asarray(rng.uniform(0.5, 2.0, (P,)).astype(np.float32))
    starttimes = jnp.asarray(rng.uniform(0, 1.2, (T, P)).astype(np.float32))
    slips = jnp.asarray(rng.uniform(0, 2, (P,)).astype(np.float32))
    got32 = np.asarray(stack_all_pallas(lib32, durations, starttimes, slips,
                                        "multilinear", interpret=True))
    got16 = np.asarray(stack_all_pallas(lib16, durations, starttimes, slips,
                                        "multilinear", interpret=True))
    scale = np.abs(got32).max()
    err = np.abs(got16 - got32).max() / scale
    assert err < 0.02, f"bf16 stack error {err:.4f}"
    assert err > 0  # actually lossy, not silently upcast


def test_chunked_layout_equals_full():
    """The production (drop-data) chunked on-device transpose must equal
    the whole-array transpose and the host reference."""
    from beat_tpu.ops.gfstack import (to_stacking_layout_chunked,
                                      to_stacking_layout_np)

    lib = make_lib(nt=3, npch=5, nd=2, nst=3, ns=16)
    full = np.asarray(to_stacking_layout(lib.data))
    chunked = np.asarray(to_stacking_layout_chunked(lib.data))
    host = to_stacking_layout_np(np.asarray(lib.data))
    np.testing.assert_array_equal(chunked, full)
    np.testing.assert_array_equal(chunked, host)

    dropped = lib.with_stacking_layout(keep_data=False)
    assert dropped.data is None
    np.testing.assert_array_equal(np.asarray(dropped.data_tr), full)


@pytest.mark.parametrize("interpolation", ["nearest_neighbor", "multilinear"])
def test_highest_mode_matches_xla_tightly(lib, interpolation):
    """mode="highest" keeps the exact 6-pass f32 algorithm: the kernel
    must match the XLA gather at the pre-x3 2e-5 bar."""
    nchains = 4
    durations, starttimes, slips = rand_point(lib, 12, nchains)
    want = np.asarray(jax.vmap(
        lambda d, s, w: lib.stack_all(d, s, w, interpolation))(
            durations, starttimes, slips))
    got = np.asarray(jax.vmap(
        lambda d, s, w: stack_all_pallas(lib, d, s, w, interpolation,
                                         interpret=True, mode="highest"))(
            durations, starttimes, slips))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_x3_default_close_to_highest(lib):
    """The x3 default must sit at its documented error floor vs the
    exact algorithm — well under the GF-table physics error (~1e-3)."""
    durations, starttimes, slips = rand_point(lib, 13, 3)
    run = lambda mode: np.asarray(jax.vmap(
        lambda d, s, w: stack_all_pallas(lib, d, s, w, "multilinear",
                                         interpret=True, mode=mode))(
            durations, starttimes, slips))
    exact, fast = run("highest"), run("x3")
    scale = np.abs(exact).max()
    err = np.abs(fast - exact).max() / scale
    assert err < 1e-4, f"x3 stack error {err:.2e}"


class TestRowGather:
    """True-DMA row gather (ops/rowgather.py) — the table-size-
    independent gather path explored for the GreensTable hot op
    (round-5 HBM measurement: XLA lowers both one-hot and take into
    whole-table streaming)."""

    def test_matches_reference_interpret(self):
        from beat_tpu.ops.rowgather import (gather_rows_pallas,
                                            gather_rows_reference)

        rng = np.random.default_rng(0)
        tbl = rng.normal(size=(500, 1548)).astype(np.float32)
        idx = rng.integers(0, 500, 700).astype(np.int32)
        got = np.asarray(gather_rows_pallas(
            jnp.asarray(tbl), jnp.asarray(idx), interpret=True))
        np.testing.assert_array_equal(got, gather_rows_reference(tbl, idx))

    def test_ragged_sizes_and_padding(self):
        from beat_tpu.ops.rowgather import (gather_rows_pallas,
                                            gather_rows_reference)

        rng = np.random.default_rng(1)
        # row length and count both non-aligned
        tbl = rng.normal(size=(97, 333)).astype(np.float32)
        idx = rng.integers(0, 97, 41).astype(np.int32)
        got = np.asarray(gather_rows_pallas(
            jnp.asarray(tbl), jnp.asarray(idx), block_rows=64,
            interpret=True))
        np.testing.assert_array_equal(got, gather_rows_reference(tbl, idx))
