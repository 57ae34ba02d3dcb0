"""
Corner-block DMA bilinear gather (``ops/bilgather.py``): kernel
equality vs the numpy reference, the GreensTable dispatch equality vs
the default gather, vmap flattening, and the custom-VJP gradient path
(MALA/HMC differentiate the logp through the gather).

Off-TPU the kernels run in Pallas interpret mode — semantics, not
speed; the on-chip numbers live in ``tools/bench_gather.py``.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from beat_tpu.heart.gftable import build_homogeneous_table  # noqa: E402
from beat_tpu.ops.bilgather import (bilinear_rows,  # noqa: E402
                                    bilinear_rows_pallas,
                                    bilinear_rows_reference,
                                    corner_rows_pallas, pack_table)


def _problem(n=33, nd_eff=3 * 7, nz=5, M=310, seed=0):
    rng = np.random.default_rng(seed)
    tbl = rng.normal(size=(nd_eff * nz, M)).astype(np.float32)
    t4 = pack_table(jnp.asarray(tbl), nd_eff, nz)
    cd = rng.integers(0, nd_eff - 1, n)
    z0 = rng.integers(0, nz - 1, n)
    w4 = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    return t4, jnp.asarray(cd), jnp.asarray(z0), jnp.asarray(w4)


class TestKernel:
    def test_blended_matches_reference(self):
        t4, cd, z0, w4 = _problem()
        got = np.asarray(bilinear_rows_pallas(t4, cd, z0, w4,
                                              interpret=True))
        ref = bilinear_rows_reference(t4, cd, z0, w4)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_corner_rows(self):
        t4, cd, z0, _ = _problem(n=17)
        rows = np.asarray(corner_rows_pallas(t4, cd, z0, interpret=True))
        t = np.asarray(t4)
        CD, NZ, _, L = t.shape
        flat = t.reshape(CD, NZ, 8 * L)
        cd = np.asarray(cd)
        z0 = np.asarray(z0)
        ref = np.stack([flat[cd, z0], flat[cd, z0 + 1],
                        flat[cd + 1, z0], flat[cd + 1, z0 + 1]], axis=1)
        np.testing.assert_array_equal(rows, ref)

    def test_block_padding_sizes(self):
        # n smaller than, equal to, and not a multiple of the block
        for n in (3, 32, 300):
            t4, cd, z0, w4 = _problem(n=n, seed=n)
            got = np.asarray(bilinear_rows_pallas(t4, cd, z0, w4,
                                                  interpret=True))
            ref = bilinear_rows_reference(t4, cd, z0, w4)
            assert got.shape == ref.shape == (n, t4.shape[-1] * 8)
            np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_vmap_flattens_batch(self):
        t4, _, _, _ = _problem()
        B, n = 4, 9
        rng = np.random.default_rng(3)
        nd_eff, nz = t4.shape[0], t4.shape[1]
        cd = jnp.asarray(rng.integers(0, nd_eff - 1, (B, n)))
        z0 = jnp.asarray(rng.integers(0, nz - 1, (B, n)))
        w4 = jnp.asarray(rng.uniform(0, 1, (B, n, 4)).astype(np.float32))
        got = jax.vmap(bilinear_rows, in_axes=(None, 0, 0, 0))(
            t4, cd, z0, w4)
        for b in range(B):
            ref = bilinear_rows_reference(t4, cd[b], z0[b], w4[b])
            np.testing.assert_allclose(np.asarray(got[b]), ref,
                                       rtol=1e-6, atol=1e-6)

    def test_grad_through_weights(self):
        t4, cd, z0, w4 = _problem(n=11)
        key = np.random.default_rng(5).normal(
            size=(11, t4.shape[-1] * 8)).astype(np.float32)
        g = jnp.asarray(key)

        def loss(w):
            return jnp.sum(bilinear_rows(t4, cd, z0, w) * g)

        dw = np.asarray(jax.grad(loss)(w4))
        # analytic: dL/dw[i,c] = <g[i], corner_row_c[i]>
        t = np.asarray(t4)
        flat = t.reshape(t.shape[0], t.shape[1], -1)
        cdn, z0n = np.asarray(cd), np.asarray(z0)
        rows = np.stack([flat[cdn, z0n], flat[cdn, z0n + 1],
                         flat[cdn + 1, z0n], flat[cdn + 1, z0n + 1]],
                        axis=1)
        ref = np.einsum("nj,ncj->nc", key, rows)
        np.testing.assert_allclose(dw, ref, rtol=1e-5, atol=1e-4)

    def test_vmap_grad_compose(self):
        # the sampler shape: vmap over chains of grad of a scalar loss
        t4, _, _, _ = _problem()
        B, n = 3, 5
        rng = np.random.default_rng(7)
        nd_eff, nz = t4.shape[0], t4.shape[1]
        cd = jnp.asarray(rng.integers(0, nd_eff - 1, (B, n)))
        z0 = jnp.asarray(rng.integers(0, nz - 1, (B, n)))
        w4 = jnp.asarray(rng.uniform(0, 1, (B, n, 4)).astype(np.float32))

        def loss(w, c, z):
            return jnp.sum(bilinear_rows(t4, c, z, w) ** 2)

        dv = jax.vmap(jax.grad(loss), in_axes=(0, 0, 0))(w4, cd, z0)
        for b in range(B):
            db = np.asarray(jax.grad(loss)(w4[b], cd[b], z0[b]))
            np.testing.assert_allclose(np.asarray(dv[b]), db,
                                       rtol=1e-5, atol=1e-4)


class TestShardedDMAGather:
    def test_chain_sharded_logp_matches_unsharded(self, monkeypatch):
        """The sampler deployment shape: flagship logp vmapped over
        chains, chains sharded over the 8-device mesh via shard_map
        with the GF table replicated — the DMA gather runs per-device
        on the local chain block and must equal the unsharded eval."""
        import sys

        sys.path.insert(0, "/root/repo")
        from jax.sharding import PartitionSpec as P

        try:  # vma checking needs pallas out-shape declarations — off
            from jax import shard_map
            kw = {"check_vma": False}
        except ImportError:
            from jax.experimental.shard_map import shard_map
            kw = {"check_rep": False}

        from __graft_entry__ import _build_flagship
        from beat_tpu.parallel import make_chain_mesh

        monkeypatch.setenv("BEAT_TPU_MM_GATHER", "dma")
        problem = _build_flagship(n_stations=4, nt=128)
        logp, data = problem.make_logp_fn()
        lower, upper = problem.priors.bounds_arrays()
        rng = np.random.default_rng(0)
        n_chains = 16
        q = jnp.asarray(rng.uniform(lower, upper,
                                    size=(n_chains, lower.size)),
                        dtype=jnp.float32)
        batched = jax.vmap(lambda x: logp(x, data))
        want = np.asarray(jax.jit(batched)(q))

        mesh = make_chain_mesh()
        sharded = shard_map(batched, mesh=mesh, in_specs=(P("chains"),),
                            out_specs=P("chains"), **kw)
        got = np.asarray(jax.jit(sharded)(q))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


class TestGreensTableDispatch:
    def _table(self):
        return build_homogeneous_table(
            distances=np.linspace(20e3, 90e3, 8),
            depths=np.linspace(2e3, 14e3, 4), nt=64, dt=0.5)

    def test_dma_path_matches_default(self, monkeypatch):
        table = self._table()
        rng = np.random.default_rng(0)
        n = 12
        dist = jnp.asarray(rng.uniform(25e3, 85e3, n))
        depth = jnp.asarray(rng.uniform(3e3, 13e3, n))
        comp = jnp.asarray(rng.integers(0, 3, n), dtype=jnp.int32)

        monkeypatch.delenv("BEAT_TPU_MM_GATHER", raising=False)
        base = np.asarray(table.gather_spectra(dist, depth, comp))
        monkeypatch.setenv("BEAT_TPU_MM_GATHER", "dma")
        dma = np.asarray(table.gather_spectra(dist, depth, comp))
        np.testing.assert_allclose(dma, base, rtol=2e-5, atol=1e-12)

    def test_dma_path_vmapped(self, monkeypatch):
        table = self._table()
        rng = np.random.default_rng(1)
        B, n = 3, 6
        dist = jnp.asarray(rng.uniform(25e3, 85e3, (B, n)))
        depth = jnp.asarray(rng.uniform(3e3, 13e3, (B, n)))
        comp = jnp.asarray(rng.integers(0, 3, n), dtype=jnp.int32)

        monkeypatch.setenv("BEAT_TPU_MM_GATHER", "dma")
        got = jax.vmap(lambda d, z: table.gather_spectra(d, z, comp))(
            dist, depth)
        monkeypatch.delenv("BEAT_TPU_MM_GATHER")
        for b in range(B):
            ref = np.asarray(table.gather_spectra(dist[b], depth[b], comp))
            np.testing.assert_allclose(np.asarray(got[b]), ref,
                                       rtol=2e-5, atol=1e-12)

    def test_dma_gather_grad_matches_default(self, monkeypatch):
        """The full sampler contract: grad of a logp-like scalar w.r.t.
        (distance-driving) source position and depth agrees between the
        default gather and the DMA path."""
        table = self._table()
        rng = np.random.default_rng(2)
        n = 5
        st_e = jnp.asarray(rng.uniform(20e3, 60e3, n))
        st_n = jnp.asarray(rng.uniform(20e3, 60e3, n))
        comp = jnp.asarray(rng.integers(0, 3, n), dtype=jnp.int32)
        m6 = jnp.asarray(rng.normal(size=6) * 1e15, dtype=jnp.float32)

        def loss(q):
            east, north, depth = q
            spec = table.point_spectra(m6, east, north, depth,
                                       st_e, st_n, comp)
            return jnp.sum(spec ** 2) * 1e-28

        q = jnp.asarray([1.0e3, -2.0e3, 8.0e3], dtype=jnp.float32)
        monkeypatch.delenv("BEAT_TPU_MM_GATHER", raising=False)
        g_base = np.asarray(jax.grad(loss)(q))
        monkeypatch.setenv("BEAT_TPU_MM_GATHER", "dma")
        g_dma = np.asarray(jax.grad(loss)(q))
        np.testing.assert_allclose(
            g_dma, g_base, rtol=5e-3,
            atol=5e-3 * float(np.abs(g_base).max()))

    def test_packed_cache_lifecycle(self, monkeypatch, tmp_path):
        """with_packed_gather caches on the instance (wavemaps sharing a
        table share it); save/load and astype drop the cache and the
        DMA path still answers identically through the inline
        fallback."""
        from beat_tpu.heart.gftable import GreensTable

        table = self._table()
        monkeypatch.setenv("BEAT_TPU_MM_GATHER", "dma")
        rng = np.random.default_rng(3)
        n = 7
        dist = jnp.asarray(rng.uniform(25e3, 85e3, n))
        depth = jnp.asarray(rng.uniform(3e3, 13e3, n))
        comp = jnp.asarray(rng.integers(0, 3, n), dtype=jnp.int32)

        want = np.asarray(table.gather_spectra(dist, depth, comp))

        packed = table.with_packed_gather()
        assert packed is table and table._packed is not None
        assert packed.with_packed_gather()._packed is table._packed
        np.testing.assert_allclose(
            np.asarray(table.gather_spectra(dist, depth, comp)), want,
            rtol=1e-6)

        p = str(tmp_path / "t.npz")
        table.save(p)
        loaded = GreensTable.load(p)
        assert loaded._packed is None
        np.testing.assert_allclose(
            np.asarray(loaded.gather_spectra(dist, depth, comp)), want,
            rtol=1e-6)
        assert table.astype(jnp.float32)._packed is None

    def test_use_dma_gather_thresholds(self, monkeypatch):
        table = self._table()
        monkeypatch.setenv("BEAT_TPU_DMA_GATHER_MIN_MB", "0")
        assert table._use_dma_gather()
        monkeypatch.setenv("BEAT_TPU_DMA_GATHER_MIN_MB", "10000")
        assert not table._use_dma_gather()
        # degenerate grid axes cannot form a 2x2 corner block
        deg = build_homogeneous_table(distances=np.array([50e3]),
                                      depths=np.linspace(2e3, 14e3, 4),
                                      nt=32, dt=0.5)
        monkeypatch.setenv("BEAT_TPU_DMA_GATHER_MIN_MB", "0")
        assert not deg._use_dma_gather()
