"""
Trans-dimensional Voronoi slip sampling (beat_tpu.ffi.transd): masked
nearest-node correctness, exact prior reproduction under constant
likelihood (the standard RJ-MCMC validity check), and recovery of a
piecewise slip distribution from linear geodetic data.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from beat_tpu.ffi.transd import (TransDParams, masked_voronoi_slips,
                                 transd_sample)


def test_masked_voronoi_slips():
    rng = np.random.default_rng(0)
    K, N = 6, 40
    ns, nd = rng.uniform(0, 10, (2, K))
    vals = rng.normal(size=K)
    active = np.array([1, 0, 1, 1, 0, 1], dtype=np.float32)
    pspd = rng.uniform(0, 10, (2, N))

    got = np.asarray(masked_voronoi_slips(
        jnp.asarray(ns), jnp.asarray(nd), jnp.asarray(vals),
        jnp.asarray(active), jnp.asarray(pspd[0]), jnp.asarray(pspd[1])))

    act = np.where(active > 0)[0]
    d2 = ((pspd[0][:, None] - ns[None, act]) ** 2
          + (pspd[1][:, None] - nd[None, act]) ** 2)
    want = vals[act[np.argmin(d2, axis=1)]]
    np.testing.assert_allclose(got, want)


def test_prior_reproduction_constant_likelihood():
    """With L = const the sampler must reproduce the uniform prior on k
    — the birth/death bookkeeping is exact iff this holds."""
    params = TransDParams(k_max=8, k_min=1, n_chains=96, n_steps=4000,
                          record_every=20, seed=1)
    out = transd_sample(
        lambda slips: jnp.float32(0.0),
        patch_s=np.linspace(0, 10, 12), patch_d=np.linspace(0, 4, 12),
        extent_s=(0, 10), extent_d=(0, 4), value_bounds=(0, 1),
        params=params)
    ks = out["k_trace"].ravel().astype(int)
    n_levels = params.k_max - params.k_min + 1
    freqs = np.bincount(ks, minlength=params.k_max + 1)[params.k_min:]
    freqs = freqs / freqs.sum()
    # uniform prior on {1..8}: every level within a loose tolerance
    np.testing.assert_allclose(freqs, 1.0 / n_levels, atol=0.045)
    assert out["accept_rate"] > 0.5  # constant L: only bound-rejects


def test_recovers_piecewise_slip():
    """Two-level slip on a 6x3 patch grid through a linear forward."""
    rng = np.random.default_rng(2)
    n_s, n_d = 6, 3
    ss, dd = np.meshgrid((np.arange(n_s) + 0.5) * 2.0,
                         (np.arange(n_d) + 0.5) * 2.0)
    ps, pd = ss.ravel(), dd.ravel()
    n_patches = ps.size
    true = np.where(ps < 6.0, 0.5, 2.0)

    G = rng.normal(size=(40, n_patches)) / np.sqrt(n_patches)
    sigma = 0.02
    dobs = G @ true + rng.normal(0, sigma, 40)
    Gd = jnp.asarray(G, dtype=jnp.float32)
    dobs_d = jnp.asarray(dobs, dtype=jnp.float32)

    def logp(slips):
        r = dobs_d - Gd @ slips
        return -0.5 * jnp.sum(r * r) / sigma**2

    params = TransDParams(k_max=12, k_min=1, n_chains=128, n_steps=6000,
                          value_step=0.05, move_step_frac=0.15,
                          record_every=20, seed=3)
    out = transd_sample(logp, ps, pd, extent_s=(0, 12), extent_d=(0, 6),
                        value_bounds=(0.0, 3.0), params=params)

    # posterior-mean slip field recovers the two-level structure
    mean_slip = out["slip_trace"].reshape(-1, n_patches).mean(axis=0)
    corr = np.corrcoef(mean_slip, true)[0, 1]
    assert corr > 0.9, f"slip correlation {corr:.3f}"
    np.testing.assert_allclose(mean_slip[ps < 6.0].mean(), 0.5, atol=0.25)
    np.testing.assert_allclose(mean_slip[ps >= 6.0].mean(), 2.0, atol=0.35)
    # parsimony: data needs ~2 nodes, posterior k stays far below k_max
    assert out["k_trace"].mean() < 8.0


def test_transd_ffi_composite(tmp_path):
    """transd_sample_ffi drives a real distributer composite end-to-end
    and saves a plottable final stage."""
    from beat_tpu.backend import SampleStage
    from beat_tpu.covariance import Covariance
    from beat_tpu.ffi import discretize_sources, geo_construct_gf_linear
    from beat_tpu.heart.geodesy import GeodeticDataset
    from beat_tpu.models.distributer import (GeodeticDistributerComposite,
                                             transd_sample_ffi)
    from beat_tpu.sources import RectangularSource

    rng = np.random.default_rng(4)
    ref = RectangularSource(depth=1e3, dip=60.0, length=6e3, width=4e3)
    fault = discretize_sources([ref], patch_length=1e3, patch_width=1e3)
    coords = rng.uniform(-8e3, 8e3, (60, 2))
    los = np.tile([0.0, 0.0, 1.0], (60, 1))
    lib = geo_construct_gf_linear(fault, coords, los, components=("uparr",))

    # true slip: deep half slips 1.5 m, shallow half 0.3 m
    sf = fault.get_subfault(0)
    centers = sf.patch_centers_local()
    true = np.where(centers[:, 1] > 2e3, 1.5, 0.3)
    synth = np.asarray(lib.stack_all(uparr=jnp.asarray(true)))
    sd = 0.03 * np.abs(synth).max()
    ds = GeodeticDataset(name="ifg", typ="SAR", coords=coords,
                         displacement=synth + rng.normal(0, sd, synth.shape),
                         los_vector=los,
                         covariance=Covariance(data=np.eye(60) * sd**2))
    comp = GeodeticDistributerComposite([ds], lib, fault)

    out = transd_sample_ffi(
        comp, TransDParams(k_max=10, n_chains=96, n_steps=3000,
                           record_every=20, seed=5),
        value_bounds=(0.0, 3.0), homepath=str(tmp_path / "run"))
    mean_slip = out["slip_trace"].reshape(-1, fault.npatches).mean(axis=0)
    corr = np.corrcoef(mean_slip, true)[0, 1]
    assert corr > 0.7, f"slip correlation {corr:.3f}"

    # the saved stage is loadable with the per-patch ordering
    from beat_tpu.utility import Ordering

    handler = SampleStage(str(tmp_path / "run"),
                          ordering=Ordering([("uparr", (fault.npatches,))]))
    tr = handler.load_trace(-1)
    assert tr.q_trace.shape[-1] == fault.npatches


def test_transd_ffi_two_subfaults():
    """Multi-subfault trans-d: one Voronoi node field spans both planes
    via the unrolled along-strike atlas (reference registry spans all
    subfaults, ``beat/config.py:88-96``); slip levels differing per
    subfault are recovered jointly."""
    from beat_tpu.covariance import Covariance
    from beat_tpu.ffi import discretize_sources, geo_construct_gf_linear
    from beat_tpu.heart.geodesy import GeodeticDataset
    from beat_tpu.models.distributer import (GeodeticDistributerComposite,
                                             transd_sample_ffi)
    from beat_tpu.sources import RectangularSource

    rng = np.random.default_rng(6)
    # two planes side by side along strike
    refs = [RectangularSource(east_shift=-3e3, depth=1e3, strike=90.0,
                              dip=70.0, length=6e3, width=4e3),
            RectangularSource(east_shift=3e3, depth=1e3, strike=90.0,
                              dip=70.0, length=6e3, width=4e3)]
    fault = discretize_sources(refs, patch_length=1e3, patch_width=1e3)
    assert fault.nsubfaults == 2
    coords = rng.uniform(-10e3, 10e3, (80, 2))
    los = np.tile([0.0, 0.0, 1.0], (80, 1))
    lib = geo_construct_gf_linear(fault, coords, los, components=("uparr",))

    # true slip: subfault 0 slips 1.5 m, subfault 1 slips 0.3 m
    n0 = fault.get_subfault(0).npatches
    true = np.concatenate([np.full(n0, 1.5),
                           np.full(fault.npatches - n0, 0.3)])
    synth = np.asarray(lib.stack_all(uparr=jnp.asarray(true)))
    sd = 0.03 * np.abs(synth).max()
    ds = GeodeticDataset(name="ifg", typ="SAR", coords=coords,
                         displacement=synth + rng.normal(0, sd, synth.shape),
                         los_vector=los,
                         covariance=Covariance(data=np.eye(80) * sd**2))
    comp = GeodeticDistributerComposite([ds], lib, fault)

    out = transd_sample_ffi(
        comp, TransDParams(k_max=10, n_chains=96, n_steps=3000,
                           record_every=20, seed=7),
        value_bounds=(0.0, 3.0))
    mean_slip = out["slip_trace"].reshape(-1, fault.npatches).mean(axis=0)
    np.testing.assert_allclose(mean_slip[:n0].mean(), 1.5, atol=0.3)
    np.testing.assert_allclose(mean_slip[n0:].mean(), 0.3, atol=0.3)
    # two slip levels ⇒ posterior k concentrates well below k_max
    assert out["k_trace"].mean() < 8.0
