"""
Native discrete-wavenumber layered waveform GFs (the qseis analogue,
reference ``beat/heart.py:2126-2330``): validated against the
Mindlin-verified static solver in the ω→0 limit, ray-theory arrival
times on a homogeneous model, and the GreensTable pipeline end-to-end.
"""

import numpy as np
import pytest

from beat_tpu.heart.layered_statics import mt_surface_displacement_layered
from beat_tpu.heart.layered_waveforms import (build_layered_waveform_table,
                                              elementary_mt_spectra)
from beat_tpu.heart.velocity_model import LayeredModel
from beat_tpu.sources import sdr_to_m6


@pytest.fixture(scope="module")
def layered():
    return LayeredModel(tops=np.array([0.0, 3e3]),
                        vp=np.array([5500.0, 6500.0]),
                        vs=np.array([3200.0, 3700.0]),
                        rho=np.array([2600.0, 2800.0]))


class TestStaticLimit:
    def test_zero_frequency_matches_static_solver(self, layered):
        """The ω→0 moment-impulse response equals the static surface
        displacement — ties the whole dynamic stack (wave columns,
        global matrix, jumps, Hankel synthesis, FD dipoles) to the
        independently Mindlin-validated static solver."""
        zs = 8e3
        distances = np.array([20e3, 45e3, 80e3])
        w_c = 2 * np.pi * 1e-4 - 1e-5j          # |ω'| ≈ 6e-4 rad/s
        k_grid = (np.arange(6000) + 0.5) * (np.pi / (20 * distances.max()))
        k_grid = k_grid[k_grid < 60.0 / zs]
        spec = elementary_mt_spectra(layered, zs, distances, w_c, k_grid)
        u_imp = spec * (1j * w_c)               # undo the step integration

        m6 = np.asarray(sdr_to_m6(35.0, 60.0, -70.0, 1e16))
        dyn = np.einsum("k,kcn->cn", m6, u_imp)   # (3=Z,R,T, nd) complex
        assert np.abs(dyn.imag).max() < 2e-3 * np.abs(dyn.real).max()

        obs_xy = np.stack([np.zeros(3), distances], axis=-1)
        stat = mt_surface_displacement_layered(layered, zs, obs_xy, m6)
        # static returns (nd, 3 = east, north, up); azimuth-0 mapping:
        want = np.stack([stat[:, 2], stat[:, 1], stat[:, 0]])  # (Z, R, T)
        scale = np.abs(want).max()
        np.testing.assert_allclose(dyn.real, want, atol=5e-3 * scale)


class TestHomogeneousWaveforms:
    @pytest.fixture(scope="class")
    def homog_table(self):
        model = LayeredModel.homogeneous(vp=6000.0, vs=3464.0, rho=2700.0)
        return build_layered_waveform_table(
            model, distances=np.array([40e3, 60e3]),
            depths=np.array([10e3]), nt=128, dt=0.5, t0=0.0,
            fmax=0.8), model

    def test_causality_and_p_arrival(self, homog_table):
        """Energy arrives at the ray P time, nothing (beyond the DWN
        noise floor) before it."""
        table, model = homog_table
        import jax.numpy as jnp

        m6 = jnp.asarray(sdr_to_m6(30.0, 50.0, -90.0, 1e17))
        spec = table.synthesize_spectra(
            m6, 0.0, 0.0, jnp.asarray(10e3), 0.0, 1.0,
            jnp.asarray([0.0, 0.0]), jnp.asarray([40e3, 60e3]),
            jnp.asarray([0, 0], dtype=jnp.int32))
        traces = np.asarray(table.to_time_domain(spec))
        t = np.arange(table.nt) * table.dt
        for i, d in enumerate((40e3, 60e3)):
            tp = np.hypot(d, 10e3) / 6000.0
            ts = np.hypot(d, 10e3) / 3464.0
            tr = traces[i]
            peak = np.abs(tr).max()
            assert peak > 0
            pre = np.abs(tr[t < tp - 2.0]).max()
            assert pre < 0.08 * peak, f"acausal energy at d={d}: {pre/peak}"
            # most energy must arrive in the P-to-after-S window
            body = np.abs(tr[(t > tp - 2.0) & (t < ts + 10.0)]).max()
            assert body == peak

    def test_moment_step_dc_level(self, homog_table):
        """Late-time level of the step response stays finite and the
        spectra contain no NaN/Inf anywhere on the grid."""
        table, _ = homog_table
        sp = np.asarray(table.spectra)
        assert np.isfinite(sp).all()


class TestLayeredTablePipeline:
    def test_build_and_synthesize(self, layered):
        """Two-layer table builds and drives the standard GreensTable
        forward (gather → MT weighting → STF → iDFT windows)."""
        import jax.numpy as jnp

        table = build_layered_waveform_table(
            layered, distances=np.array([30e3, 50e3, 70e3]),
            depths=np.array([6e3, 9e3]), nt=64, dt=1.0, t0=0.0, fmax=0.4)
        assert np.isfinite(np.asarray(table.spectra)).all()
        m6 = jnp.asarray(sdr_to_m6(10.0, 80.0, 20.0, 5e16))
        spec = table.synthesize_spectra(
            m6, 0.0, 0.0, jnp.asarray(7.5e3), 0.0, 2.0,
            jnp.asarray([10e3, -20e3, 40e3]), jnp.asarray([35e3, 40e3, 30e3]),
            jnp.asarray([0, 1, 2], dtype=jnp.int32))
        traces = np.asarray(table.to_time_domain(spec))
        assert np.isfinite(traces).all()
        assert np.abs(traces).max() > 0
        # effective travel-time metadata reflects the layered medium
        assert 5500.0 < table.vp < 6500.0


class TestBandBuilder:
    def test_band_matches_perfreq(self, layered):
        """The shared-k-grid band builder is numerically equivalent to
        the legacy per-frequency build (the wider shared grid only adds
        quadrature points past each frequency's own truncation, where
        the integrand has decayed)."""
        kw = dict(distances=np.array([30e3, 55e3]),
                  depths=np.array([6e3, 9e3]), nt=48, dt=1.0, t0=0.0,
                  fmax=0.35)
        t_band = build_layered_waveform_table(layered, method="band", **kw)
        t_ref = build_layered_waveform_table(layered, method="perfreq", **kw)
        a = np.asarray(t_band.spectra)
        b = np.asarray(t_ref.spectra)
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, atol=5e-4 * scale, rtol=0)

    def test_unknown_method_rejected(self, layered):
        with np.testing.assert_raises(ValueError):
            build_layered_waveform_table(
                layered, distances=np.array([30e3]),
                depths=np.array([6e3]), nt=16, dt=1.0, method="nope")


class TestAttenuation:
    def test_constant_q_shrinks_sh_spectra(self):
        """With constant-Q complex velocities the SH (T-component)
        spectral amplitude drops by ≈ exp(−ω·t_S/2Q) relative to the
        elastic run."""
        from beat_tpu.heart.layered_waveforms import (
            dynamic_integration_grid, elementary_mt_spectra)

        els = LayeredModel.homogeneous(vp=6000.0, vs=3464.0, rho=2700.0)
        anel = LayeredModel(tops=np.array([0.0]), vp=np.array([6000.0]),
                            vs=np.array([3464.0]), rho=np.array([2700.0]),
                            qp=np.array([100.0]), qs=np.array([50.0]))
        zs, d = 10e3, 60e3
        w = 2 * np.pi * 0.5
        w_c = w - 0.02j
        k = dynamic_integration_grid(els, zs, d, 64.0, abs(w_c))
        spec_el = elementary_mt_spectra(els, zs, np.array([d]), w_c, k)
        spec_q = elementary_mt_spectra(anel, zs, np.array([d]), w_c, k)
        # T component of the mne/med elementaries is pure SH
        a_el = np.abs(spec_el[[3, 5], 2, 0]).sum()
        a_q = np.abs(spec_q[[3, 5], 2, 0]).sum()
        t_s = np.hypot(d, zs) / 3464.0
        expected = np.exp(-w * t_s / (2 * 50.0))
        assert 0.8 * expected < a_q / a_el < 1.2 * expected

    def test_nd_rows_with_trailing_comments_still_parse(self):
        m = LayeredModel.from_nd(
            "0.0 5.8 3.36 2.72 # top\n30.0 5.8 3.36 2.72 # bottom\n")
        assert m.nlayers == 1
        assert m.qp is None and m.qs is None
        np.testing.assert_allclose(m.vp, [5800.0])

    def test_q_round_trips_through_nd_and_npz(self, tmp_path):
        nd = ("0.0  5.8  3.36  2.72  1340  600\n"
              "20.0 5.8  3.36  2.72  1340  600\n"
              "20.0 6.5  3.75  2.92  1340  600\n"
              "35.0 6.5  3.75  2.92  1340  600\n")
        m = LayeredModel.from_nd(nd)
        assert m.qp is not None and m.qs is not None
        assert np.allclose(m.qs, 600.0)
        path = str(tmp_path / "m.npz")
        m.save(path)
        m2 = LayeredModel.load(path)
        np.testing.assert_allclose(m2.qp, m.qp)
        # q-less nd still loads with qp/qs None
        m3 = LayeredModel.from_nd("0.0 5.8 3.36 2.72\n30.0 5.8 3.36 2.72\n")
        assert m3.qp is None and m3.qs is None


class TestDepthGridSafety:
    def test_interface_depth_rejected(self, layered):
        """A depth node on a layer interface would make the vertical FD
        dipole straddle the discontinuity — must fail loudly."""
        with pytest.raises(ValueError, match="interface"):
            build_layered_waveform_table(
                layered, distances=np.array([30e3]),
                depths=np.array([3e3]), nt=16, dt=1.0, fmax=0.01)

    def test_nudge_preserves_uniformity(self, layered):
        from beat_tpu.heart.layered_waveforms import \
            nudge_depths_off_interfaces

        depths = np.array([2e3, 3e3, 4e3])       # middle node on interface
        nudged = nudge_depths_off_interfaces(layered, depths)
        steps = np.diff(nudged)
        np.testing.assert_allclose(steps, steps[0])
        assert (nudged != depths).all()
        # and the nudged grid passes the builder's validation
        build_layered_waveform_table(layered, distances=np.array([30e3]),
                                     depths=nudged, nt=16, dt=1.0, fmax=0.01)


class TestTravelTimeTables:
    def test_ray_traced_arrivals_in_table(self, layered, tmp_path):
        """Layered tables carry ray-traced first-arrival grids used by
        travel_time() (reference cake travel-time tables,
        ``heart.py:2532``) and they survive save/load and the pytree
        round trip."""
        import jax

        from beat_tpu.heart.gftable import GreensTable
        from beat_tpu.heart.velocity_model import first_arrival

        table = build_layered_waveform_table(
            layered, distances=np.array([30e3, 50e3, 70e3]),
            depths=np.array([6e3, 9e3]), nt=32, dt=1.0, fmax=0.1)
        assert table.tt_p is not None and table.tt_s is not None
        # grid nodes equal the ray tracer (up to the 1e-3 upper-edge
        # clip skew of the bilinear index, physically irrelevant)
        np.testing.assert_allclose(
            float(table.travel_time("any_P", 50e3, 6e3)),
            first_arrival(layered, 6e3, 50e3, "p")[0], atol=0.01)
        np.testing.assert_allclose(
            float(table.travel_time("any_SH", 30e3, 9e3)),
            first_arrival(layered, 9e3, 30e3, "s")[0], atol=0.01)
        # off-node: bilinear between ray-traced nodes, close to exact
        t_mid = float(table.travel_time("any_P", 40e3, 7.5e3))
        exact = first_arrival(layered, 7.5e3, 40e3, "p")[0]
        assert abs(t_mid - exact) < 0.15
        # and far from the straight-ray fallback error regime
        path = str(tmp_path / "t.npz")
        table.save(path)
        loaded = GreensTable.load(path)
        np.testing.assert_allclose(loaded.tt_p, table.tt_p)
        leaves, treedef = jax.tree_util.tree_flatten(table)
        rt = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_allclose(rt.tt_s, table.tt_s)
        np.testing.assert_allclose(
            float(rt.travel_time("any_P", 40e3, 7.5e3)), t_mid)
        # dtype conversion keeps the travel-time tables too
        import jax.numpy as jnp
        assert table.astype(jnp.bfloat16).tt_p is not None


def test_build_gfs_geometry_cli(tmp_path, layered):
    """`beat-tpu build_gfs --mode geometry` builds the seismic waveform
    table natively from the gf_config earth model (reference
    ``command_build_gfs`` ``apps/beat.py:1366`` shelling to fomosto)."""
    from beat_tpu.apps.cli import main
    from beat_tpu.config import dump_config, init_config
    from beat_tpu.heart.gftable import GreensTable

    proj = str(tmp_path / "proj")
    config = init_config("p", proj, source_types=("MTSource",),
                         n_sources=(1,), datatypes=("seismic",))
    layered.save(str(tmp_path / "proj" / "model.npz"))
    config.seismic_config.gf_config = {
        "earth_model": "model.npz",
        "distance_min": 30e3, "distance_max": 60e3, "n_distances": 2,
        "depth_min": 6e3, "depth_max": 9e3, "n_depths": 1,
        "nt": 32, "dt": 1.0, "fmax": 0.25}
    dump_config(config, proj)
    rc = main(["build_gfs", proj, "--mode", "geometry",
               "--datatypes", "seismic"])
    assert rc == 0
    table = GreensTable.load(str(tmp_path / "proj" / "gf_table.npz"))
    sp = np.asarray(table.spectra)
    assert sp.shape[:4] == (6, 3, 2, 1)
    assert np.isfinite(sp).all()
    assert np.abs(sp).max() > 0
    # asking for a datatype the project has no config for fails loudly
    assert main(["build_gfs", proj, "--mode", "geometry",
                 "--datatypes", "geodetic"]) == 1


def test_build_gfs_n_variations_cli(tmp_path):
    """`build_gfs` with gf_config n_variations builds perturbed-model
    tables (gf_table.var*.npz) for velocity-model prediction covariances
    (reference NonlinearGFConfig n_variations + heart.ensemble_earthmodel)."""
    from beat_tpu.apps.cli import main
    from beat_tpu.config import dump_config, init_config
    from beat_tpu.heart.gftable import GreensTable

    proj = str(tmp_path / "proj")
    config = init_config("p", proj, source_types=("MTSource",),
                         n_sources=(1,), datatypes=("seismic",))
    config.seismic_config.gf_config = {
        "vp": 6000.0, "vs": 3500.0, "rho": 2700.0,
        "distance_min": 30e3, "distance_max": 60e3, "n_distances": 2,
        "depth_min": 6e3, "depth_max": 9e3, "n_depths": 2,
        "nt": 32, "dt": 1.0, "n_variations": 2, "variation_seed": 5}
    dump_config(config, proj)
    assert main(["build_gfs", proj, "--mode", "geometry",
                 "--datatypes", "seismic"]) == 0
    base = GreensTable.load(proj + "/gf_table.npz")
    v1 = GreensTable.load(proj + "/gf_table.var1.npz")
    v2 = GreensTable.load(proj + "/gf_table.var2.npz")
    assert base.vp == 6000.0
    assert v1.vp != base.vp and v2.vp != v1.vp
    a, b = np.asarray(v1.spectra), np.asarray(base.spectra)
    assert np.abs(a - b).max() > 0.01 * np.abs(b).max()  # genuinely perturbed
    # deterministic under the configured seed
    assert main(["build_gfs", proj, "--mode", "geometry",
                 "--datatypes", "seismic"]) == 0
    assert GreensTable.load(proj + "/gf_table.var1.npz").vp == v1.vp
