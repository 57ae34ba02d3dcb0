"""
Trace-store → GreensTable conversion (reference GF-store consumption
``beat/heart.py:2230`` + ``post_process_trace`` resample/align
``heart.py:3466``): the resample / time-align / rfft path is exercised
hermetically against the native homogeneous table, in the spirit of the
reference's ``test_ffi_gfstacking.py:53-58`` store-vs-synthesis check.
"""

import numpy as np
import pytest

from beat_tpu.heart.gftable import build_homogeneous_table
from beat_tpu.heart.store_convert import (greens_table_from_traces,
                                          trace_to_spectrum,
                                          write_trace_store)

NT, DT, T0 = 128, 0.5, 2.0


@pytest.fixture(scope="module")
def table():
    """Small homogeneous table, smoothly band-limited so store traces
    have compact support (no wrap-around in the alignment checks)."""
    t = build_homogeneous_table(
        distances=np.linspace(30e3, 90e3, 5),
        depths=np.linspace(4e3, 12e3, 3), nt=NT, dt=DT, t0=T0)
    freqs = np.fft.rfftfreq(NT, DT)
    lowpass = np.exp(-0.5 * (freqs / 0.25) ** 2)  # gaussian roll-off
    sp = np.asarray(t.spectra)
    sp = sp * lowpass[None, None, None, None, :, None]
    # make the spectra exactly representable by real nt-sample traces
    # (the analytic phasors carry unphysical imaginary DC/Nyquist parts
    # that no time-domain store can round-trip)
    spec = np.fft.rfft(np.fft.irfft(sp[..., 0] + 1j * sp[..., 1], n=NT), n=NT)
    sp = np.stack([spec.real, spec.imag], axis=-1).astype(np.float32)
    import jax.numpy as jnp
    t.spectra = jnp.asarray(sp)
    return t


def _store_traces(table, upsample=1, shift_samples=0.0):
    """Elementary time traces from the table's spectra, optionally
    Fourier-upsampled and advanced by ``shift_samples`` output samples
    (their tmin is then ``t0 - shift_samples*dt``)."""
    sp = np.asarray(table.spectra)
    spec = sp[..., 0] + 1j * sp[..., 1]          # (6, 3, nd, nz, nf)
    freqs = np.fft.rfftfreq(NT, DT)
    if shift_samples:
        spec = spec * np.exp(-2j * np.pi * freqs * shift_samples * DT)
    n_out = NT * upsample
    if upsample > 1:
        pad = np.zeros(spec.shape[:-1] + (n_out // 2 + 1,), dtype=complex)
        pad[..., :spec.shape[-1]] = spec
        spec = pad
    return np.fft.irfft(spec, n=n_out) * upsample   # (6, 3, nd, nz, n_out)


class TestTraceToSpectrum:
    def test_integer_shift_alignment(self):
        rng = np.random.default_rng(0)
        sig = np.zeros(NT)
        sig[20:40] = rng.normal(size=20)
        # trace starts 5 samples before t0, i.e. 5 leading junk-free zeros
        y = np.concatenate([np.zeros(5), sig])[:NT]
        spec = trace_to_spectrum(y, tmin=T0 - 5 * DT, dt_in=DT,
                                 nt=NT, dt=DT, t0=T0)
        np.testing.assert_allclose(np.fft.irfft(spec, n=NT)[:NT - 5],
                                   sig[:NT - 5], atol=1e-12)

    def test_subsample_shift_is_phase(self):
        freqs = np.fft.rfftfreq(NT, DT)
        spec0 = np.exp(-0.5 * (freqs / 0.3) ** 2) * np.exp(
            -2j * np.pi * freqs * 20 * DT)
        y = np.fft.irfft(spec0, n=NT)
        # same signal declared to start 0.3 samples earlier than t0:
        # conversion must re-align it with a frac phase shift
        y_shifted = np.fft.irfft(
            spec0 * np.exp(-2j * np.pi * freqs * 0.3 * DT), n=NT)
        spec = trace_to_spectrum(y_shifted, tmin=T0 - 0.3 * DT, dt_in=DT,
                                 nt=NT, dt=DT, t0=T0)
        np.testing.assert_allclose(np.fft.irfft(spec, n=NT), y,
                                   atol=2e-4 * np.abs(y).max())

    def test_resample_band_limited_exact(self):
        freqs = np.fft.rfftfreq(NT, DT)
        spec0 = np.exp(-0.5 * (freqs / 0.3) ** 2) * np.exp(
            -2j * np.pi * freqs * 30 * DT)
        y = np.fft.irfft(spec0, n=NT)
        # store at twice the rate
        pad = np.zeros(NT + 1, dtype=complex)
        pad[:spec0.size] = spec0
        y2 = np.fft.irfft(pad, n=2 * NT) * 2
        spec = trace_to_spectrum(y2, tmin=T0, dt_in=DT / 2,
                                 nt=NT, dt=DT, t0=T0)
        np.testing.assert_allclose(np.fft.irfft(spec, n=NT), y,
                                   atol=1e-10 * np.abs(y).max())


class TestTraceStoreRoundTrip:
    def _check(self, tmp_path, table, upsample, shift_samples, tol):
        traces = _store_traces(table, upsample=upsample,
                               shift_samples=shift_samples)
        nd, nz = len(table.distances), len(table.depths)
        tmins = np.full((nd, nz), T0 - shift_samples * DT)
        path = str(tmp_path / "gf_tracestore.npz")
        write_trace_store(path, traces, tmins, table.distances,
                          table.depths, dt=DT / upsample,
                          vp=table.vp, vs=table.vs, rho=table.rho)
        conv = greens_table_from_traces(path, nt=NT, dt=DT, t0=T0)
        assert conv.vp == table.vp and conv.rho == table.rho
        a = np.asarray(conv.spectra)
        b = np.asarray(table.spectra)
        scale = np.abs(b).max()
        # the Nyquist bin is excluded: a real dt-sampled trace cannot
        # carry a complex Nyquist component, so sub-sample shifts lose
        # it by construction (stores are band-limited below Nyquist)
        np.testing.assert_allclose(a[..., :-1, :], b[..., :-1, :],
                                   atol=tol * scale)
        return conv

    def test_same_rate_zero_shift_exact(self, tmp_path, table):
        # tolerance floor = float32 store quantization over the rfft sum
        self._check(tmp_path, table, upsample=1, shift_samples=0.0, tol=3e-5)

    def test_resampled_and_subsample_shifted(self, tmp_path, table):
        self._check(tmp_path, table, upsample=2, shift_samples=2.4, tol=2e-4)

    def test_synthesis_equivalence(self, tmp_path, table):
        """Windowed synthesis through the converted table matches the
        native table (reference tolerance spirit rtol=5e-6,
        ``test_ffi_gfstacking.py:53-58``)."""
        import jax.numpy as jnp

        from beat_tpu.sources import sdr_to_m6

        conv = self._check(tmp_path, table, upsample=2, shift_samples=1.7,
                           tol=2e-4)
        m6 = jnp.asarray(sdr_to_m6(35.0, 70.0, -20.0, 1e17))
        st_e = jnp.asarray([40e3, -55e3, 10e3])
        st_n = jnp.asarray([30e3, 20e3, -70e3])
        comp = jnp.asarray([0, 1, 2], dtype=jnp.int32)
        args = (m6, 0.0, 0.0, jnp.asarray(8e3), 0.5, 2.0, st_e, st_n, comp)
        want = np.asarray(table.to_time_domain(table.synthesize_spectra(*args)))
        got = np.asarray(conv.to_time_domain(conv.synthesize_spectra(*args)))
        np.testing.assert_allclose(got, want, atol=3e-4 * np.abs(want).max())


def test_write_trace_store_validates_grid_axes(tmp_path, table):
    traces = _store_traces(table)
    with pytest.raises(ValueError, match="do not match the trace grid"):
        write_trace_store(str(tmp_path / "bad.npz"), traces,
                          np.full((5, 3), T0), table.distances[:3],
                          table.depths, dt=DT)


def test_nonuniform_grids_rejected():
    """The bilinear gathers assume a constant grid step — GreensTable
    must refuse non-uniform distance/depth axes loudly."""
    import jax.numpy as jnp

    from beat_tpu.heart.gftable import GreensTable

    with pytest.raises(ValueError, match="uniformly spaced"):
        GreensTable(spectra=jnp.zeros((6, 3, 3, 2, 5, 2)),
                    distances=np.array([10e3, 20e3, 40e3]),
                    depths=np.array([5e3, 10e3]), dt=1.0, nt=8)


def test_build_gfs_tracestore_cli(tmp_path, table):
    """`beat-tpu build_gfs --seismic_tracestore` converts a store npz
    into the project's gf_table.npz."""
    from beat_tpu.apps.cli import main
    from beat_tpu.heart.gftable import GreensTable

    proj = tmp_path / "proj"
    proj.mkdir()
    traces = _store_traces(table)
    nd, nz = len(table.distances), len(table.depths)
    store = str(tmp_path / "store.npz")
    write_trace_store(store, traces, np.full((nd, nz), T0),
                      table.distances, table.depths, dt=DT)
    rc = main(["build_gfs", str(proj), "--seismic_tracestore", store,
               "--nt", str(NT), "--dt", str(DT), "--t0", str(T0)])
    assert rc == 0
    loaded = GreensTable.load(str(proj / "gf_table.npz"))
    np.testing.assert_allclose(np.asarray(loaded.spectra),
                               np.asarray(table.spectra),
                               atol=3e-5 * np.abs(np.asarray(table.spectra)).max())
