"""
Convert precomputed Green's-function stores into HBM
:class:`beat_tpu.heart.gftable.GreensTable` tables.

This is the bridge from the reference's layered-earth machinery: the
expensive Fortran wavefield computation (qseis/qssp/psgrn via fomosto,
reference ``beat/heart.py:2230,2426``) stays an offline CPU precompute;
the converters here sample finished stores onto the regular
(distance, depth) grid of elementary-MT responses at azimuth 0 that the
on-device forward consumes.

Two store flavours:

* **Trace store** (:func:`greens_table_from_traces`) — a plain npz of
  elementary time traces (the documented, pyrocko-free interchange
  format written by :func:`write_trace_store`; any wavefield code can
  produce it).
* **pyrocko fomosto store** (:func:`greens_table_from_store`) —
  import-gated on ``pyrocko``; synthesises the elementary responses
  through ``engine.process`` and reuses the same trace→spectrum
  resample/align path.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger("beat_tpu.heart.store_convert")

#: elementary moment tensors in NED (matches gftable.ELEMENTARY_M6 order)
_ELEMENTARY = [
    dict(mnn=1.0), dict(mee=1.0), dict(mdd=1.0),
    dict(mne=1.0), dict(mnd=1.0), dict(med=1.0),
]


def trace_to_spectrum(ydata, tmin: float, dt_in: float,
                      nt: int, dt: float, t0: float = 0.0) -> np.ndarray:
    """
    Resample a single time trace onto the table grid and return its rfft.

    The trace holds samples at ``tmin + i·dt_in``; the table wants the
    band-limited signal sampled at ``t0 + j·dt`` for ``j < nt``.  Three
    exact-for-band-limited steps (the reference's equivalent is pyrocko
    ``tr.resample`` + snap inside ``post_process_trace``
    ``beat/heart.py:3466``):

    1. Fourier resampling ``dt_in → dt`` (spectrum truncation/zero-pad,
       as ``scipy.signal.resample``);
    2. integer-sample placement of the resampled trace on the output
       grid;
    3. residual sub-sample alignment as a frequency-domain phase shift.

    Returns the complex rfft spectrum of length ``nt//2 + 1``.
    """
    y = np.asarray(ydata, dtype=np.float64)
    if abs(dt_in - dt) > 1e-9 * dt:
        n_in = y.size
        n_out = max(int(round(n_in * dt_in / dt)), 1)
        spec_in = np.fft.rfft(y)
        spec_out = np.zeros(n_out // 2 + 1, dtype=np.complex128)
        ncopy = min(spec_in.size, spec_out.size)
        spec_out[:ncopy] = spec_in[:ncopy]
        y = np.fft.irfft(spec_out, n=n_out) * (n_out / n_in)

    offset = (tmin - t0) / dt
    i0 = int(np.floor(offset))
    frac = offset - i0                      # in [0, 1) sample units

    data = np.zeros(nt)
    src_lo = max(-i0, 0)
    dst_lo = max(i0, 0)
    n_copy = min(y.size - src_lo, nt - dst_lo)
    if n_copy > 0:
        data[dst_lo:dst_lo + n_copy] = y[src_lo:src_lo + n_copy]

    spec = np.fft.rfft(data)
    if frac > 1e-12:
        freqs = np.fft.rfftfreq(nt, dt)
        spec = spec * np.exp(-2j * np.pi * freqs * frac * dt)
    return spec


def write_trace_store(path: str, traces, tmins, distances, depths,
                      dt: float, vp: float = 6000.0, vs: float = 3500.0,
                      rho: float = 2700.0) -> None:
    """
    Write the documented trace-store interchange npz.

    traces : (6, 3, ndist, ndepth, nt_store) elementary time traces
        (MT order mnn…med, components Z/R/T, receiver at azimuth 0)
    tmins : (ndist, ndepth) start time of each node's traces relative to
        origin time [s]
    distances, depths : grid nodes [m]; dt : store sample interval [s]
    """
    traces = np.asarray(traces)
    tmins = np.asarray(tmins, dtype=np.float64)
    if traces.ndim != 5 or traces.shape[:2] != (6, 3):
        raise ValueError(f"traces must be (6, 3, nd, nz, nt), got {traces.shape}")
    if tmins.shape != traces.shape[2:4]:
        raise ValueError(f"tmins {tmins.shape} != grid {traces.shape[2:4]}")
    if (np.asarray(distances).size, np.asarray(depths).size) != traces.shape[2:4]:
        raise ValueError(
            f"distances/depths ({np.asarray(distances).size}, "
            f"{np.asarray(depths).size}) do not match the trace grid "
            f"{traces.shape[2:4]}")
    np.savez_compressed(
        path, traces=traces.astype(np.float32), tmins=tmins,
        distances=np.asarray(distances, dtype=np.float64),
        depths=np.asarray(depths, dtype=np.float64),
        meta=np.array([dt, vp, vs, rho]))
    logger.info("Wrote trace store %s (%s)", path, traces.shape)


def greens_table_from_traces(path: str, nt: int, dt: float, t0: float = 0.0):
    """
    Build a :class:`GreensTable` from a trace-store npz
    (:func:`write_trace_store` schema).  Each stored trace is
    Fourier-resampled to ``dt``, aligned to the common ``t0`` time axis
    and transformed to (re, im) pair spectra.
    """
    import jax.numpy as jnp

    from beat_tpu.heart.gftable import GreensTable

    with np.load(path) as z:
        traces = z["traces"]
        tmins = z["tmins"]
        distances = z["distances"]
        depths = z["depths"]
        dt_store, vp, vs, rho = (float(v) for v in z["meta"])

    nf = np.fft.rfftfreq(nt, dt).size
    nd, nz = distances.size, depths.size
    spectra = np.zeros((6, 3, nd, nz, nf), dtype=np.complex128)
    for id_ in range(nd):
        for iz in range(nz):
            tmin = float(tmins[id_, iz])
            for k in range(6):
                for c in range(3):
                    spectra[k, c, id_, iz] = trace_to_spectrum(
                        traces[k, c, id_, iz], tmin, dt_store, nt, dt, t0)

    logger.info("Converted trace store %s -> GreensTable (%i x %i grid, "
                "dt %g -> %g)", path, nd, nz, dt_store, dt)
    pairs = np.stack([spectra.real, spectra.imag], axis=-1).astype(np.float32)
    return GreensTable(spectra=jnp.asarray(pairs), distances=distances,
                       depths=depths, dt=dt, nt=nt, t0=t0,
                       vp=vp, vs=vs, rho=rho)


def greens_table_from_store(store_id: str, store_superdir: str,
                            distances, depths, nt: int, dt: float,
                            t0: float = 0.0):
    """
    Sample a pyrocko GF store into a :class:`GreensTable`.

    For every (distance, depth) grid node, the responses to the six
    elementary MTs are synthesised for a receiver due north (azimuth 0)
    in (Z, R, T) components, then routed through the same
    :func:`trace_to_spectrum` resample/align path as the trace-store
    converter.
    """
    try:
        from pyrocko import gf
    except ImportError as e:
        raise ImportError(
            "pyrocko is required for store conversion; hermetic runs use "
            "beat_tpu.heart.gftable.build_homogeneous_table or a trace "
            "store (greens_table_from_traces)") from e

    import jax.numpy as jnp

    from beat_tpu.heart.gftable import GreensTable

    engine = gf.LocalEngine(store_superdirs=[store_superdir])
    store = engine.get_store(store_id)
    distances = np.asarray(distances, dtype=float)
    depths = np.asarray(depths, dtype=float)
    nf = np.fft.rfftfreq(nt, dt).size
    spectra = np.zeros((6, 3, distances.size, depths.size, nf), dtype=np.complex128)

    for iz, z in enumerate(depths):
        for id_, d in enumerate(distances):
            for k, m6_kwargs in enumerate(_ELEMENTARY):
                source = gf.MTSource(north_shift=0.0, east_shift=0.0, depth=z,
                                     **{k2: v for k2, v in m6_kwargs.items()})
                targets = []
                for comp, azi in (("Z", 0.0), ("R", 0.0), ("T", 90.0)):
                    targets.append(gf.Target(
                        quantity="displacement",
                        lat=0.0, lon=0.0, north_shift=d, east_shift=0.0,
                        store_id=store_id,
                        codes=("", "GT", "", comp),
                        azimuth=azi if comp != "Z" else 0.0,
                        dip=-90.0 if comp == "Z" else 0.0))
                response = engine.process(source, targets)
                for c, tr in enumerate(response.pyrocko_traces()):
                    spectra[k, c, id_, iz, :] = trace_to_spectrum(
                        tr.ydata, tr.tmin, tr.deltat, nt, dt, t0)

    # medium properties from the store model: velocities for travel-time
    # estimates, density for the shear modulus (moment/magnitude scaling
    # uses table.rho * table.vs**2)
    model = store.config.earthmodel_1d
    vp = float(model.profile("vp")[0]) if model is not None else 6000.0
    vs = float(model.profile("vs")[0]) if model is not None else 3500.0
    rho = float(model.profile("rho")[0]) if model is not None else 2700.0
    logger.info("Converted store %s -> GreensTable (%i x %i grid)",
                store_id, distances.size, depths.size)
    pairs = np.stack([spectra.real, spectra.imag], axis=-1).astype(np.float32)
    return GreensTable(spectra=jnp.asarray(pairs), distances=distances,
                       depths=depths, dt=dt, nt=nt, t0=t0, vp=vp, vs=vs,
                       rho=rho)
