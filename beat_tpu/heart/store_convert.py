"""
Convert pyrocko fomosto Green's-function stores into HBM
:class:`beat_tpu.heart.gftable.GreensTable` tables.

This is the bridge from the reference's layered-earth machinery: the
expensive Fortran wavefield computation (qseis/qssp/psgrn via fomosto,
reference ``beat/heart.py:2230,2426``) stays an offline CPU precompute;
this converter samples the finished store onto the regular
(distance, depth) grid of elementary-MT responses at azimuth 0 that the
on-device forward consumes.  Import-gated: requires ``pyrocko``.
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


def greens_table_from_store(store_id: str, store_superdir: str,
                            distances, depths, nt: int, dt: float,
                            t0: float = 0.0):
    """
    Sample a pyrocko GF store into a :class:`GreensTable`.

    For every (distance, depth) grid node, the responses to the six
    elementary MTs are synthesised for a receiver due north (azimuth 0)
    in (Z, R, T) components, resampled to ``dt`` on ``nt`` samples
    starting ``t0`` after origin, and transformed to rfft spectra.
    """
    try:
        from pyrocko import gf
    except ImportError as e:
        raise ImportError(
            "pyrocko is required for store conversion; hermetic runs use "
            "beat_tpu.heart.gftable.build_homogeneous_table") from e

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
                    tr = tr.copy()
                    tr.resample(dt)
                    data = np.zeros(nt)
                    i0 = int(round((tr.tmin - t0) / dt))
                    n_copy = min(tr.ydata.size, nt - max(i0, 0))
                    if n_copy > 0 and i0 < nt:
                        data[max(i0, 0):max(i0, 0) + n_copy] = \
                            tr.ydata[max(-i0, 0):max(-i0, 0) + n_copy]
                    spectra[k, c, id_, iz, :] = np.fft.rfft(data)

    # medium velocities for travel-time estimates from the store model
    model = store.config.earthmodel_1d
    vp = float(model.profile("vp")[0]) if model is not None else 6000.0
    vs = float(model.profile("vs")[0]) if model is not None else 3500.0
    logger.info("Converted store %s -> GreensTable (%i x %i grid)",
                store_id, distances.size, depths.size)
    pairs = np.stack([spectra.real, spectra.imag], axis=-1).astype(np.float32)
    return GreensTable(spectra=jnp.asarray(pairs), distances=distances,
                       depths=depths, dt=dt, nt=nt, t0=t0, vp=vp, vs=vs)
