"""
Polarity composite: first-motion likelihood
(reference ``beat/models/polarity.py:32`` ``PolarityComposite``).

Supports several polarity phase maps fit jointly (reference
``PolarityConfig.waveforms`` of ``PolarityFitConfig``,
``config.py:720-798``): each map has its own phase (P/SH/SV radiation
pattern), targets, hyperparameter ``h_<name>_pol_<i>`` and — in
multi-event problems — its own source via ``event_idx``
(reference ``models/polarity.py:84``).

When the source location is sampled, takeoff angles and radiation
weights are recomputed *per draw* from a device-resident
(depth × distance) takeoff table — the reference re-ray-traces the
targets each draw through cake interpolation tables
(``beat/pytensorf.py:345-362``, ``heart.py:2333``); here the host ray
tracer fills the grid once and the bilinear gather is pure XLA inside
the jitted likelihood.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from beat_tpu.distributions import polarity_llk
from beat_tpu.heart.polarity import (
    TakeoffTable,
    pol_synthetics,
    radiation_weights,
    radiation_weights_p,
    radiation_weights_sh,
    radiation_weights_sv,
    takeoff_vector,
)
from beat_tpu.models.base import Composite
from beat_tpu.models.seismic import point_getter, source_m6

logger = logging.getLogger("beat_tpu.models.polarity")

#: sampled point keys that move the source and hence the ray geometry
LOCATION_KEYS = ("depth", "east_shift", "north_shift")


class PolarityMapping:
    """One polarity phase map: targets sharing a phase/radiation pattern
    (reference ``PolarityMapping`` ``heart.py:2624`` subclass).

    ``takeoff_table`` (a :class:`beat_tpu.heart.polarity.TakeoffTable`)
    enables per-draw geometry: it requires every target to carry its
    epicentral ``distance_m`` from the catalog origin, from which the
    station NE offsets are fixed and the (distance, azimuth, takeoff)
    triple is re-derived for the traced source location each draw."""

    def __init__(self, wavename, targets, event_idx=0, mapnumber=0,
                 takeoff_table: TakeoffTable | None = None):
        self.wavename = wavename
        self.targets = list(targets)
        self.event_idx = int(event_idx)
        self.mapnumber = int(mapnumber)
        self.takeoff_table = takeoff_table

        az = jnp.asarray([t.azimuth_rad for t in self.targets])
        to = jnp.asarray([t.takeoff_rad for t in self.targets])
        gvec = takeoff_vector(az, to)
        if wavename.lower().endswith("sh"):
            self.weights = radiation_weights_sh(gvec, az)
        elif wavename.lower().endswith("sv"):
            self.weights = radiation_weights_sv(gvec, az, to)
        else:
            self.weights = radiation_weights_p(gvec)
        self.obs = jnp.asarray([t.polarity for t in self.targets],
                               dtype=jnp.float32)

        if takeoff_table is not None:
            dist = [t.distance_m for t in self.targets]
            if any(d is None for d in dist):
                raise ValueError(
                    f"polarity map {self.hypername}: per-draw takeoff "
                    "re-interpolation needs distance_m on every target "
                    "(supply 'distances_m' in polarity_data.npz)")
            dist = np.asarray(dist, dtype=float)
            azn = np.asarray([t.azimuth_rad for t in self.targets])
            # station NE offsets from the catalog origin (shifts == 0)
            self.station_n = jnp.asarray(dist * np.cos(azn))
            self.station_e = jnp.asarray(dist * np.sin(azn))

    @property
    def hypername(self) -> str:
        """Reference naming ``h_<name>_pol_<i>``
        (``config.py:789`` ``get_hypernames``)."""
        return f"h_{self.wavename}_pol_{self.mapnumber}"


class PolarityComposite(Composite):
    name = "polarity"

    def __init__(self, targets=None, sources=(), wavename="any_P",
                 gamma=0.01, maps=None):
        """
        targets : list of :class:`beat_tpu.heart.polarity.PolarityTarget`
            (single-map shorthand; ignored when ``maps`` is given)
        sources : source templates (MT family); multi-event problems use
            ``sources[map.event_idx]`` per map
        maps : list of :class:`PolarityMapping` for fitting several
            phases jointly (reference ``PolarityConfig.waveforms``)
        gamma : probability of a wrong polarity reading (Weber 2018 data
            error; reference ``polarity_llk`` param).
        """
        if maps is None:
            maps = [PolarityMapping(wavename, targets)]
        self.maps = list(maps)
        self.sources = list(sources)
        self.gamma = gamma
        if not self.sources:
            raise ValueError(
                "PolarityComposite needs at least one source template "
                "(the radiation pattern has nothing to evaluate without "
                "one)")
        for m in self.maps:
            if not (0 <= m.event_idx < len(self.sources)):
                raise ValueError(
                    f"polarity map {m.hypername}: event_idx {m.event_idx} "
                    f"outside [0, {len(self.sources)})")
        logger.info("Polarity composite: %i maps, %i targets total",
                    len(self.maps), sum(len(m.targets) for m in self.maps))

    # -- single-map backward-compatible views -------------------------------

    @property
    def targets(self):
        return [t for m in self.maps for t in m.targets]

    @property
    def wavename(self):
        return self.maps[0].wavename

    @property
    def hypername(self) -> str:
        return self.maps[0].hypername

    def get_hypernames(self):
        return [m.hypername for m in self.maps]

    def device_data(self):
        out = []
        for m in self.maps:
            dev = {"weights": m.weights, "obs": m.obs}
            if m.takeoff_table is not None:
                dev.update(m.takeoff_table.as_device())
                dev["station_n"] = m.station_n
                dev["station_e"] = m.station_e
            out.append(dev)
        return out

    def _traced_weights(self, m, dev, point):
        """Radiation weights for the (possibly traced) source location:
        re-derives distance/azimuth from the fixed station NE offsets and
        gathers the takeoff from the table — the per-draw analogue of the
        reference's ``pytensorf.py:345-362`` re-ray-tracing.  Falls back
        to the load-time frozen weights when no table is attached or the
        location is not sampled."""
        if "station_n" not in dev or not any(k in point for k in LOCATION_KEYS):
            return dev["weights"]
        get = point_getter(self.sources[m.event_idx], point, m.event_idx,
                           len(self.sources))
        vn = dev["station_n"] - get("north_shift")
        ve = dev["station_e"] - get("east_shift")
        dist = jnp.sqrt(vn * vn + ve * ve)
        az = jnp.arctan2(ve, vn)
        table = TakeoffTable.from_device(dev)
        to = table.interp(get("depth"), dist)
        gvec = takeoff_vector(az, to)
        return radiation_weights(m.wavename, gvec, az, to)

    def _map_llk(self, m, dev, point, fixed_point=None):
        src_point = point if fixed_point is None else fixed_point
        m6 = source_m6(self.sources[m.event_idx], src_point, m.event_idx,
                       len(self.sources))
        m6n = m6 / jnp.maximum(jnp.max(jnp.abs(m6)), 1e-30)
        amps = pol_synthetics(m6n, self._traced_weights(m, dev, src_point))
        sigma = jnp.exp(point.get(m.hypername, 0.0))
        return jnp.sum(polarity_llk(dev["obs"], amps, self.gamma, sigma))

    def loglike(self, point: dict, data=None):
        data = self.device_data() if data is None else data
        return sum(self._map_llk(m, dev, point)
                   for m, dev in zip(self.maps, data))

    def hyper_loglike(self, point: dict, fixed_point: dict, data=None):
        data = self.device_data() if data is None else data
        return sum(self._map_llk(m, dev, point, fixed_point=fixed_point)
                   for m, dev in zip(self.maps, data))

    def get_synthetics(self, point: dict) -> dict:
        point = {k: jnp.asarray(v) for k, v in point.items()}
        out = {}
        for m, dev in zip(self.maps, self.device_data()):
            m6 = source_m6(self.sources[m.event_idx], point, m.event_idx,
                           len(self.sources))
            m6n = m6 / jnp.maximum(jnp.max(jnp.abs(m6)), 1e-30)
            out[f"{m.wavename}_pol_{m.mapnumber}"] = np.sign(
                np.asarray(pol_synthetics(
                    m6n, self._traced_weights(m, dev, point))))
        # single-map backward-compatible key
        if len(self.maps) == 1:
            out["polarities"] = next(iter(out.values()))
        return out
