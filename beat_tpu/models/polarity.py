"""
Polarity composite: first-motion likelihood
(reference ``beat/models/polarity.py:32`` ``PolarityComposite``).
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from beat_tpu.distributions import polarity_llk
from beat_tpu.heart.polarity import (
    pol_synthetics,
    radiation_weights_p,
    radiation_weights_sh,
    radiation_weights_sv,
    takeoff_vector,
)
from beat_tpu.models.base import Composite
from beat_tpu.models.seismic import source_m6

logger = logging.getLogger("beat_tpu.models.polarity")


class PolarityComposite(Composite):
    name = "polarity"

    def __init__(self, targets, sources, wavename="any_P", gamma=0.01):
        """
        targets : list of :class:`beat_tpu.heart.polarity.PolarityTarget`
        sources : source templates (MT family)
        gamma : probability of a wrong polarity reading (Weber 2018 data
            error; reference ``polarity_llk`` param).
        """
        self.targets = list(targets)
        self.sources = list(sources)
        self.wavename = wavename
        self.gamma = gamma

        az = jnp.asarray([t.azimuth_rad for t in self.targets])
        to = jnp.asarray([t.takeoff_rad for t in self.targets])
        gvec = takeoff_vector(az, to)
        if wavename.lower().endswith("sh"):
            self.weights = radiation_weights_sh(gvec, az)
        elif wavename.lower().endswith("sv"):
            self.weights = radiation_weights_sv(gvec, az, to)
        else:
            self.weights = radiation_weights_p(gvec)
        self.obs = jnp.asarray([t.polarity for t in self.targets], dtype=jnp.float32)
        logger.info("Polarity composite: %i targets (%s)", len(self.targets), wavename)

    @property
    def hypername(self) -> str:
        return f"h_{self.wavename}_pol_0"

    def get_hypernames(self):
        return [self.hypername]

    def device_data(self):
        return {"weights": self.weights, "obs": self.obs}

    def loglike(self, point: dict, data=None):
        data = self.device_data() if data is None else data
        m6 = source_m6(self.sources[0], point, 0, len(self.sources))
        m6n = m6 / jnp.maximum(jnp.max(jnp.abs(m6)), 1e-30)
        amps = pol_synthetics(m6n, data["weights"])
        sigma = jnp.exp(point.get(self.hypername, 0.0))
        return jnp.sum(polarity_llk(data["obs"], amps, self.gamma, sigma))

    def hyper_loglike(self, point: dict, fixed_point: dict, data=None):
        data = self.device_data() if data is None else data
        m6 = source_m6(self.sources[0], fixed_point, 0, len(self.sources))
        m6n = m6 / jnp.maximum(jnp.max(jnp.abs(m6)), 1e-30)
        amps = pol_synthetics(m6n, data["weights"])
        sigma = jnp.exp(point.get(self.hypername, 0.0))
        return jnp.sum(polarity_llk(data["obs"], amps, self.gamma, sigma))

    def get_synthetics(self, point: dict):
        point = {k: jnp.asarray(v) for k, v in point.items()}
        m6 = source_m6(self.sources[0], point, 0, len(self.sources))
        m6n = m6 / jnp.maximum(jnp.max(jnp.abs(m6)), 1e-30)
        return {"polarities": np.sign(np.asarray(pol_synthetics(m6n, self.weights)))}
