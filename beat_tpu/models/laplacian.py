"""
Laplacian smoothing pseudo-composite for distributed-slip priors.

Reference ``beat/models/laplacian.py:27`` ``LaplacianDistributerComposite``:
adds, per slip component m, the Gaussian smoothness prior

    -0.5 * ( -log|LᵀL| + npatch·(log 2π + 2h) + e^{-2h}·‖L·m‖² )

with smoothing strength hyperparameter ``h_laplacian``
(``config.py:126``).
"""

from __future__ import annotations

import logging
import math

import jax.numpy as jnp
import numpy as np

from beat_tpu.ffi.laplacian import smoothing_operator_log_determinant
from beat_tpu.models.base import Composite

logger = logging.getLogger("beat_tpu.models.laplacian")

LOG_2PI = math.log(2.0 * math.pi)
HYPER_NAME = "h_laplacian"


class LaplacianDistributerComposite(Composite):
    name = "laplacian"

    def __init__(self, fault, slip_varnames=("uparr",),
                 correlation_function="nearest_neighbor"):
        self.fault = fault
        self.slip_varnames = list(slip_varnames)
        smooth = fault.get_smoothing_operator(correlation_function)
        self.smoothing_op = jnp.asarray(smooth, dtype=jnp.float32)
        self.slog_det = float(smoothing_operator_log_determinant(smooth))
        self.npatches = smooth.shape[0]
        logger.info("Laplacian composite: %i patches, logdet %.2f",
                    self.npatches, self.slog_det)

    def get_hypernames(self):
        return [HYPER_NAME]

    def device_data(self):
        return {"smoothing_op": self.smoothing_op}

    def loglike(self, point: dict, data=None):
        op = self.smoothing_op if data is None else data["smoothing_op"]
        h = point.get(HYPER_NAME, 0.0)
        total = 0.0
        for var in self.slip_varnames:
            m = point[var]
            Lm = op @ m
            exponent = jnp.dot(Lm, Lm)
            total = total + (-0.5) * (
                -self.slog_det
                + self.npatches * (LOG_2PI + 2.0 * h)
                + jnp.exp(-2.0 * h) * exponent)
        return total

    def hyper_loglike(self, point: dict, fixed_point: dict, data=None):
        op = self.smoothing_op if data is None else data["smoothing_op"]
        h = point.get(HYPER_NAME, 0.0)
        total = 0.0
        for var in self.slip_varnames:
            m = fixed_point[var]
            Lm = op @ m
            exponent = jnp.dot(Lm, Lm)
            total = total + (-0.5) * (
                -self.slog_det
                + self.npatches * (LOG_2PI + 2.0 * h)
                + jnp.exp(-2.0 * h) * exponent)
        return total

    def get_synthetics(self, point: dict):
        return {}

    def update_weights(self, point: dict):
        pass
