"""
Composite interface (reference ``beat/models/base.py:71`` ``Composite``).

A composite owns one datatype's datasets, noise model and forward model,
and contributes:

* ``loglike(point)`` — pure JAX, the analogue of ``get_formula``;
* ``hyper_loglike(point)`` — hyperparameter-only likelihood on fixed
  residuals (``get_hyper_formula``);
* hyperparameter names/priors;
* ``update_weights(point)`` — host-side covariance re-estimation between
  sampler stages (``apply``/``update_weights``);
* ``get_synthetics(point)`` — numpy-friendly forward for checks/plots.
"""

from __future__ import annotations

import logging
from typing import Iterable

import numpy as np

from beat_tpu.parameter import Parameter

logger = logging.getLogger("beat_tpu.models")


def dataset_hyper_terms(residuals, weights, slog_pdets, nsamples, names):
    """Stack per-dataset fixed-residual terms for the precomputed
    hyper-only posterior (``distributions.hyper_normal``): returns
    (``||W r||²`` (D,), slog_pdets (D,), nsamples (D,), hyper names)."""
    import jax.numpy as jnp

    wrw = []
    for r, w in zip(residuals, weights):
        tmp = w @ r
        wrw.append(jnp.dot(tmp, tmp))
    return (jnp.stack(wrw),
            jnp.stack([jnp.asarray(p) for p in slog_pdets]),
            jnp.asarray(nsamples, dtype=jnp.float32), list(names))


def wavemap_hyper_terms(devs, synths, wavemaps, hp_specific):
    """Per-wavemap batched variant of :func:`dataset_hyper_terms`:
    each dev carries (D, M) data/(D, M, M) weights; synths are the
    fit-space synthetics at the fixed point."""
    import jax.numpy as jnp

    wrw, pds, ns, names = [], [], [], []
    for dev, synth, wmap in zip(devs, synths, wavemaps):
        res = dev["data"] - synth
        tmp = jnp.einsum("dij,dj->di", dev["weights"], res)
        wrw.append(jnp.sum(tmp * tmp, axis=-1))
        pds.append(dev["slog_pdets"])
        ns.append(dev["nsamples"])
        if hp_specific:
            names.extend(f"{wmap.hypername}_{i}"
                         for i in range(wmap.ntargets))
        else:
            names.extend([wmap.hypername] * wmap.ntargets)
    return (jnp.concatenate(wrw), jnp.concatenate(pds),
            jnp.concatenate(ns), names)


class Composite:
    name = "composite"

    def device_data(self):
        """
        Pytree of the device arrays the likelihood consumes (data vectors,
        weight matrices, GF tables/libraries).  ``Problem.make_logp_fn``
        threads this through ``jit`` as an *argument* — never a closure
        constant — so production-scale GF arrays can be donated, sharded
        over the mesh, and never embedded in the compiled program
        (the reference shares them via RawArray memshare,
        ``beat/parallel.py:305-358``; here XLA owns placement).
        """
        return getattr(self, "_device", None) or {}

    def loglike(self, point: dict, data=None):
        raise NotImplementedError

    def hyper_loglike(self, point: dict, fixed_point: dict, data=None):
        raise NotImplementedError

    # -- hyperparameters ----------------------------------------------------

    def get_hypernames(self) -> list[str]:
        return []

    def get_hyper_parameters(self) -> list[Parameter]:
        return [Parameter.from_defaults(name) for name in self.get_hypernames()]

    # -- hierarchicals (corrections, station time shifts, ...) ---------------

    def get_hierarchical_names(self) -> list[str]:
        return []

    def get_hierarchical_parameters(self) -> list[Parameter]:
        out = []
        for name in self.get_hierarchical_names():
            p = Parameter.from_defaults(_strip_prefix(name))
            p.name = name  # registry bounds, user-facing hierarchical name
            out.append(p)
        return out

    # -- between-stage updates ----------------------------------------------

    def update_weights(self, point: dict) -> None:
        """Re-estimate data covariances at ``point`` (no-op by default)."""

    def get_synthetics(self, point: dict) -> dict:
        return {}

    def get_standardized_residuals(self, point: dict) -> dict:
        return {}

    def get_variance_reductions(self, point: dict) -> dict:
        return {}


def _strip_prefix(name: str) -> str:
    """'<dataset>_azimuth_ramp' -> 'ramp'; '<n>_pole_lat' -> 'lat' etc."""
    for suffix, key in (
        ("azimuth_ramp", "ramp"), ("range_ramp", "ramp"), ("offset", "offset"),
        ("pole_lat", "lat"), ("pole_lon", "lon"), ("omega", "omega"),
        ("exx", "exx"), ("eyy", "eyy"), ("exy", "exy"), ("rotation", "rotation"),
        ("time_shift", "time_shift"),
    ):
        if name.endswith(suffix):
            return key
    return name
