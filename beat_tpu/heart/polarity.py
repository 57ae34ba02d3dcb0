"""
First-motion polarity forward modeling.

Re-design of the polarity machinery in ``beat/heart.py``
(``PolarityTarget`` :767, ``pol_synthetics`` :4053, radiation-weight
algebra :3891-4051) without pyrocko ray tracing: takeoff vectors are
computed for straight rays in a homogeneous medium (or supplied from an
external travel-time table), and P/SH/SV amplitudes follow the standard
far-field radiation patterns γᵀMγ etc. — pure JAX, linear in m6.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass
class PolarityTarget:
    """One station observing a first-motion polarity
    (reference ``PolarityTarget`` ``heart.py:767``)."""

    station: str
    azimuth_rad: float            # source->station azimuth [rad]
    takeoff_rad: float            # angle from downward vertical [rad]
    polarity: int                 # observed first motion: +1 / -1


def takeoff_vector(azimuth_rad, takeoff_rad):
    """Unit ray vector at the source in NED.  takeoff measured from the
    downward vertical (0 = straight down, π = straight up)."""
    st = jnp.sin(takeoff_rad)
    return jnp.stack([st * jnp.cos(azimuth_rad),
                      st * jnp.sin(azimuth_rad),
                      jnp.cos(takeoff_rad)], axis=-1)


def straight_ray_takeoff(distance, depth):
    """Takeoff angle for a direct up-going ray in a homogeneous medium."""
    return jnp.pi - jnp.arctan2(distance, depth)


def radiation_weights_p(gamma):
    """
    P radiation as a linear form on m6: amplitude = w·m6 with
    w = (γn², γe², γd², 2γnγe, 2γnγd, 2γeγd)
    (the m6-linearised γᵀMγ; reference ``calculate_radiation_weights``
    ``heart.py:3891``).
    gamma : (..., 3) unit ray vectors (NED).  Returns (..., 6).
    """
    gn, ge, gd = gamma[..., 0], gamma[..., 1], gamma[..., 2]
    return jnp.stack([gn * gn, ge * ge, gd * gd,
                      2 * gn * ge, 2 * gn * gd, 2 * ge * gd], axis=-1)


def radiation_weights_sh(gamma, azimuth_rad):
    """SH radiation linear form: (Mγ)·φ̂ with φ̂ the horizontal transverse
    unit vector."""
    phi = jnp.stack([-jnp.sin(azimuth_rad), jnp.cos(azimuth_rad),
                     jnp.zeros_like(azimuth_rad)], axis=-1)
    return _bilinear_weights(gamma, phi)


def radiation_weights_sv(gamma, azimuth_rad, takeoff_rad):
    """SV radiation linear form: (Mγ)·θ̂."""
    ct, st = jnp.cos(takeoff_rad), jnp.sin(takeoff_rad)
    theta = jnp.stack([ct * jnp.cos(azimuth_rad),
                       ct * jnp.sin(azimuth_rad),
                       -st], axis=-1)
    return _bilinear_weights(gamma, theta)


def _bilinear_weights(a, b):
    """Linear form of aᵀMb + bᵀMa (symmetrised) on m6."""
    an, ae, ad = a[..., 0], a[..., 1], a[..., 2]
    bn, be, bd = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack([an * bn, ae * be, ad * bd,
                      an * be + ae * bn,
                      an * bd + ad * bn,
                      ae * bd + ad * be], axis=-1)


def pol_synthetics(m6, weights):
    """Radiation amplitudes for precomputed weights (ntargets, 6)
    (reference ``pol_synthetics`` ``heart.py:4053``)."""
    return weights @ m6
