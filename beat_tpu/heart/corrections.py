"""
Geodetic data corrections: InSAR orbital ramps, Euler-pole plate
rotation, and regional strain-rate fields — pure JAX algebra.

Re-design of ``beat/models/corrections.py`` + the formula kernels in
``beat/heart.py`` (``get_ramp_displacement`` :4494,
``velocities_from_pole`` :4326, ``velocities_from_strain_rate_tensor``
:4441).  Each correction exposes hierarchical parameter names matching
the reference conventions so configs translate 1:1.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

D2R = math.pi / 180.0
EARTH_RADIUS = 6371008.8  # [m]
NANOSTRAIN = 1e-9


def get_ramp_displacement(locx, locy, azimuth_ramp, range_ramp, offset):
    """Planar orbital ramp (reference ``heart.get_ramp_displacement``)."""
    return locy * azimuth_ramp + locx * range_ramp + offset


def latlon_to_xyz(lats, lons):
    """Unit sphere Cartesian coordinates from geographic [deg]."""
    rlat = lats * D2R
    rlon = lons * D2R
    return jnp.stack([jnp.cos(rlat) * jnp.cos(rlon),
                      jnp.cos(rlat) * jnp.sin(rlon),
                      jnp.sin(rlat)], axis=-1)


def velocities_from_pole(lats, lons, pole_lat, pole_lon, omega):
    """
    Horizontal plate velocities [m/yr] at stations for rotation ``omega``
    [deg/Myr] around an Euler pole (spherical earth;
    reference ``heart.velocities_from_pole`` :4326).

    Returns (N, 3) velocities in (north, east, up) — the reference's NEU
    order, converted by callers as needed.
    """
    lats = jnp.asarray(lats)
    lons = jnp.asarray(lons)
    xyz_points = latlon_to_xyz(lats, lons)
    xyz_pole = latlon_to_xyz(jnp.asarray(pole_lat), jnp.asarray(pole_lon))

    omega_rad_yr = omega * 1e-6 * D2R * EARTH_RADIUS
    v_cart = omega_rad_yr * jnp.cross(jnp.broadcast_to(xyz_pole, xyz_points.shape),
                                      xyz_points)

    rlat = lats * D2R
    rlon = lons * D2R
    # rows: local north, east, down unit vectors in ECEF
    north = jnp.stack([-jnp.sin(rlat) * jnp.cos(rlon),
                       -jnp.sin(rlat) * jnp.sin(rlon),
                       jnp.cos(rlat)], axis=-1)
    east = jnp.stack([-jnp.sin(rlon), jnp.cos(rlon), jnp.zeros_like(rlon)], axis=-1)
    down = jnp.stack([-jnp.cos(rlat) * jnp.cos(rlon),
                      -jnp.cos(rlat) * jnp.sin(rlon),
                      -jnp.sin(rlat)], axis=-1)
    v_n = jnp.sum(north * v_cart, axis=-1)
    v_e = jnp.sum(east * v_cart, axis=-1)
    v_d = jnp.sum(down * v_cart, axis=-1)
    return jnp.stack([v_n, v_e, -v_d], axis=-1)


def velocities_from_strain_rate_tensor(norths, easts, exx, eyy, exy, rotation):
    """
    Velocities [m] from a 2-d strain-rate tensor in nanostrain
    (reference ``heart.velocities_from_strain_rate_tensor`` :4441).
    ``norths/easts`` are local coordinates relative to the network
    centroid.  Returns (N, 3) in (north, east, up).
    """
    d00 = exx * NANOSTRAIN
    d01 = 0.5 * (exy + rotation) * NANOSTRAIN
    d10 = 0.5 * (exy - rotation) * NANOSTRAIN
    d11 = eyy * NANOSTRAIN
    v_x = d00 * norths + d01 * easts
    v_y = d10 * norths + d11 * easts
    return jnp.stack([v_x, v_y, jnp.zeros_like(v_x)], axis=-1)


# ---------------------------------------------------------------------------
# Correction objects: hierarchical parameter plumbing
# ---------------------------------------------------------------------------


@dataclass
class RampCorrection:
    """
    InSAR orbital ramp: per-dataset hierarchicals
    ``<dataset>_azimuth_ramp``, ``<dataset>_range_ramp``,
    ``<dataset>_offset`` (reference ``models/corrections.py:46`` +
    ``RampConfig`` suffixes ``config.py:872-892``).
    """

    dataset_name: str

    @property
    def parameter_names(self):
        return [f"{self.dataset_name}_azimuth_ramp",
                f"{self.dataset_name}_range_ramp",
                f"{self.dataset_name}_offset"]

    def displacement(self, hierarchicals: dict, coords):
        locx = coords[:, 0]
        locy = coords[:, 1]
        az, rg, off = (hierarchicals[n] for n in self.parameter_names)
        return get_ramp_displacement(locx, locy, az, rg, off)


@dataclass
class EulerPoleCorrection:
    """
    GNSS plate-rotation correction: hierarchicals ``<number>_pole_lat``,
    ``<number>_pole_lon``, ``<number>_omega``
    (reference ``models/corrections.py:90``).  Predicts LOS-projected
    station velocities; ``time_span`` [yr] scales velocity → displacement.
    """

    number: int
    lats: np.ndarray
    lons: np.ndarray
    time_span: float = 1.0
    #: dataset this instance applies to (one instance per GNSS dataset;
    #: instances of the same ``number`` share their hierarchicals)
    dataset_name: str = None
    #: per-observation station mask from the config's
    #: station_whitelist/station_blacklist (reference
    #: ``models/corrections.py:111-140`` ``get_station_indexes``)
    mask: np.ndarray = None

    @property
    def parameter_names(self):
        return [f"{self.number}_pole_lat", f"{self.number}_pole_lon",
                f"{self.number}_omega"]

    def displacement(self, hierarchicals: dict, los_enu):
        plat, plon, omega = (hierarchicals[n] for n in self.parameter_names)
        v_neu = velocities_from_pole(self.lats, self.lons, plat, plon, omega)
        v_enu = jnp.stack([v_neu[:, 1], v_neu[:, 0], v_neu[:, 2]], axis=-1)
        disp = jnp.sum(v_enu * los_enu, axis=-1) * self.time_span
        if self.mask is not None:
            disp = disp * jnp.asarray(self.mask, dtype=disp.dtype)
        return disp


@dataclass
class StrainRateCorrection:
    """
    Regional strain-rate correction: hierarchicals ``<number>_exx`` etc.
    (reference ``models/corrections.py:143``).
    """

    number: int
    norths: np.ndarray
    easts: np.ndarray
    dataset_name: str = None
    mask: np.ndarray = None

    @property
    def parameter_names(self):
        return [f"{self.number}_exx", f"{self.number}_eyy",
                f"{self.number}_exy", f"{self.number}_rotation"]

    def displacement(self, hierarchicals: dict, los_enu):
        exx, eyy, exy, rot = (hierarchicals[n] for n in self.parameter_names)
        v_neu = velocities_from_strain_rate_tensor(
            jnp.asarray(self.norths), jnp.asarray(self.easts), exx, eyy, exy, rot)
        v_enu = jnp.stack([v_neu[:, 1], v_neu[:, 0], v_neu[:, 2]], axis=-1)
        disp = jnp.sum(v_enu * los_enu, axis=-1)
        if self.mask is not None:
            disp = disp * jnp.asarray(self.mask, dtype=disp.dtype)
        return disp


def station_mask(stations, whitelist=(), blacklist=()) -> np.ndarray:
    """Boolean per-observation mask from station white/blacklists
    (reference ``EulerPoleConfig.station_blacklist/whitelist``
    ``config.py:828-834``): a non-empty whitelist keeps only its
    members; blacklisted stations are always excluded."""
    stations = np.asarray(stations)
    mask = np.ones(stations.shape, dtype=bool)
    if whitelist:
        mask &= np.isin(stations, list(whitelist))
    if blacklist:
        mask &= ~np.isin(stations, list(blacklist))
    return mask
