"""
HBM-resident static Green's-function tables — the psgrn/pscmp-store
analogue for geodetic forward models in layered (1-D) media.

The reference samples psgrn output onto pyrocko stores and evaluates
statics per draw through pscmp (``beat/heart.py:2426,4158``).  Here the
table stores the surface response to the **six elementary moment
tensors** (receiver at azimuth 0, components Z-up/R/T) on a regular
(distance, source-depth) grid, and the device forward is the same
fixed-shape gather → m6 ray-frame rotation → einsum pipeline as the
dynamic :class:`beat_tpu.heart.gftable.GreensTable` — one program for
every draw, MT statics in a handful of FLOPs per observation point.

Builders:

* :func:`build_static_table` — the native layered builder
  (:mod:`beat_tpu.heart.layered_statics`, the psgrn replacement);
* :func:`build_homogeneous_static_table` — analytic homogeneous
  halfspace via the Okada eigen-crack kernel (hermetic tests; also the
  cross-validation target for the layered solver).

Rectangular (finite) sources in layered media are evaluated as fixed
patch grids of point MTs over the table with the local shear modulus —
the pscmp patch-integration strategy.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from beat_tpu.heart.gftable import rotate_m6_to_ray_frame

logger = logging.getLogger("beat_tpu.heart.statictable")


def bilinear_cell(d_grid, z_grid, distance, depth):
    """Bilinear cell indices + fractions for a uniform (distance, depth)
    grid: returns (d0, z0, fd, fz) with fd shaped (N, 1, 1) and fz a
    traced scalar — shared by the static and epoch-stacked gathers.

    Grids stay NUMPY: the step/extent math needs concrete floats, and
    jax 0.9 stages jnp constants as tracers inside jit.  Size-1 axes
    degrade to nearest-node lookup (step of 1.0 keeps the index math
    finite; the clip pins the fraction to 0).  The cell index clamps to
    the LAST cell so a query at the top grid node is exact (fd/fz reach
    1.0) rather than blending 0.1 % of the neighbour in (same fix as
    gftable.gather_spectra)."""
    d_grid = np.asarray(d_grid)
    z_grid = np.asarray(z_grid)
    d_step = float(d_grid[1] - d_grid[0]) if d_grid.size > 1 else 1.0
    z_step = float(z_grid[1] - z_grid[0]) if z_grid.size > 1 else 1.0
    di = jnp.clip((distance - d_grid[0]) / d_step,
                  0.0, float(d_grid.size - 1))
    zi = jnp.clip((depth - z_grid[0]) / z_step,
                  0.0, float(z_grid.size - 1))
    d0 = jnp.minimum(jnp.floor(di).astype(jnp.int32),
                     max(d_grid.size - 2, 0))
    z0 = jnp.minimum(jnp.floor(zi).astype(jnp.int32),
                     max(z_grid.size - 2, 0))
    fd = (di - d0)[:, None, None]
    fz = jnp.reshape(zi - z0, ())
    return d0, z0, fd, fz


@dataclass
class StaticGFTable:
    """
    values : (6, 3, ndist, ndepth) float32 — surface displacement per
        unit elementary MT (order mnn, mee, mdd, mne, mnd, med),
        receiver at azimuth 0 (due north), components (Z up, R=+N, T=+E).
    distances, depths : grid nodes [m].
    mu_tops, mus, lams : 1-D elastic profile for finite-source patch
        moments (layer tops [m], shear moduli, Lamé λ [Pa]).
    """

    values: jnp.ndarray
    distances: np.ndarray
    depths: np.ndarray
    mu_tops: np.ndarray = None
    mus: np.ndarray = None
    lams: np.ndarray = None
    name: str = "static"

    def __post_init__(self):
        if self.mu_tops is None:
            self.mu_tops = np.array([0.0])
            self.mus = np.array([33e9])
            self.lams = np.array([33e9])
        # same contract as GreensTable: the bilinear gather assumes a
        # uniform increasing step — reject anything else loudly
        for name in ("distances", "depths"):
            g = np.asarray(getattr(self, name), dtype=np.float64)
            if g.size > 1:
                steps = np.diff(g)
                if steps.min() <= 0 or (steps.max() - steps.min()
                                        > 1e-6 * steps.mean()):
                    raise ValueError(
                        f"StaticGFTable {name} must be uniformly spaced "
                        f"and increasing (bilinear index assumes a "
                        f"constant step); got steps "
                        f"[{steps.min():g}, {steps.max():g}]")

    def shear_modulus(self, depth):
        """µ at (traced) depth from the stored profile."""
        tops = jnp.asarray(self.mu_tops)
        mus = jnp.asarray(self.mus)
        idx = jnp.clip(jnp.searchsorted(tops, depth, side="right") - 1,
                       0, tops.size - 1)
        return mus[idx]

    def lame_lambda(self, depth):
        tops = jnp.asarray(self.mu_tops)
        lams = jnp.asarray(self.lams)
        idx = jnp.clip(jnp.searchsorted(tops, depth, side="right") - 1,
                       0, tops.size - 1)
        return lams[idx]

    # -- device forward -------------------------------------------------------

    def gather(self, distance, depth):
        """Bilinear (distance, depth) interpolation: distance (N,),
        depth scalar traced.  Returns (N, 6, 3)."""
        d0, z0, fd, fz = bilinear_cell(self.distances, self.depths,
                                       distance, depth)
        v = self.values  # (6, 3, nd, nz)
        g00 = jnp.moveaxis(v[:, :, d0, z0], 2, 0)
        g10 = jnp.moveaxis(v[:, :, d0 + 1, z0], 2, 0)
        g01 = jnp.moveaxis(v[:, :, d0, z0 + 1], 2, 0)
        g11 = jnp.moveaxis(v[:, :, d0 + 1, z0 + 1], 2, 0)
        return ((1 - fd) * (1 - fz) * g00 + fd * (1 - fz) * g10
                + (1 - fd) * fz * g01 + fd * fz * g11)  # (N, 6, 3)

    def synthesize_enu(self, m6, east_shift, north_shift, depth,
                       obs_east, obs_north):
        """Surface displacement (N, 3 = E, N, Up) of a point MT at the
        (traced) source position — gather + ray-frame rotation."""
        de = obs_east - east_shift
        dn = obs_north - north_shift
        distance = jnp.sqrt(de**2 + dn**2)
        azimuth = jnp.arctan2(de, dn)

        g = self.gather(distance, depth)                       # (N, 6, 3)
        m6_ray = rotate_m6_to_ray_frame(m6[None, :], azimuth)  # (N, 6)
        u_zrt = jnp.einsum("nk,nkc->nc", m6_ray.astype(g.dtype), g)
        uz, ur, ut = u_zrt[:, 0], u_zrt[:, 1], u_zrt[:, 2]
        sa, ca = jnp.sin(azimuth), jnp.cos(azimuth)
        ue = ur * sa + ut * ca
        un = ur * ca - ut * sa
        return jnp.stack([ue, un, uz], axis=-1)

    # -- persistence ----------------------------------------------------------

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, values=np.asarray(self.values, dtype=np.float32),
            distances=self.distances, depths=self.depths,
            mu_tops=self.mu_tops, mus=self.mus, lams=self.lams,
            name=np.array(self.name))

    @classmethod
    def load(cls, path: str) -> "StaticGFTable":
        with np.load(path) as z:
            return cls(values=jnp.asarray(z["values"]),
                       distances=z["distances"], depths=z["depths"],
                       mu_tops=z["mu_tops"], mus=z["mus"], lams=z["lams"],
                       name=str(z["name"]))


def _static_flatten(t: StaticGFTable):
    aux = (tuple(map(float, np.asarray(t.distances).ravel())),
           tuple(map(float, np.asarray(t.depths).ravel())),
           tuple(map(float, np.asarray(t.mu_tops).ravel())),
           tuple(map(float, np.asarray(t.mus).ravel())),
           tuple(map(float, np.asarray(t.lams).ravel())),
           t.name)
    return (t.values,), aux


def _static_unflatten(aux, children) -> StaticGFTable:
    dists, deps, mu_tops, mus, lams, name = aux
    return StaticGFTable(values=children[0],
                         distances=np.asarray(dists), depths=np.asarray(deps),
                         mu_tops=np.asarray(mu_tops), mus=np.asarray(mus),
                         lams=np.asarray(lams), name=name)


jax.tree_util.register_pytree_node(StaticGFTable, _static_flatten,
                                   _static_unflatten)


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------


def build_static_table(model, distances, depths,
                       name: str = None) -> StaticGFTable:
    """Layered static table via the native Hankel-domain solver
    (:func:`beat_tpu.heart.layered_statics.elementary_mt_surface_displacements`)
    — the psgrn-run replacement."""
    from beat_tpu.heart.layered_statics import elementary_mt_surface_displacements
    from beat_tpu.heart.layered_waveforms import nudge_depths_off_interfaces

    distances = np.asarray(distances, dtype=np.float64)
    # the vertical FD dipole (zs ± rel_step·zs) must not straddle a layer
    # interface or it silently mixes moduli across the discontinuity —
    # same guard as the waveform builder; per-model so vary_model
    # ensembles (whose interfaces move) each get a clean grid
    depths = nudge_depths_off_interfaces(model, depths)
    obs = np.stack([np.zeros_like(distances), distances], axis=-1)  # due north
    vals = np.zeros((6, 3, distances.size, depths.size), dtype=np.float64)
    for iz, zs in enumerate(depths):
        u6 = elementary_mt_surface_displacements(model, zs, obs)  # (6, nd, 3=E,N,Up)
        vals[:, 0, :, iz] = u6[..., 2]   # Z (up)
        vals[:, 1, :, iz] = u6[..., 1]   # R = +N at azimuth 0
        vals[:, 2, :, iz] = u6[..., 0]   # T = +E at azimuth 0
    mus = model.rho * model.vs**2
    lams = model.rho * (model.vp**2 - 2 * model.vs**2)
    logger.info("Built layered static GF table: %i dist x %i depth (%s)",
                distances.size, depths.size, getattr(model, "name", "model"))
    return StaticGFTable(values=jnp.asarray(vals, dtype=jnp.float32),
                         distances=distances, depths=depths,
                         mu_tops=np.asarray(model.tops), mus=mus, lams=lams,
                         name=name or f"layered_{getattr(model, 'name', '')}")


def build_homogeneous_static_table(distances, depths, nu=0.25,
                                   shear_modulus=33e9) -> StaticGFTable:
    """Analytic homogeneous-halfspace table via the Okada eigen-crack MT
    kernel (``beat_tpu.heart.okada.mt_surface_displacement``) — hermetic
    stand-in and layered-solver cross-validation target."""
    from beat_tpu.heart.okada import mt_surface_displacement

    distances = np.asarray(distances, dtype=np.float64)
    depths = np.asarray(depths, dtype=np.float64)
    obs = jnp.asarray(np.stack([np.zeros_like(distances), distances], axis=-1))
    vals = np.zeros((6, 3, distances.size, depths.size), dtype=np.float64)
    eye6 = np.eye(6)
    for iz, zs in enumerate(depths):
        for k in range(6):
            u = np.asarray(mt_surface_displacement(
                obs, jnp.asarray(eye6[k]), depth=float(zs), nu=nu,
                shear_modulus=shear_modulus))
            vals[k, 0, :, iz] = u[:, 2]
            vals[k, 1, :, iz] = u[:, 1]
            vals[k, 2, :, iz] = u[:, 0]
    lam = 2.0 * shear_modulus * nu / (1.0 - 2.0 * nu)
    return StaticGFTable(values=jnp.asarray(vals, dtype=jnp.float32),
                         distances=distances, depths=depths,
                         mu_tops=np.array([0.0]),
                         mus=np.array([shear_modulus]), lams=np.array([lam]),
                         name="homogeneous")
