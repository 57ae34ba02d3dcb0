"""
Fault geometry: subfault container, uniform patch discretization and
patch-index bookkeeping.

Re-design of ``beat/ffi/fault.py`` (``FaultGeometry`` :82,
``FaultOrdering`` :1114, ``discretize_sources`` :1312): subfaults are
extended :class:`beat_tpu.sources.RectangularSource` planes split into
regular patch grids; slip parameter vectors concatenate per-subfault
blocks in strike-fastest patch order.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np

from beat_tpu.ffi.laplacian import (
    get_smoothing_operator_correlated,
    get_smoothing_operator_nearest_neighbor,
)
from beat_tpu.ops.eikonal import eikonal_rupture_times
from beat_tpu.sources import RectangularSource, magnitude_to_moment, moment_to_magnitude

logger = logging.getLogger("beat_tpu.ffi.fault")

KM = 1000.0


@dataclass
class SubfaultGrid:
    """One subfault plane with its regular patch grid."""

    plane: RectangularSource
    n_strike: int
    n_dip: int
    patches: list = field(default_factory=list)

    @property
    def npatches(self) -> int:
        return self.n_strike * self.n_dip

    @property
    def patch_length(self) -> float:
        return self.plane.length / self.n_strike

    @property
    def patch_width(self) -> float:
        return self.plane.width / self.n_dip

    def patch_centers_local(self) -> np.ndarray:
        """(npatches, 2) centers in fault-plane coordinates
        (along-strike, down-dip) [m], strike-fastest ordering."""
        s = (np.arange(self.n_strike) + 0.5) * self.patch_length
        d = (np.arange(self.n_dip) + 0.5) * self.patch_width
        ss, dd = np.meshgrid(s, d)
        return np.column_stack([ss.ravel(), dd.ravel()])

    def patch_centers_enz(self) -> np.ndarray:
        """(npatches, 3) centers in (east, north, depth) [m]."""
        return np.stack([np.asarray(p.center()) for p in self.patches])


class FaultOrdering:
    """
    Slip-vector layout over subfaults (reference ``FaultOrdering``
    ``beat/ffi/fault.py:1114``): patch index blocks per subfault and
    flattened slices for each slip variable.
    """

    def __init__(self, npatches_per_subfault):
        self.npatches_list = list(npatches_per_subfault)
        self.slices = []
        start = 0
        for n in self.npatches_list:
            self.slices.append(slice(start, start + n))
            start += n
        self.npatches = start

    def vector2subfault(self, index, vector):
        return vector[..., self.slices[index]]


@dataclass
class FaultGeometry:
    """
    Container of subfault grids with slip-variable bookkeeping
    (reference ``FaultGeometry`` ``beat/ffi/fault.py:82``; the reference
    keys patches by (subfault, datatype, component) because GF stores
    differ per datatype — here patch geometry is shared and GF libraries
    carry datatype specifics).
    """

    subfaults: list  # of SubfaultGrid
    components: list = field(default_factory=lambda: ["uparr"])

    @property
    def nsubfaults(self) -> int:
        return len(self.subfaults)

    @property
    def npatches(self) -> int:
        return sum(sf.npatches for sf in self.subfaults)

    @property
    def ordering(self) -> FaultOrdering:
        return FaultOrdering([sf.npatches for sf in self.subfaults])

    def get_all_patches(self) -> list:
        out = []
        for sf in self.subfaults:
            out.extend(sf.patches)
        return out

    def get_subfault(self, index) -> SubfaultGrid:
        return self.subfaults[index]

    # -- slip/moment --------------------------------------------------------

    def patch_areas(self) -> np.ndarray:
        out = []
        for sf in self.subfaults:
            if hasattr(sf, "patch_length"):       # regular grid
                out.append(np.full(sf.npatches,
                                   sf.patch_length * sf.patch_width))
            else:                                 # IrregularSubfault
                out.append(np.array([p.length * p.width
                                     for p in sf.patches]))
        return np.concatenate(out)

    def moment(self, slips: np.ndarray, shear_modulus: float = 33e9) -> float:
        """Σ µ·A·s (reference moment/magnitude methods :284-475)."""
        return float(np.sum(shear_modulus * self.patch_areas() * np.abs(slips)))

    def magnitude(self, slips: np.ndarray, shear_modulus: float = 33e9) -> float:
        return float(moment_to_magnitude(self.moment(slips, shear_modulus)))

    # -- kinematics ---------------------------------------------------------

    def point2starttimes(self, index: int, velocities, nucleation_strike,
                         nucleation_dip, time=0.0):
        """
        Rupture-onset times of subfault ``index`` patches from per-patch
        rupture velocities [m/s] and the nucleation point [m along
        strike/dip] (reference ``point2starttimes`` ``ffi/fault.py:614``).
        Pure JAX; returns (npatches,) times in strike-fastest order.
        """
        import jax.numpy as jnp

        sf = self.subfaults[index]
        slowness = 1.0 / jnp.asarray(velocities).reshape(sf.n_dip, sf.n_strike)
        # nucleation coordinates -> nearest patch index
        nuc_s = jnp.clip(jnp.round(nucleation_strike / sf.patch_length - 0.5),
                         0, sf.n_strike - 1).astype(int)
        nuc_d = jnp.clip(jnp.round(nucleation_dip / sf.patch_width - 0.5),
                         0, sf.n_dip - 1).astype(int)
        # patch sizes may differ along strike/dip; use geometric mean cell
        # size (grids are near-square in practice); exact anisotropic
        # update is a follow-up.
        patch_size = float(np.sqrt(sf.patch_length * sf.patch_width))
        times = eikonal_rupture_times(slowness, patch_size, nuc_d, nuc_s)
        return times.reshape(-1) + time

    def point2sources(self, point: dict, index: int = 0) -> list:
        """
        Patch sources with slip magnitude/rake from slip-component values
        (reference ``point2sources`` ``ffi/fault.py:648``).
        """
        sf = self.subfaults[index]
        slc = self.ordering.slices[index]
        uparr = np.asarray(point.get("uparr", np.zeros(self.npatches)))[slc]
        uperp = np.asarray(point.get("uperp", np.zeros(self.npatches)))[slc]
        utens = np.asarray(point.get("utens", np.zeros(self.npatches)))[slc]
        slips = np.sqrt(uparr**2 + uperp**2)
        rakes = sf.plane.rake + np.rad2deg(np.arctan2(uperp, np.where(slips > 0, uparr, 1.0)))
        sources = []
        for i, patch in enumerate(sf.patches):
            total = np.sqrt(slips[i] ** 2 + utens[i] ** 2)
            of = utens[i] / total if total > 0 else 0.0
            sources.append(RectangularSource(
                east_shift=patch.east_shift, north_shift=patch.north_shift,
                depth=patch.depth, strike=patch.strike, dip=patch.dip,
                rake=float(rakes[i]), length=patch.length, width=patch.width,
                slip=float(total), opening_fraction=float(of), anchor=patch.anchor))
        return sources

    # -- interseismic coupling ------------------------------------------------

    def euler_pole2slips(self, pole_lat, pole_lon, omega, event_lat=0.0,
                         event_lon=0.0, index: int = 0):
        """
        Long-term back-slip rates [m/yr] on subfault patches from rigid
        plate rotation around an Euler pole (reference ``euler_pole2slips``
        ``ffi/fault.py:1436``): the pole velocity at each patch center is
        projected onto the patch rake direction.
        """
        import jax.numpy as jnp

        from beat_tpu.heart.corrections import velocities_from_pole

        sf = self.subfaults[index]
        centers = sf.patch_centers_enz()
        # local meters -> geographic (small-angle)
        d2r = np.pi / 180.0
        r_earth = 6371e3
        lats = event_lat + centers[:, 1] / (d2r * r_earth)
        lons = event_lon + centers[:, 0] / (d2r * r_earth * np.cos(event_lat * d2r))
        v_neu = velocities_from_pole(jnp.asarray(lats), jnp.asarray(lons),
                                     pole_lat, pole_lon, omega)
        # project horizontal velocity onto the patch slip (rake) direction:
        # Aki & Richards rake — positive sin(rake) moves the hanging wall
        # UP-dip (rake=90 reverse), so the dip-slip horizontal component
        # points OPPOSITE the down-dip vector (matches the Okada U2 and
        # uperp=rake+90 conventions used by the forward kernels)
        st = np.deg2rad(sf.plane.strike)
        ra = np.deg2rad(sf.plane.rake)
        s_vec = np.array([np.sin(st), np.cos(st)])       # E,N strike
        down_dip = np.array([np.cos(st), -np.sin(st)]) * np.cos(np.deg2rad(sf.plane.dip))
        rake_dir = np.cos(ra) * s_vec - np.sin(ra) * down_dip
        rake_dir = rake_dir / max(np.linalg.norm(rake_dir), 1e-12)
        v_en = jnp.stack([v_neu[:, 1], v_neu[:, 0]], axis=-1)
        return v_en @ jnp.asarray(rake_dir)

    @staticmethod
    def backslip2coupling(backslip_rates, interseismic_slips):
        """
        Coupling [%] = interseismic slip-deficit rate / long-term plate
        rate per patch (reference ``backslip2coupling`` ``ffi/fault.py:1500``,
        derived variable ``coupling``).
        """
        import jax.numpy as jnp

        denom = jnp.where(jnp.abs(backslip_rates) < 1e-12, 1e-12,
                          jnp.abs(backslip_rates))
        return jnp.clip(jnp.abs(interseismic_slips) / denom, 0.0, 1.0) * 100.0

    # -- regularisation -----------------------------------------------------

    def get_smoothing_operator(self, correlation_function="nearest_neighbor") -> np.ndarray:
        """Block-diagonal over subfaults (reference dispatch :790)."""
        import scipy.linalg

        blocks = []
        for sf in self.subfaults:
            if correlation_function == "nearest_neighbor" and \
                    not hasattr(sf, "n_strike"):
                # irregular (resolution-discretized) subfaults have no
                # strike/dip grid — use the distance-correlated operator
                # (the reference does the same for varying patch sizes)
                logger.info("nearest_neighbor smoothing needs a regular "
                            "grid; using gaussian-correlated operator for "
                            "the irregular subfault")
                coords = sf.patch_centers_enz() / KM
                blocks.append(get_smoothing_operator_correlated(
                    coords, "gaussian"))
            elif correlation_function == "nearest_neighbor":
                blocks.append(get_smoothing_operator_nearest_neighbor(
                    sf.n_strike, sf.n_dip,
                    sf.patch_length / KM, sf.patch_width / KM))
            else:
                coords = sf.patch_centers_enz() / KM
                blocks.append(get_smoothing_operator_correlated(
                    coords, correlation_function))
        return scipy.linalg.block_diag(*blocks)


_PSCMP_HEADER = """\
# beat_tpu complex fault geometry
# for use with PSCMP from Wang et al. 2008
#-----------------------------------------
#===============================================================================
# RECTANGULAR SUBFAULTS: n, lat0, lon0 then per subfault
#   n  O_lat  O_lon  O_depth[km]  length[km]  width[km]  strike  dip  np_st  np_di  start_time[day]
# followed by one line per patch:
#   pos_s[km]  pos_d[km]  slip_along_strike[m]  slip_along_dip[m]  opening[m]
#===============================================================================
"""

_DEG_PER_M = 1.0 / 111194.9  # spherical-earth metres -> degrees latitude


def write_fault_to_pscmp(filename: str, fault: "FaultGeometry", point: dict,
                         lat0: float = 0.0, lon0: float = 0.0,
                         force: bool = False) -> str:
    """
    Dump the discretized fault + slip solution in PSCMP's rectangular-
    subfault ascii format (reference ``write_fault_to_pscmp``
    ``beat/ffi/fault.py:957``; format of Wang et al. 2008).

    point : result point with ``uparr`` (along-strike slip) and
        optionally ``uperp`` (down-dip) / ``utens`` (opening).
    lat0, lon0 : geographic reference of the local ENU origin.
    """
    import os

    if os.path.exists(filename) and not force:
        raise IOError(f"File {filename} exists — pass force=True to overwrite")

    uparr = np.asarray(point["uparr"], dtype=float)
    uperp = np.asarray(point.get("uperp", np.zeros_like(uparr)), dtype=float)
    utens = np.asarray(point.get("utens", np.zeros_like(uparr)), dtype=float)

    lines = [_PSCMP_HEADER, f"{fault.nsubfaults}  {lat0:.6f}  {lon0:.6f}\n"]
    for i in range(fault.nsubfaults):
        sf = fault.get_subfault(i)
        plane = sf.plane
        # top-center anchor -> upper-left (strike-start) corner
        sv = plane.strikevector
        ul_e = plane.east_shift - sv[0] * plane.length / 2.0
        ul_n = plane.north_shift - sv[1] * plane.length / 2.0
        ul_lat = lat0 + ul_n * _DEG_PER_M
        ul_lon = lon0 + ul_e * _DEG_PER_M / max(
            np.cos(np.deg2rad(lat0)), 1e-12)
        lines.append(
            f"{i + 1}  {ul_lat:.6f}  {ul_lon:.6f}  {plane.depth / 1e3:.4f}  "
            f"{plane.length / 1e3:.4f}  {plane.width / 1e3:.4f}  "
            f"{plane.strike:.2f}  {plane.dip:.2f}  "
            f"{sf.n_strike}  {sf.n_dip}  0.0\n")
        slc = fault.ordering.slices[i]
        centers = sf.patch_centers_local() / 1e3          # km
        for (pos_s, pos_d), us, ud, op in zip(centers, uparr[slc],
                                              uperp[slc], utens[slc]):
            lines.append(f"  {pos_s:.4f}  {pos_d:.4f}  "
                         f"{us:.5f}  {ud:.5f}  {op:.5f}\n")

    with open(filename, "w") as f:
        f.writelines(lines)
    logger.info("Wrote PSCMP fault geometry to %s", filename)
    return filename


def extend_plane(source: RectangularSource, extension_width: float = 0.1,
                 extension_length: float = 0.1) -> RectangularSource:
    """
    Extend a reference source's plane symmetrically by the given fractions,
    clipped at the surface (reference ``initialise_fault_geometry``
    ``ffi/fault.py:1176`` extension semantics).
    """
    dl = source.length * extension_length
    dw = source.width * extension_width
    new_length = source.length + 2 * dl
    new_width = source.width + 2 * dw
    di = np.deg2rad(source.dip)
    st = np.deg2rad(source.strike)
    # shift top edge up-dip by dw (clip at surface)
    up_dip = min(dw, source.depth / max(np.sin(di), 1e-6))
    t_e, t_n = np.cos(st), -np.sin(st)
    return RectangularSource(
        east_shift=source.east_shift - up_dip * np.cos(di) * t_e,
        north_shift=source.north_shift - up_dip * np.cos(di) * t_n,
        depth=source.depth - up_dip * np.sin(di),
        time=source.time,
        strike=source.strike, dip=source.dip, rake=source.rake,
        length=new_length, width=up_dip + source.width + dw,
        slip=source.slip, anchor="top", velocity=source.velocity)


def discretize_sources(reference_sources, patch_length: float, patch_width: float,
                       extension_width: float = 0.0, extension_length: float = 0.0,
                       components=("uparr",)) -> FaultGeometry:
    """
    Uniform discretization of reference sources into a FaultGeometry
    (reference ``discretize_sources`` ``ffi/fault.py:1312``).
    Patch sizes in [m]; planes are snapped to an integer patch count.
    """
    subfaults = []
    for src in reference_sources:
        plane = extend_plane(src, extension_width, extension_length) \
            if (extension_width or extension_length) else src
        n_strike = max(1, int(round(plane.length / patch_length)))
        n_dip = max(1, int(round(plane.width / patch_width)))
        sf = SubfaultGrid(plane=plane, n_strike=n_strike, n_dip=n_dip)
        sf.patches = plane.patches(n_strike, n_dip)
        subfaults.append(sf)
        logger.info("Subfault: %i x %i patches (%.1f x %.1f km)",
                    n_strike, n_dip, sf.patch_length / KM, sf.patch_width / KM)
    return FaultGeometry(subfaults=subfaults, components=list(components))
