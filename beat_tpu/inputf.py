"""
Data importers.

Re-design of ``beat/inputf.py``: native portable formats (CSV/npz) are
first-class; pyrocko/kite/obspy-backed importers are import-gated so the
framework stays hermetic without them (those packages read the same
foreign formats the reference supports: kite scenes, GLOBK GNSS, mseed).
"""

from __future__ import annotations

import logging
import os

import numpy as np

from beat_tpu.covariance import Covariance
from beat_tpu.heart.geodesy import GeodeticDataset, diff_ifg, gnss_compound

logger = logging.getLogger("beat_tpu.inputf")


# ---------------------------------------------------------------------------
# Geodetic
# ---------------------------------------------------------------------------


def load_sar_csv(path: str, name: str | None = None, incidence: float = 39.0,
                 heading: float = -168.0) -> GeodeticDataset:
    """
    InSAR displacement from CSV with columns east,north,displacement
    [m] (+ optional incidence,heading columns per row) — the native
    analogue of ``load_ascii_data`` (``beat/inputf.py:92``).
    """
    arr = np.genfromtxt(path, delimiter=",", names=True)
    coords = np.column_stack([arr["east"], arr["north"]])
    inc = arr["incidence"] if "incidence" in (arr.dtype.names or ()) else incidence
    head = arr["heading"] if "heading" in (arr.dtype.names or ()) else heading
    return diff_ifg(name or os.path.basename(path), coords, arr["displacement"],
                    incidence=inc, heading=head)


def load_kite_scene(path: str) -> GeodeticDataset:
    """Kite scene importer (reference ``load_kite_scenes``
    ``beat/inputf.py:110``; requires the ``kite`` package)."""
    try:
        from kite import Scene
    except ImportError as e:
        raise ImportError(
            "kite is required for kite scene import; use load_sar_csv or the "
            "npz dataset format instead") from e
    sc = Scene.load(path)
    qt = sc.quadtree
    coords = np.column_stack([qt.leaf_focal_points[:, 0],
                              qt.leaf_focal_points[:, 1]])
    ds = GeodeticDataset(
        name=os.path.basename(path), typ="SAR", coords=coords,
        displacement=qt.leaf_means,
        los_vector=np.column_stack([
            -np.sin(qt.leaf_thetas) * np.cos(qt.leaf_phis),
            np.sin(qt.leaf_thetas) * np.sin(qt.leaf_phis),
            np.cos(qt.leaf_thetas)]))
    return ds


def load_gnss_csv(path: str, components=("east", "north", "up")) -> list:
    """
    GNSS displacements from CSV with columns
    station,lat,lon,east,north,up,sigma_east,sigma_north,sigma_up [m]
    — native analogue of ``load_ascii_gnss_globk``
    (``beat/inputf.py:135``).  Returns one compound dataset per component.
    """
    arr = np.genfromtxt(path, delimiter=",", names=True, dtype=None, encoding=None)
    arr = np.atleast_1d(arr)
    out = []
    lats = arr["lat"].astype(float)
    lons = arr["lon"].astype(float)
    coords = np.zeros((lats.size, 2))  # filled via update_local_coords later
    for comp in components:
        disp = arr[comp].astype(float)
        sig_name = f"sigma_{comp}"
        ds = gnss_compound(f"gnss_{comp}", coords, disp, comp)
        ds.lats, ds.lons = lats, lons
        if sig_name in (arr.dtype.names or ()):
            sig = arr[sig_name].astype(float)
            ds.covariance = Covariance(data=np.diag(np.maximum(sig, 1e-6) ** 2))
        out.append(ds)
    return out


# ---------------------------------------------------------------------------
# Seismic
# ---------------------------------------------------------------------------


def load_obspy_traces(datadir: str, stations_path: str | None = None):
    """Waveform import via obspy (reference ``load_obspy_data``
    ``beat/inputf.py:278``; gated)."""
    try:
        import obspy  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "obspy is required for mseed import; use save/load of the native "
            "seismic npz format instead") from e
    raise NotImplementedError(
        "obspy-backed waveform import lands with the data-download round")


def save_seismic_datasets(datasets, project_dir: str, datadir: str = "./") -> str:
    """Native seismic dataset persistence: raw traces on the table grid."""
    arrays = {}
    for ds in datasets:
        key = f"{ds.station}.{ds.channel}"
        arrays[f"{key}:ydata"] = ds.ydata
        arrays[f"{key}:coords"] = np.array([ds.east, ds.north])
    outdir = os.path.join(project_dir, datadir)
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "seismic_data.npz")
    np.savez_compressed(path, **arrays)
    return path


def load_seismic_datasets(project_dir: str, datadir: str = "./") -> list:
    from beat_tpu.heart.seismic import SeismicDataset

    path = os.path.join(project_dir, datadir, "seismic_data.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(f"No seismic data at {path}")
    out = []
    with np.load(path) as z:
        keys = sorted({k.split(":")[0] for k in z.files})
        for key in keys:
            station, channel = key.rsplit(".", 1)
            coords = z[f"{key}:coords"]
            out.append(SeismicDataset(
                station=station, channel=channel,
                east=float(coords[0]), north=float(coords[1]),
                ydata=z[f"{key}:ydata"]))
    return out
