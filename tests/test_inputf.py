"""Importer tests (native CSV/npz formats; reference ``test`` coverage of
``inputf`` is indirect — here the LOS convention and round trips are
checked explicitly)."""

import numpy as np
import pytest

from beat_tpu.inputf import (
    load_gnss_csv,
    load_sar_csv,
    load_seismic_datasets,
    save_seismic_datasets,
)


def test_sar_csv_los_convention(tmp_path):
    p = tmp_path / "scene.csv"
    p.write_text("east,north,displacement\n0,0,0.01\n1000,0,0.02\n")
    ds = load_sar_csv(str(p), incidence=30.0, heading=190.0)
    assert ds.typ == "SAR" and ds.samples == 2
    # LOS: E=-sin(inc)cos(head), N=sin(inc)sin(head), U=cos(inc)
    inc, head = np.deg2rad(30.0), np.deg2rad(190.0)
    np.testing.assert_allclose(ds.los_vector[0],
                               [-np.sin(inc) * np.cos(head),
                                np.sin(inc) * np.sin(head),
                                np.cos(inc)], atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(ds.los_vector, axis=1), 1.0)


def test_gnss_csv_components(tmp_path):
    p = tmp_path / "gnss.csv"
    p.write_text(
        "station,lat,lon,east,north,up,sigma_east,sigma_north,sigma_up\n"
        "AAAA,10.0,20.0,0.01,-0.02,0.005,0.001,0.002,0.003\n"
        "BBBB,10.1,20.1,0.03,0.01,-0.001,0.001,0.002,0.003\n")
    datasets = load_gnss_csv(str(p))
    assert [d.name for d in datasets] == ["gnss_east", "gnss_north", "gnss_up"]
    east = datasets[0]
    np.testing.assert_allclose(east.displacement, [0.01, 0.03])
    np.testing.assert_allclose(east.los_vector[0], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.diag(east.covariance.data), [1e-6, 1e-6])
    # local coordinates derivable from lat/lon
    east.update_local_coords(10.0, 20.0)
    assert east.coords[1, 1] > 1e4  # ~0.1 deg north ≈ 11 km


def test_seismic_round_trip(tmp_path):
    from beat_tpu.heart.seismic import SeismicDataset

    rng = np.random.default_rng(0)
    ds = [SeismicDataset(station="STA", channel="Z", east=1e3, north=-2e3,
                         ydata=rng.normal(size=64)),
          SeismicDataset(station="STB", channel="T", east=0.0, north=3e3,
                         ydata=rng.normal(size=64))]
    save_seismic_datasets(ds, str(tmp_path))
    back = load_seismic_datasets(str(tmp_path))
    assert {(d.station, d.channel) for d in back} == {("STA", "Z"), ("STB", "T")}
    a = next(d for d in back if d.station == "STA")
    np.testing.assert_allclose(a.ydata, ds[0].ydata)
    assert a.east == 1e3 and a.north == -2e3
