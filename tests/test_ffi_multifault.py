"""
Multi-fault kinematic FFI (BASELINE configs[4]; reference
``test_ffi_gfstacking_multifault.py`` intent): two subfaults, per-
subfault nucleation, Voronoi-node slip parameterisation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from beat_tpu.ffi import SeismicGFLibrary, discretize_sources, seis_construct_gf_linear
from beat_tpu.heart.gftable import build_homogeneous_table
from beat_tpu.heart.seismic import SeismicDataset, WaveformMapping
from beat_tpu.heart.taper import ArrivalTaper, Filter
from beat_tpu.models.distributer import SeismicDistributerComposite
from beat_tpu.ops.voronoi import nearest_voronoi_node
from beat_tpu.sources import RectangularSource


@pytest.fixture(scope="module")
def two_fault_setup():
    table = build_homogeneous_table(
        distances=np.linspace(10e3, 70e3, 7),
        depths=np.linspace(1e3, 10e3, 5), nt=256, dt=0.25)
    rng = np.random.default_rng(0)
    n_st = 3
    az = np.linspace(0.5, 2 * np.pi, n_st, endpoint=False)
    dist = rng.uniform(30e3, 50e3, n_st)
    datasets = [SeismicDataset(station=f"S{i}", channel="Z",
                               east=dist[i] * np.sin(az[i]),
                               north=dist[i] * np.cos(az[i]),
                               ydata=np.zeros(table.nt))
                for i in range(n_st)]
    wavemap = WaveformMapping(
        name="any_P", datasets=datasets, table=table,
        taper=ArrivalTaper(a=-2.0, b=-1.0, c=15.0, d=17.0),
        filterer=Filter(lower_corner=0.02, upper_corner=0.6, order=3))

    refs = [
        RectangularSource(east_shift=-6e3, depth=2e3, strike=0.0, dip=80.0,
                          rake=0.0, length=6e3, width=4e3),
        RectangularSource(east_shift=6e3, depth=3e3, strike=40.0, dip=60.0,
                          rake=90.0, length=4e3, width=4e3),
    ]
    fault = discretize_sources(refs, patch_length=2e3, patch_width=2e3)
    assert fault.nsubfaults == 2

    libs = {"uparr": seis_construct_gf_linear(
        table, wavemap, fault, component="uparr",
        duration_bounds=(0.5, 1.5), duration_sampling=0.5,
        starttime_bounds=(0.0, 5.0), starttime_sampling=0.5)}
    return table, wavemap, fault, libs


class TestMultiFaultKinematic:
    def test_per_subfault_nucleation(self, two_fault_setup):
        table, wavemap, fault, libs = two_fault_setup
        comp = SeismicDistributerComposite([(wavemap, libs)], fault,
                                           interpolation="nearest_neighbor")
        n = fault.npatches
        point = {
            "uparr": jnp.ones(n),
            "durations": jnp.full(n, 1.0),
            "velocities": jnp.full(n, 3000.0),
            "nucleation_strike": jnp.asarray([1e3, 2e3]),
            "nucleation_dip": jnp.asarray([1e3, 1e3]),
            "time": jnp.asarray([0.0, 2.0]),
        }
        st = np.asarray(comp.point2starttimes(point))
        assert st.shape == (n,)
        slices = fault.ordering.slices
        # subfault 2 starts 2 s later (its `time` component)
        assert st[slices[1]].min() == pytest.approx(2.0, abs=1e-5)
        assert st[slices[0]].min() == pytest.approx(0.0, abs=1e-5)
        synth = np.asarray(comp.synthetics_windows(point, 0))
        assert synth.shape == (wavemap.ntargets, wavemap.nsamples_win)
        assert np.isfinite(synth).all() and np.abs(synth).max() > 0

    def test_voronoi_node_slip_parameterisation(self, two_fault_setup):
        """Trans-dimensional-style parameterisation: slip defined at a few
        Voronoi nodes, patches take their nearest node's value
        (reference ``voronoi_locations`` variables ``config.py:88``)."""
        _, _, fault, _ = two_fault_setup
        sf = fault.get_subfault(0)
        centers = sf.patch_centers_local()
        node_s = jnp.asarray([1e3, 5e3])
        node_d = jnp.asarray([1e3, 3e3])
        node_slips = jnp.asarray([0.5, 2.0])
        idx = nearest_voronoi_node(node_s, node_d,
                                   jnp.asarray(centers[:, 0]),
                                   jnp.asarray(centers[:, 1]))
        patch_slips = node_slips[idx]
        assert patch_slips.shape == (sf.npatches,)
        assert set(np.asarray(patch_slips).tolist()) <= {0.5, 2.0}
        # patches nearest to node 0 get node-0 slip
        d0 = (centers[:, 0] - 1e3) ** 2 + (centers[:, 1] - 1e3) ** 2
        d1 = (centers[:, 0] - 5e3) ** 2 + (centers[:, 1] - 3e3) ** 2
        np.testing.assert_array_equal(np.asarray(idx), (d1 < d0).astype(np.int32))
