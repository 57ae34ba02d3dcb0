"""Native C++ host kernels vs numpy references (the reference repo's
``test_fastsweep.py``/``test_voronoi.py`` C↔numpy equivalence recipe)."""

import numpy as np
import pytest

from beat_tpu import native
from beat_tpu.ops.eikonal import eikonal_rupture_times_numpy
from beat_tpu.ops.voronoi import nearest_voronoi_node_numpy

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_fast_sweep_matches_numpy():
    rng = np.random.default_rng(0)
    slowness = 1.0 / rng.uniform(1.0, 5.0, size=(7, 9))
    got = native.fast_sweep_host(slowness, 2.0, 3, 4)
    want = eikonal_rupture_times_numpy(slowness, 2.0, 3, 4)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-10)


def test_fast_sweep_uniform():
    slowness = np.full((5, 5), 0.5)
    t = native.fast_sweep_host(slowness, 1.0, 2, 2)
    assert t[2, 2] == 0.0
    np.testing.assert_allclose(t[2, 3], 0.5, atol=1e-12)


def test_voronoi_matches_numpy():
    rng = np.random.default_rng(1)
    ns, nd = rng.uniform(0, 30, 15), rng.uniform(0, 15, 15)
    ps, pd = rng.uniform(0, 30, 200), rng.uniform(0, 15, 200)
    got = native.voronoi_nearest_host(ns, nd, ps, pd)
    want = nearest_voronoi_node_numpy(ns, nd, ps, pd)
    np.testing.assert_array_equal(got, want)
