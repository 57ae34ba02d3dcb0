"""
Finite-fault inversion (FFI) machinery: fault discretization, linear
Green's-function libraries and slip-stacking kernels.
"""

from beat_tpu.ffi.fault import (FaultGeometry, FaultOrdering,  # noqa: F401
                                discretize_sources, write_fault_to_pscmp)
from beat_tpu.ffi.transd import (TransDParams, masked_voronoi_slips,  # noqa: F401
                                 transd_sample)
from beat_tpu.ffi.gflibrary import (  # noqa: F401
    GeodeticGFLibrary,
    SeismicGFLibrary,
    geo_construct_gf_linear,
    seis_construct_gf_linear,
)
from beat_tpu.ffi.laplacian import (  # noqa: F401
    get_smoothing_operator_correlated,
    get_smoothing_operator_nearest_neighbor,
)
