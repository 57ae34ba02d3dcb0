"""
Boundary-element mode (BEM): triangular-mesh dislocation sources in an
elastic halfspace driven by traction boundary conditions.

Re-design of ``beat/bem/`` (reference builds meshes with pygmsh and
evaluates cutde halfspace kernels).  Here meshes are structured
triangulations (no gmsh dependency) and the dislocation kernels are JAX;
the halfspace triangular-dislocation kernel lands in the next round —
the engine raises a clear error until then.
"""

from beat_tpu.bem.sources import (  # noqa: F401
    CurvedBEMSource,
    DiskBEMSource,
    EllipseBEMSource,
    RectangularBEMSource,
    RingfaultBEMSource,
    TriangleBEMSource,
    check_intersection,
    source_catalog,
)
from beat_tpu.bem.base import BEMEngine, BEMResponse, BoundaryCondition  # noqa: F401
