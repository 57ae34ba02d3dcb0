"""
BEM engine: traction-driven slip on triangular meshes.

Re-design of ``beat/bem/base.py`` (``BEMEngine`` :114): sources are
discretized to triangle meshes, the traction interaction matrix couples
unit slips on source elements to tractions at receiver elements, the
boundary-condition LSQ solve yields element slips, and the displacement
matrix maps them to surface observation points.

The triangular-dislocation kernels (displacement + strain;
cutde/Nikkhoo-Walter in the reference, ``bem/base.py:14-19``) live in
``beat_tpu.bem.tde``: Kelvin (fullspace) and Mindlin (halfspace, the
default — matching the reference's halfspace-only behaviour) point-force
solutions differentiated by autodiff.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np

from beat_tpu.bem.sources import TriangleMesh, check_intersection

logger = logging.getLogger("beat_tpu.bem.base")

slip_comp_to_idx = {"strike": 0, "dip": 1, "normal": 2}


def lstsq_robust(G: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Least-squares solve with a ``gelss`` fallback — LAPACK's default
    ``gelsd`` SVD occasionally fails to converge on valid matrices."""
    try:
        return np.linalg.lstsq(G, b, rcond=None)[0]
    except np.linalg.LinAlgError:
        import scipy.linalg

        return scipy.linalg.lstsq(G, b, lapack_driver="gelss")[0]


@dataclass
class BoundaryCondition:
    """Traction boundary condition linking source/receiver meshes
    (reference ``BoundaryCondition`` ``config.py:1155-1199``)."""

    slip_component: str             # 'strike' | 'dip' | 'normal'
    source_idxs: list = field(default_factory=lambda: [0])
    receiver_idxs: list = field(default_factory=lambda: [0])
    traction: float = 0.0           # [MPa] target traction


@dataclass
class BEMResponse:
    """Result container (reference ``BEMResponse`` ``bem/base.py:26``)."""

    sources: list
    meshes: list
    displacements: np.ndarray | None   # (nobs, 3) or None if invalid
    slips: np.ndarray | None           # per-element slip components
    is_valid: bool = True
    #: per-slip-column element areas in interaction-matrix column order
    #: (a BC may target a subset of meshes, so columns need not span them)
    col_areas: np.ndarray | None = None

    INVALID = -99.0

    def source_slips(self):
        return self.slips

    def derived_magnitude(self, shear_modulus: float = 33e9):
        if self.slips is None:
            return None
        from beat_tpu.sources import moment_to_magnitude

        if self.col_areas is not None:
            areas = self.col_areas
        else:  # legacy: columns spanned every mesh once
            areas = np.concatenate([m.areas for m in self.meshes])
        m0 = float(np.sum(shear_modulus * areas * np.abs(self.slips)))
        return float(moment_to_magnitude(max(m0, 1.0)))


class BEMEngine:
    """
    reference ``BEMEngine`` (``bem/base.py:114``): ``process(sources,
    coords)`` → discretize, assemble interaction matrix, LSQ-solve slips
    from traction BCs, predict surface displacements.
    """

    def __init__(self, boundary_conditions, mesh_size: float = 500.0,
                 poissons_ratio: float = 0.25, shear_modulus: float = 33e9,
                 check_mesh_intersection: bool = True, medium: str = "halfspace",
                 quadrature_level: int = 2, near_quadrature_level: int = 6):
        self.boundary_conditions = list(boundary_conditions)
        self.mesh_size = mesh_size
        self.nu = poissons_ratio
        self.mu = shear_modulus
        self.check_mesh_intersection = check_mesh_intersection
        #: far/near triangle-subdivision levels of the traction assembly:
        #: (2, 6) gives ~3% penny-crack accuracy; (1, 5) is ~4x faster for
        #: sampling over geometries at reduced accuracy.
        self.quadrature_level = quadrature_level
        self.near_quadrature_level = near_quadrature_level
        if medium not in ("fullspace", "halfspace"):
            raise ValueError(
                f"Unknown medium {medium!r}: 'halfspace' (Mindlin kernels, "
                "free surface at z=0 — the reference's cutde HS behaviour, "
                "beat/bem/base.py:14-19) or 'fullspace' (Kelvin)")
        self.medium = medium

    def discretize(self, sources) -> list:
        return [src.discretize(self.mesh_size) for src in sources]

    def process(self, sources, coords, tractions=None) -> BEMResponse:
        """``tractions``: optional per-BC driving tractions [MPa] overriding
        the BCs' fixed values — the hook through which sampled
        ``<component>_traction`` parameters enter (reference samples
        tractions as free variables, ``defaults.py`` traction entries)."""
        meshes = self.discretize(sources)
        if self.check_mesh_intersection and check_intersection(meshes):
            # reference returns a -99-filled invalid response (bem/base.py:145)
            return BEMResponse(sources=sources, meshes=meshes,
                               displacements=None, slips=None, is_valid=False)
        G_tractions = self.get_interaction_matrix(meshes)
        rhs = self._traction_rhs(meshes, tractions)
        # the crack slips until its faces are traction-balanced: the
        # slip-induced traction cancels the applied (driving) traction,
        # G·s = -t_applied — so a positive normal traction (pressurized
        # crack) OPENS the crack and uplifts the surface, matching the
        # reference convention (``bem/base.py:230`` + Fernandina example)
        slips = lstsq_robust(G_tractions, -rhs)
        disp = self._surface_displacements(meshes, slips, coords)
        col_areas = np.concatenate([
            meshes[src_i].areas
            for bc in self.boundary_conditions for src_i in bc.source_idxs])
        return BEMResponse(sources=sources, meshes=meshes,
                           displacements=disp, slips=slips, is_valid=True,
                           col_areas=col_areas)

    # -- assembly (kernels injected by beat_tpu.bem.tde) ---------------------

    def get_interaction_matrix(self, meshes) -> np.ndarray:
        """Traction at receiver-element centroids from unit slips on
        source elements (reference ``get_interaction_matrix``
        ``bem/base.py:230`` + strain→traction projection :278)."""
        from beat_tpu.bem import tde

        return tde.interaction_matrix(meshes, self.boundary_conditions,
                                      nu=self.nu, mu=self.mu,
                                      level=self.quadrature_level,
                                      near_level=self.near_quadrature_level,
                                      medium=self.medium)

    def _traction_rhs(self, meshes, tractions=None) -> np.ndarray:
        rows = []
        for k, bc in enumerate(self.boundary_conditions):
            n = sum(meshes[i].ntriangles for i in bc.receiver_idxs)
            t = bc.traction if tractions is None else float(tractions[k])
            rows.append(np.full(n, t * 1e6))  # MPa -> Pa
        return np.concatenate(rows)

    def _surface_displacements(self, meshes, slips, coords) -> np.ndarray:
        from beat_tpu.bem import tde

        D = tde.displacement_matrix(meshes, coords, nu=self.nu, mu=self.mu,
                                    boundary_conditions=self.boundary_conditions,
                                    medium=self.medium)
        return (D @ slips).reshape(-1, 3)
