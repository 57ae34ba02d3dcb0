"""
Static deformation of a layered elastic halfspace — the native psgrn
analogue.

The reference precomputes layered static Green's functions with the
Fortran code psgrn and evaluates rectangular-source surface displacements
with pscmp (``beat/heart.py:2426,4158``, GF store construction
``heart.py:2230``).  Here the same physics is computed natively:

* **Hankel-domain global-matrix solver**: for each wavenumber k the
  static P-SV system ``y' = k·M·y`` (y = scaled displacement-stress
  vector) and SH system are solved exactly per layer using the Jordan
  basis of M (eigenvalues ±1, defective — solutions ``(p + q·kz)e^{±kz}``,
  with q the eigenvector and p a generalized eigenvector, both computed
  numerically from the 4×4 material matrix).  Per-layer exponentials are
  normalized to the layer boundary they decay from, so the global linear
  system stays well-conditioned at any k·h — the standard cure for the
  propagator-matrix overflow problem.
* **Point-force sources** enter as traction jumps across the source
  depth (vertical force: azimuthal order m=0, jump in σ_zz; horizontal
  force: m=1, jumps split equally between the P-SV shear traction and
  the SH traction).
* **Surface displacements** come from numerical Hankel transforms
  (composite trapezoid; integrands decay like e^{-k·z_source}).
* **Moment tensors** = force dipoles: the elementary-MT responses are
  centered finite differences of the force Green tensor over the source
  position (horizontal derivatives are free by translation invariance;
  the depth derivative re-solves at z_s ± δ).

Validation (tests/test_layered_statics.py): a homogeneous "layered"
model reproduces the machine-verified Mindlin point-force solution and
the Okada/eigen-crack MT statics; multi-layer models converge to the
faster/stiffer halfspace limits.

Conventions: z positive DOWN (depth), free surface at z=0.  The force
Green tensor G[i, j] is displacement component i ∈ (x=east, y=north,
z=down) per unit point force along j at the source.
"""

from __future__ import annotations

import logging

import numpy as np
from scipy.special import j0, j1

logger = logging.getLogger("beat_tpu.heart.layered_statics")


# ---------------------------------------------------------------------------
# Per-material Jordan bases
# ---------------------------------------------------------------------------


def _psv_matrix(lam: float, mu: float) -> np.ndarray:
    """M of the scaled static P-SV system y' = k M y with
    y = (U, V, P/(µk), S/(µk)): U = u_z, V = u_r coefficient,
    P = σ_zz, S = σ_zr Hankel coefficients (derived from plane-strain
    equilibrium; the z-ODE is identical for cylindrical harmonics)."""
    a = lam / (lam + 2 * mu)
    beta = mu / (lam + 2 * mu)
    delta = 4 * (lam + mu) / (lam + 2 * mu)
    return np.array([
        [0.0, a, beta, 0.0],
        [-1.0, 0.0, 0.0, 1.0],
        [0.0, 0.0, 0.0, 1.0],
        [0.0, delta, -a, 0.0],
    ])


def _jordan_pair(M: np.ndarray, s: float):
    """(q, p) with M q = s q and (M - s I) p = q, computed numerically
    (SVD nullspace + least squares) — no hand-derived eigenvectors."""
    A = M - s * np.eye(4)
    _, _, vt = np.linalg.svd(A)
    q = vt[-1]
    # normalize deterministically: largest-magnitude entry positive
    q = q / q[np.argmax(np.abs(q))]
    p, *_ = np.linalg.lstsq(A, q, rcond=None)
    return q, p


def _psv_columns_k(lam, mu, k, dz_top, dz_bot, halfspace=False):
    """
    Fundamental-solution values of the P-SV system for one layer at one
    depth, vectorized over the wavenumber array ``k``; the evaluation
    depth enters via its offsets ``dz_top = z - z_top >= 0`` and
    ``dz_bot = z - z_bot <= 0``.  Columns [down1, down2(, up1, up2)]
    are normalized to the boundary they decay from, so every entry is
    bounded at any k·h.  Returns (nk, 4, ncols).
    """
    M = _psv_matrix(lam, mu)
    qm, pm = _jordan_pair(M, -1.0)
    qp, pp = _jordan_pair(M, +1.0)
    k = np.asarray(k, dtype=np.float64)
    xm = k * dz_top
    em = np.exp(-xm)
    cols = [qm[None, :] * em[:, None],
            (pm[None, :] + qm[None, :] * xm[:, None]) * em[:, None]]
    if not halfspace:
        xp = k * dz_bot
        ep = np.exp(xp)
        cols += [qp[None, :] * ep[:, None],
                 (pp[None, :] + qp[None, :] * xp[:, None]) * ep[:, None]]
    return np.stack(cols, axis=-1)      # (nk, 4, ncols)


def _sh_columns_k(k, dz_top, dz_bot, halfspace=False):
    """SH fundamental solutions (W, T/(µk)): (W, T̃) = (1, ∓1)e^{∓k·},
    vectorized over k.  Returns (nk, 2, ncols)."""
    k = np.asarray(k, dtype=np.float64)
    em = np.exp(-k * dz_top)
    cols = [np.stack([em, -em], axis=1)]
    if not halfspace:
        ep = np.exp(k * dz_bot)
        cols.append(np.stack([ep, ep], axis=1))
    return np.stack(cols, axis=-1)      # (nk, 2, ncols)


# ---------------------------------------------------------------------------
# Global-matrix solve for the surface kernels
# ---------------------------------------------------------------------------


def _split_layers(model, zs: float):
    """Layer pieces (z_top, z_bot, lam, mu, is_halfspace) with the source
    depth inserted as an interface; returns (pieces, source_interface_idx)
    where interface i sits at pieces[i].z_bot == pieces[i+1].z_top."""
    tops = list(model.tops)
    vp, vs, rho = model.vp, model.vs, model.rho
    lam_l = rho * (vp**2 - 2 * vs**2)
    mu_l = rho * vs**2
    pieces = []
    src_iface = None
    nl = len(tops)
    for i in range(nl):
        z0 = tops[i]
        z1 = tops[i + 1] if i + 1 < nl else np.inf
        if z0 < zs < z1:
            pieces.append((z0, zs, lam_l[i], mu_l[i]))
            src_iface = len(pieces) - 1
            pieces.append((zs, z1, lam_l[i], mu_l[i]))
        else:
            if zs == z0 and i > 0 and src_iface is None:
                src_iface = len(pieces) - 1
            pieces.append((z0, z1, lam_l[i], mu_l[i]))
    if src_iface is None:
        raise ValueError(f"source depth {zs} not strictly inside the model")
    return pieces, src_iface


def _solve_psv_batch(pieces, src_iface, k_grid, jumps):
    """Solve the P-SV global system for all wavenumbers at once
    (batched ``np.linalg.solve``) and a list of source jump vectors
    (scaled variables, below-minus-above, each possibly k-dependent:
    (4,) or (4, nk)).  Returns surface vectors [(nk, 4), ...]."""
    L = len(pieces)
    nk = len(k_grid)
    ncols = [2 if i == L - 1 else 4 for i in range(L)]
    offs = np.concatenate([[0], np.cumsum(ncols)])
    N = offs[-1]
    A = np.zeros((nk, N, N))
    nrhs = len(jumps)
    b = np.zeros((nk, N, nrhs))

    def cols_at(i, z):
        z0, z1, lam, mu = pieces[i]
        return _psv_columns_k(lam, mu, k_grid, z - z0,
                              0.0 if not np.isfinite(z1) else z - z1,
                              halfspace=(i == L - 1))

    def cols_phys(i, z):
        """Columns in PHYSICAL continuity variables (U, V, P/k, S/k):
        the per-layer scaling P̃ = P/(µ_i k) is material-dependent, so
        interface continuity must be written on µ_i·(P̃, S̃)."""
        c = cols_at(i, z).copy()
        c[:, 2:] *= pieces[i][3]
        return c

    # free surface: traction rows (P/k, S/k) of layer 0 at z=0 vanish
    c_surf = cols_at(0, pieces[0][0])
    c_surf_phys = cols_phys(0, pieces[0][0])
    A[:, 0, offs[0]:offs[1]] = c_surf_phys[:, 2]
    A[:, 1, offs[0]:offs[1]] = c_surf_phys[:, 3]
    row = 2
    # interface continuity: y_below(z) - y_above(z) = jump (source) or 0
    for i in range(L - 1):
        z = pieces[i][1]
        A[:, row:row + 4, offs[i]:offs[i + 1]] = -cols_phys(i, z)
        A[:, row:row + 4, offs[i + 1]:offs[i + 2]] = cols_phys(i + 1, z)
        if i == src_iface:
            for jr, jump in enumerate(jumps):
                jv = np.asarray(jump, dtype=np.float64)
                b[:, row:row + 4, jr] = jv.T if jv.ndim == 2 else jv[None, :]
        row += 4
    coef = np.linalg.solve(A, b)                       # (nk, N, nrhs)
    y0 = np.einsum("kvc,kcr->krv", c_surf, coef[:, offs[0]:offs[1]])
    return [y0[:, jr] for jr in range(nrhs)]           # each (nk, 4)


def _solve_sh_batch(pieces, src_iface, k_grid, jump2):
    L = len(pieces)
    nk = len(k_grid)
    ncols = [1 if i == L - 1 else 2 for i in range(L)]
    offs = np.concatenate([[0], np.cumsum(ncols)])
    N = offs[-1]
    A = np.zeros((nk, N, N))
    b = np.zeros((nk, N))

    def cols_at(i, z):
        z0, z1, lam, mu = pieces[i]
        return _sh_columns_k(k_grid, z - z0,
                             0.0 if not np.isfinite(z1) else z - z1,
                             halfspace=(i == L - 1))

    def cols_phys(i, z):
        c = cols_at(i, z).copy()
        c[:, 1] *= pieces[i][3]        # physical T/k = µ_i·T̃
        return c

    c_surf = cols_at(0, pieces[0][0])
    A[:, 0, offs[0]:offs[1]] = cols_phys(0, pieces[0][0])[:, 1]  # T(0) = 0
    row = 1
    for i in range(L - 1):
        z = pieces[i][1]
        A[:, row:row + 2, offs[i]:offs[i + 1]] = -cols_phys(i, z)
        A[:, row:row + 2, offs[i + 1]:offs[i + 2]] = cols_phys(i + 1, z)
        if i == src_iface:
            jv = np.asarray(jump2, dtype=np.float64)
            b[:, row:row + 2] = jv.T if jv.ndim == 2 else jv[None, :]
        row += 2
    coef = np.linalg.solve(A, b[..., None])[..., 0]
    return np.einsum("kvc,kc->kv", c_surf, coef[:, offs[0]:offs[1]])


def surface_kernels(model, zs: float, k_grid: np.ndarray):
    """
    Surface displacement kernels for unit point forces at depth ``zs``.

    Returns dict with arrays over ``k_grid``:
      U0, V0 : u_z / u_r kernels of a unit VERTICAL (+down) force (m=0)
      U1, V1, W1 : kernels of a unit HORIZONTAL force (m=1; V1 = P-SV
          horizontal, W1 = SH horizontal)
    """
    pieces, src_iface = _split_layers(model, zs)
    k_grid = np.asarray(k_grid, dtype=np.float64)

    # vertical force: Δσ_zz = -Fz/(2π) → Δ(P/k) = -1/(2π k)
    # (jumps are in PHYSICAL continuity variables — see cols_phys)
    jz = np.zeros((4, len(k_grid)))
    jz[2] = -1.0 / (2 * np.pi * k_grid)
    # horizontal force: Δ(S/k) = Δ(T/k) = -1/(2π k) (each family carries
    # the full m=1 Hankel weight of the point δ; verified against Mindlin)
    jh = np.zeros((4, len(k_grid)))
    jh[3] = -1.0 / (2 * np.pi * k_grid)
    yz, yh = _solve_psv_batch(pieces, src_iface, k_grid, [jz, jh])
    w = _solve_sh_batch(pieces, src_iface, k_grid, jh[2:])
    return {"U0": yz[:, 0], "V0": yz[:, 1],
            "U1": yh[:, 0], "V1": yh[:, 1], "W1": w[:, 0]}


class ForceKernels:
    """Point-force surface kernels on a log-spaced solver grid, cheaply
    resampled onto the (much finer) oscillation-resolving integration
    grids — the solver cost is decoupled from the Hankel-quadrature
    resolution (kernels are smooth in log k; the Bessel factors are not)."""

    NAMES = ("U0", "V0", "U1", "V1", "W1")

    def __init__(self, model, zs: float, n: int = 1600):
        self.zs = float(zs)
        k_max = 60.0 / self.zs
        k_min = 1e-6 / self.zs
        self.k = np.geomspace(k_min, k_max, n)
        self.kern = surface_kernels(model, zs, self.k)
        self._logk = np.log(self.k)

    def resample_g(self, k_fine: np.ndarray) -> dict:
        """g(k) = k·kernel (bounded: finite at k→0, smooth in log k),
        interpolated linearly in log k; k=0 takes the clamped k→0 limit."""
        out = {}
        lk = np.log(np.maximum(k_fine, self.k[0]))
        for name in self.NAMES:
            out[name] = np.interp(lk, self._logk, self.k * self.kern[name])
        return out


def _integration_grid(zs: float, r_max: float, pts_per_halfcycle: float = 20.0):
    """Linear trapezoid grid resolving the J(kr) oscillation at the
    farthest receiver and the e^{-k·zs} kernel decay."""
    k_max = 60.0 / zs
    dk = min(np.pi / (pts_per_halfcycle * max(r_max, zs)), 1.0 / (40.0 * zs))
    n = min(int(np.ceil(k_max / dk)), 600_000)
    return np.linspace(0.0, k_max, n + 1)


def point_force_surface_displacement(model, zs: float, obs_xy: np.ndarray,
                                     kernels: ForceKernels | None = None) -> np.ndarray:
    """
    Static surface displacement Green tensor of buried unit point forces.

    obs_xy : (N, 2) receiver coordinates (east, north) relative to the
        source epicenter.
    Returns (N, 3, 3): component i ∈ (x=east, y=north, z=down) per unit
        force j ∈ (+east, +north, +down).
    """
    obs_xy = np.asarray(obs_xy, dtype=np.float64)
    r = np.hypot(obs_xy[:, 0], obs_xy[:, 1])
    r = np.maximum(r, 1e-6)
    cphi = obs_xy[:, 0] / r
    sphi = obs_xy[:, 1] / r
    if kernels is None:
        kernels = ForceKernels(model, zs)
    k_grid = _integration_grid(kernels.zs, float(r.max()))
    kern = kernels.resample_g(k_grid)    # g(k) = k·kernel, finite at k=0
    kw = np.gradient(k_grid)             # trapezoid weights
    kw[0] *= 0.5
    kw[-1] *= 0.5

    kr = np.outer(r, k_grid)
    J0 = j0(kr)                          # (N, nk)
    J1 = j1(kr)
    with np.errstate(divide="ignore", invalid="ignore"):
        J1_over = np.where(kr > 0, J1 / np.where(kr > 0, kr, 1.0), 0.5)
    J1p = J0 - J1_over                   # dJ1/d(kr)

    # vertical (+down) force, m=0: radial basis is dJ0/d(kr) = -J1
    uz_z = J0 @ (kern["U0"] * kw)
    ur_z = -(J1 @ (kern["V0"] * kw))

    # horizontal force along +x, m=1 (cos φ / sin φ patterns)
    uz_x1 = J1 @ (kern["U1"] * kw)                           # × cos φ
    ur_x1 = J1p @ (kern["V1"] * kw) + J1_over @ (kern["W1"] * kw)
    up_x1 = J1_over @ (kern["V1"] * kw) + J1p @ (kern["W1"] * kw)

    G = np.zeros((obs_xy.shape[0], 3, 3))
    # force +z (down)
    G[:, 0, 2] = ur_z * cphi
    G[:, 1, 2] = ur_z * sphi
    G[:, 2, 2] = uz_z
    # force +x: u_r = cφ·ur_x1, u_φ = -sφ·up_x1, u_z = cφ·uz_x1
    G[:, 0, 0] = cphi * ur_x1 * cphi - (-sphi * up_x1) * sphi
    G[:, 1, 0] = cphi * ur_x1 * sphi + (-sphi * up_x1) * cphi
    G[:, 2, 0] = cphi * uz_x1
    # force +y: rotate the azimuth pattern by 90° (cφ→sφ, sφ→-cφ)
    G[:, 0, 1] = sphi * ur_x1 * cphi - (cphi * up_x1) * sphi
    G[:, 1, 1] = sphi * ur_x1 * sphi + (cphi * up_x1) * cphi
    G[:, 2, 1] = sphi * uz_x1
    return G


# ---------------------------------------------------------------------------
# Moment-tensor responses via force-dipole finite differences
# ---------------------------------------------------------------------------


def source_gradient_tensor(model, zs: float, obs_xy: np.ndarray,
                           rel_step: float = 1e-3) -> np.ndarray:
    """∂G_kp/∂ξ_q of the point-force surface Green tensor over the source
    position: (N, 3, 3, 3) in the (x=E, y=N, z=down) frame.  One kernel
    triplet (z_s, z_s ± δ) serves every moment tensor at this depth."""
    obs_xy = np.asarray(obs_xy, dtype=np.float64)
    d = rel_step * zs
    ex = np.array([1.0, 0.0])
    ey = np.array([0.0, 1.0])
    kern0 = ForceKernels(model, zs)

    def G_at(shift_xy, kern):
        return point_force_surface_displacement(
            model, kern.zs, obs_xy - shift_xy[None, :], kernels=kern)

    dG_dx = (G_at(d * ex, kern0) - G_at(-d * ex, kern0)) / (2 * d)
    dG_dy = (G_at(d * ey, kern0) - G_at(-d * ey, kern0)) / (2 * d)
    zero = np.zeros(2)
    dG_dz = (G_at(zero, ForceKernels(model, zs + d))
             - G_at(zero, ForceKernels(model, zs - d))) / (2 * d)
    return np.stack([dG_dx, dG_dy, dG_dz], axis=-1)


def _m6_ned_to_xyz(m6) -> np.ndarray:
    """NED m6 → full 3×3 in the (x=E, y=N, z=down) frame of G."""
    mnn, mee, mdd, mne, mnd, med = np.asarray(m6, dtype=np.float64)
    return np.array([[mee, mne, med],
                     [mne, mnn, mnd],
                     [med, mnd, mdd]])


def elementary_mt_surface_displacements(model, zs: float, obs_xy: np.ndarray,
                                        rel_step: float = 1e-3) -> np.ndarray:
    """(6, N, 3) surface displacements (east, north, UP) of the six unit
    elementary moment tensors (mnn, mee, mdd, mne, mnd, med order) —
    shares one source-gradient tensor across all six (table builder)."""
    dG = source_gradient_tensor(model, zs, obs_xy, rel_step)
    out = []
    eye6 = np.eye(6)
    for k in range(6):
        u = np.einsum("pq,nkpq->nk", _m6_ned_to_xyz(eye6[k]), dG)
        out.append(np.stack([u[:, 0], u[:, 1], -u[:, 2]], axis=-1))
    return np.stack(out)


def mt_surface_displacement_layered(model, zs: float, obs_xy: np.ndarray,
                                    m6, rel_step: float = 1e-3) -> np.ndarray:
    """
    Surface displacement (N, 3 = east, north, UP) of a buried point
    moment tensor (NED m6 = mnn, mee, mdd, mne, mnd, med [Nm]) in the
    layered model: u_k = m_pq ∂G_kp/∂ξ_q with source-position derivatives
    by centered differences (horizontal ones via receiver shifts —
    translation invariance; the vertical one via two extra solves).
    """
    dG = source_gradient_tensor(model, zs, obs_xy, rel_step)
    u = np.einsum("pq,nkpq->nk", _m6_ned_to_xyz(m6), dG)  # (N, 3) x,y,z-down
    return np.stack([u[:, 0], u[:, 1], -u[:, 2]], axis=-1)  # z-down -> up
