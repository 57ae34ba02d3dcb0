"""
Native layered-earth **waveform** Green's functions — the qseis analogue.

The reference computes layered waveform GFs with external Fortran codes
(qseis/qssp via fomosto, ``beat/heart.py:2126-2330``) and consumes the
resulting stores.  This module computes the same physics natively — a
discrete-wavenumber / global-matrix method (Bouchon 1981; Müller 1985)
in the frequency domain — so :class:`beat_tpu.heart.gftable.GreensTable`
tables for 1-D layered models can be built without any external wavefield
code, completing the chain begun by :mod:`beat_tpu.heart.layered_statics`
(the psgrn analogue) for statics.

Method
------
* For each (complex) frequency ``ω' = ω − iζ`` and wavenumber ``k``, the
  elastodynamic P-SV system in a homogeneous layer has four exact wave
  solutions (up/down P and SV with vertical wavenumbers
  ``ν_{α,β} = √(k² − ω'²/v²)``, principal branch so Re ν ≥ 0), the SH
  system two.  Per-layer exponentials are normalized to the boundary they
  decay from — the same conditioning cure as the static solver.
* Free-surface + interface-continuity + radiation conditions form one
  global linear system per (ω, k), batched over the wavenumber grid.
* **Point forces** enter as frequency-independent traction jumps across
  the source depth (identical to the static case, which is validated
  against Mindlin); surface displacements follow by midpoint-rule Hankel
  synthesis over ``k``.
* **Moment tensors** = force dipoles: centered finite differences of the
  force Green tensor over the source position (horizontal derivatives by
  receiver translation, the vertical one by two extra solves) — exactly
  the static module's trick, so the two share conventions by
  construction.
* **Complex frequency** ``ζ = ζ_cycles·π/T`` (Bouchon) pushes the
  surface-wave poles off the integration path and suppresses time-domain
  wrap-around by ``e^{−ζT}``; the inverse transform multiplies by
  ``e^{+ζt}`` to undo the damping.

Validation (tests/test_layered_waveforms.py): the ω→0 limit of the
moment-impulse response equals the (Mindlin-verified) static solution of
:mod:`layered_statics`; homogeneous-model traces are causal with ray
P/S arrival times; a layered table builds into a working
:class:`GreensTable`.

Conventions match :mod:`layered_statics` / :mod:`gftable`: z positive
down, free surface at z=0, NED moment tensors, receiver components
(Z up, R radial away from source, T transverse) at azimuth 0.
"""

from __future__ import annotations

import logging

import numpy as np
from scipy.special import j0, j1

from beat_tpu.heart.layered_statics import _m6_ned_to_xyz

logger = logging.getLogger("beat_tpu.heart.layered_waveforms")


# ---------------------------------------------------------------------------
# Per-layer wave columns (exact homogeneous solutions)
# ---------------------------------------------------------------------------


def _psv_wave_entries(lam, mu, rho, w2, k):
    """Raw (z-independent) P-SV wave-column entries at one material for a
    wavenumber array: returns (nu_a, nu_b, cols) with cols (nk, 4, 4) in
    physical variables y = (U, V, P, S), column order
    [P down, SV down, P up, SV up]; 'down' ~ e^{−νz}, 'up' ~ e^{+νz}.

    Derived from displacement potentials φ (P) and ∇×∇×(χ ẑ) (SV) with
    u_z = U·J_m, u_r = −V·J_m' (sign convention of the static module):
      P wave  (e^{sνz}): U = sν_α,  V = k,     P = 2µν_α² − λω'²/vp²,
                         S = 2µ s ν_α k
      SV wave (e^{sνz}): U = k²,    V = sν_β k, P = 2µ s ν_β k²,
                         S = µ k (ν_β² + k²)
    """
    k = np.asarray(k)
    va2 = (lam + 2 * mu) / rho
    vb2 = mu / rho
    nu_a = np.sqrt(k * k - w2 / va2 + 0j)
    nu_b = np.sqrt(k * k - w2 / vb2 + 0j)
    cols = np.zeros((k.size, 4, 4), dtype=np.complex128)
    p_even = 2 * mu * nu_a**2 - lam * (w2 / va2)
    s_even = mu * k * (nu_b**2 + k * k)
    for c, (s, fam) in enumerate(((-1, "P"), (-1, "SV"), (+1, "P"), (+1, "SV"))):
        if fam == "P":
            col = np.stack([s * nu_a, k + 0j * k, p_even, 2 * mu * s * nu_a * k],
                           axis=-1)
        else:
            col = np.stack([k * k + 0j * k, s * nu_b * k, 2 * mu * s * nu_b * k * k,
                            s_even], axis=-1)
        cols[:, :, c] = col
    return nu_a, nu_b, cols


def _psv_columns_dyn(lam, mu, rho, w2, k, dz_top, dz_bot, halfspace,
                     stress_scale):
    """Boundary-normalized P-SV columns at one evaluation depth:
    (nk, 4, ncols) with stress rows pre-divided by ``stress_scale`` (nk,)
    and each column divided by its max-abs raw entry (consistent across
    evaluation depths).  ncols = 2 (halfspace: down only) or 4."""
    nu_a, nu_b, cols = _psv_wave_entries(lam, mu, rho, w2, k)
    cols = cols.copy()
    cols[:, 2, :] /= stress_scale[:, None]
    cols[:, 3, :] /= stress_scale[:, None]
    norm = np.max(np.abs(cols), axis=1)           # (nk, 4) per column
    cols = cols / norm[:, None, :]
    nus = np.stack([nu_a, nu_b, nu_a, nu_b], axis=-1)   # (nk, 4)
    ncols = 2 if halfspace else 4
    phase = np.empty((k.size, ncols), dtype=np.complex128)
    phase[:, 0] = np.exp(-nus[:, 0] * dz_top)
    phase[:, 1] = np.exp(-nus[:, 1] * dz_top)
    if not halfspace:
        phase[:, 2] = np.exp(nus[:, 2] * dz_bot)
        phase[:, 3] = np.exp(nus[:, 3] * dz_bot)
    return cols[:, :, :ncols] * phase[:, None, :]


def _sh_columns_dyn(mu, rho, w2, k, dz_top, dz_bot, halfspace, stress_scale):
    """SH columns y = (W, T), T = µ ∂_z W: (nk, 2, ncols)."""
    k = np.asarray(k)
    nu_b = np.sqrt(k * k - w2 * rho / mu + 0j)
    down = np.stack([np.ones_like(nu_b), -mu * nu_b / stress_scale], axis=-1)
    cols = [down]
    if not halfspace:
        cols.append(np.stack([np.ones_like(nu_b), mu * nu_b / stress_scale],
                             axis=-1))
    cols = np.stack(cols, axis=-1)                # (nk, 2, ncols)
    norm = np.max(np.abs(cols), axis=1)
    cols = cols / norm[:, None, :]
    ncols = cols.shape[-1]
    phase = np.empty((k.size, ncols), dtype=np.complex128)
    phase[:, 0] = np.exp(-nu_b * dz_top)
    if not halfspace:
        phase[:, 1] = np.exp(nu_b * dz_bot)
    return cols * phase[:, None, :]


# ---------------------------------------------------------------------------
# Global-matrix solves
# ---------------------------------------------------------------------------


def _split_layers_rho(model, zs: float):
    """Layer pieces (z_top, z_bot, lam, mu, rho) with the source depth as
    an interface (dynamic variant of layered_statics._split_layers).
    Anelastic attenuation enters as constant-Q complex velocities
    ``v·(1 + i/2Q)`` (the non-dispersive constant-Q convention qseis
    also offers), making the Lamé moduli complex."""
    tops = list(model.tops)
    vp, vs, rho = model.vp, model.vs, model.rho
    if getattr(model, "qp", None) is not None:
        vp = vp * (1.0 + 0.5j / model.qp)
    if getattr(model, "qs", None) is not None:
        vs = vs * (1.0 + 0.5j / model.qs)
    lam_l = rho * (vp**2 - 2 * vs**2)
    mu_l = rho * vs**2
    pieces = []
    src_iface = None
    nl = len(tops)
    for i in range(nl):
        z0 = tops[i]
        z1 = tops[i + 1] if i + 1 < nl else np.inf
        if z0 < zs < z1:
            pieces.append((z0, zs, lam_l[i], mu_l[i], rho[i]))
            src_iface = len(pieces) - 1
            pieces.append((zs, z1, lam_l[i], mu_l[i], rho[i]))
        else:
            if zs == z0 and i > 0 and src_iface is None:
                src_iface = len(pieces) - 1
            pieces.append((z0, z1, lam_l[i], mu_l[i], rho[i]))
    if src_iface is None:
        raise ValueError(f"source depth {zs} not strictly inside the model")
    return pieces, src_iface


def _batched_solve(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Complex LU solve with partial pivoting, vectorized over the
    leading batch axis: ``A (nk, N, N) @ X = B (nk, N, R)``.

    ``np.linalg.solve`` dispatches one LAPACK call per batch item — at
    the table builder's scale (tens of thousands of 14×14 systems per
    frequency) the per-call overhead dominates the O(N³) work.  Doing
    the elimination with whole-batch numpy updates is ~4× faster and
    numerically identical up to roundoff (same pivoting strategy)."""
    A = A.copy()
    X = B.copy()
    nk, N, _ = A.shape
    rows = np.arange(nk)
    for j in range(N):
        p = np.abs(A[:, j:, j]).argmax(axis=1) + j
        need = p != j
        if need.any():
            Aj = A[rows, j].copy()
            A[rows, j] = A[rows, p]
            A[rows, p] = Aj
            Xj = X[rows, j].copy()
            X[rows, j] = X[rows, p]
            X[rows, p] = Xj
        f = A[:, j + 1:, j] / A[:, j, j][:, None]
        A[:, j + 1:, j + 1:] -= f[:, :, None] * A[:, j, j + 1:][:, None, :]
        X[:, j + 1:, :] -= f[:, :, None] * X[:, j, :][:, None, :]
    for j in range(N - 1, -1, -1):
        if j + 1 < N:
            X[:, j, :] -= np.einsum("km,kmr->kr", A[:, j, j + 1:],
                                    X[:, j + 1:, :])
        X[:, j, :] /= A[:, j, j][:, None]
    return X


def _solve_psv_dyn(pieces, src_iface, k, w2, stress_scale, jumps):
    """Batched complex P-SV global solve; ``jumps`` are source
    discontinuity vectors (4,) or (4, nk) in PHYSICAL (U, V, P, S)
    variables (below − above).  Returns [(nk, 4) surface vectors, ...]
    (stress entries still scaled — only U, V rows are used)."""
    L = len(pieces)
    nk = len(k)
    ncols = [2 if i == L - 1 else 4 for i in range(L)]
    offs = np.concatenate([[0], np.cumsum(ncols)])
    N = offs[-1]
    A = np.zeros((nk, N, N), dtype=np.complex128)
    nrhs = len(jumps)
    b = np.zeros((nk, N, nrhs), dtype=np.complex128)

    def cols_at(i, z):
        z0, z1, lam, mu, rho = pieces[i]
        return _psv_columns_dyn(lam, mu, rho, w2, k, z - z0,
                                0.0 if not np.isfinite(z1) else z - z1,
                                halfspace=(i == L - 1),
                                stress_scale=stress_scale)

    c_surf = cols_at(0, pieces[0][0])
    A[:, 0, offs[0]:offs[1]] = c_surf[:, 2]      # P(0) = 0
    A[:, 1, offs[0]:offs[1]] = c_surf[:, 3]      # S(0) = 0
    row = 2
    for i in range(L - 1):
        z = pieces[i][1]
        A[:, row:row + 4, offs[i]:offs[i + 1]] = -cols_at(i, z)
        A[:, row:row + 4, offs[i + 1]:offs[i + 2]] = cols_at(i + 1, z)
        if i == src_iface:
            for jr, jump in enumerate(jumps):
                jv = np.asarray(jump, dtype=np.complex128)
                jv = jv.T if jv.ndim == 2 else np.broadcast_to(jv, (nk, 4)).copy()
                jv = jv.copy()
                jv[:, 2] /= stress_scale
                jv[:, 3] /= stress_scale
                b[:, row:row + 4, jr] = jv
        row += 4
    coef = _batched_solve(A, b)
    y0 = np.einsum("kvc,kcr->krv", c_surf, coef[:, offs[0]:offs[1]])
    return [y0[:, jr] for jr in range(nrhs)]


def _solve_sh_dyn(pieces, src_iface, k, w2, stress_scale, jump2):
    L = len(pieces)
    nk = len(k)
    ncols = [1 if i == L - 1 else 2 for i in range(L)]
    offs = np.concatenate([[0], np.cumsum(ncols)])
    N = offs[-1]
    A = np.zeros((nk, N, N), dtype=np.complex128)
    b = np.zeros((nk, N), dtype=np.complex128)

    def cols_at(i, z):
        z0, z1, lam, mu, rho = pieces[i]
        return _sh_columns_dyn(mu, rho, w2, k, z - z0,
                               0.0 if not np.isfinite(z1) else z - z1,
                               halfspace=(i == L - 1),
                               stress_scale=stress_scale)

    c_surf = cols_at(0, pieces[0][0])
    A[:, 0, offs[0]:offs[1]] = c_surf[:, 1]      # T(0) = 0
    row = 1
    for i in range(L - 1):
        z = pieces[i][1]
        A[:, row:row + 2, offs[i]:offs[i + 1]] = -cols_at(i, z)
        A[:, row:row + 2, offs[i + 1]:offs[i + 2]] = cols_at(i + 1, z)
        if i == src_iface:
            jv = np.asarray(jump2, dtype=np.complex128)
            jv = jv.T if jv.ndim == 2 else np.broadcast_to(jv, (nk, 2)).copy()
            jv = jv.copy()
            jv[:, 1] /= stress_scale
            b[:, row:row + 2] = jv
        row += 2
    coef = _batched_solve(A, b[..., None])[..., 0]
    return np.einsum("kvc,kc->kv", c_surf, coef[:, offs[0]:offs[1]])


def dynamic_force_kernels(model, zs: float, w_c: complex,
                          k_grid: np.ndarray) -> dict:
    """Surface displacement kernels of buried unit point forces at one
    complex frequency: dict of complex arrays over ``k_grid`` with the
    same names/conventions as the static ``surface_kernels``."""
    pieces, src_iface = _split_layers_rho(model, zs)
    k_grid = np.asarray(k_grid, dtype=np.float64)
    w2 = w_c * w_c
    vs_min = float(np.min(model.vs))
    mu0 = float(np.median(model.rho * model.vs**2))
    stress_scale = mu0 * (k_grid + abs(w_c) / vs_min)

    # frequency-independent traction jumps (identical to the static,
    # Mindlin-verified case): ΔP = −1/2π (vertical), ΔS/ΔT = −1/2π (horiz.)
    jz = np.zeros(4)
    jz[2] = -1.0 / (2 * np.pi)
    jh = np.zeros(4)
    jh[3] = -1.0 / (2 * np.pi)
    jsh = np.zeros(2)
    jsh[1] = -1.0 / (2 * np.pi)
    yz, yh = _solve_psv_dyn(pieces, src_iface, k_grid, w2, stress_scale,
                            [jz, jh])
    w = _solve_sh_dyn(pieces, src_iface, k_grid, w2, stress_scale, jsh)
    return {"U0": yz[:, 0], "V0": yz[:, 1],
            "U1": yh[:, 0], "V1": yh[:, 1], "W1": w[:, 0]}


# ---------------------------------------------------------------------------
# Hankel synthesis (complex mirror of the static assembly)
# ---------------------------------------------------------------------------


def dynamic_integration_grid(model, zs: float, r_max: float, T: float,
                             w_abs: float, ppw: float = 1.2,
                             nk_max: int = 120_000,
                             tail_coeff: float = 50.0) -> np.ndarray:
    """Midpoint-rule wavenumber grid: spacing resolves the Bessel
    oscillation over the Bouchon periodicity ``r_max + vp_max·T`` (no
    sources wrap into the window), extent covers the propagating region
    plus the ``e^{−k·zs}`` evanescent tail (truncated at
    ``e^{−tail_coeff}``; 50 is conservative, ~30 is visually
    indistinguishable at regional distances and ~40 % cheaper for
    shallow sources where the tail dominates the grid)."""
    vp_max = float(np.max(model.vp))
    vs_min = float(np.min(model.vs))
    span = r_max + vp_max * T
    dk = 2.0 * np.pi / (ppw * span)
    k_max = w_abs / vs_min * 1.05 + tail_coeff / max(zs, 1e3)
    nk = int(np.ceil(k_max / dk))
    if nk > nk_max:
        # called per (depth, frequency) during a table build: warn once
        # per process, not thousands of times
        if not getattr(dynamic_integration_grid, "_clamp_warned", False):
            dynamic_integration_grid._clamp_warned = True
            logger.warning(
                "wavenumber grid clamped: %i -> %i points (k_max %.3g, "
                "dk %.3g) — the evanescent tail is truncated; shorten the "
                "window, lower fmax or raise nk_max (warning shown once; "
                "later clamps in this build are silent)",
                nk, nk_max, k_max, dk)
        nk = nk_max
    return (np.arange(nk) + 0.5) * dk


def _hankel_weights(r: np.ndarray, k_grid: np.ndarray) -> tuple:
    """Precomputed Bessel synthesis matrices (J0, J1, J1/kr, J1') of
    shape (nr, nk) — the frequency-INDEPENDENT part of the Hankel
    synthesis.  Hoisting these out of the frequency loop is the main
    lever of the band table builder: Bessel evaluation dominated the
    per-frequency cost when each frequency rebuilt its own grid."""
    kr = np.outer(np.asarray(r, dtype=np.float64), k_grid)
    J0 = j0(kr)
    J1 = j1(kr)
    with np.errstate(divide="ignore", invalid="ignore"):
        J1_over = np.where(kr > 0, J1 / np.where(kr > 0, kr, 1.0), 0.5)
    J1p = J0 - J1_over
    return J0, J1, J1_over, J1p


def _hankel_apply(weights: tuple, k_grid: np.ndarray,
                  kernels: dict) -> tuple:
    """Synthesis vectors (uz_z, ur_z, uz_x1, ur_x1, up_x1) — the
    geometry-independent matvec half of the Green-tensor assembly.
    Kernel pairs sharing a weight matrix go through ONE matmul so each
    (nr, nk) Bessel matrix is read once (the matvecs are
    bandwidth-bound at table-builder scale)."""
    J0, J1, J1_over, J1p = weights
    dk = k_grid[1] - k_grid[0] if k_grid.size > 1 else k_grid[0] * 2
    kd = k_grid * dk
    u0 = kernels["U0"] * kd
    pair_vu = np.stack([kernels["V0"] * kd, kernels["U1"] * kd], axis=-1)
    pair_vw = np.stack([kernels["V1"] * kd, kernels["W1"] * kd], axis=-1)

    uz_z = J0 @ u0
    j1_vu = J1 @ pair_vu                      # (nr, 2): [V0, U1]
    jo_vw = J1_over @ pair_vw                 # (nr, 2): [V1, W1]
    jp_vw = J1p @ pair_vw
    ur_z = -j1_vu[:, 0]
    uz_x1 = j1_vu[:, 1]
    ur_x1 = jp_vw[:, 0] + jo_vw[:, 1]
    up_x1 = jo_vw[:, 0] + jp_vw[:, 1]
    return uz_z, ur_z, uz_x1, ur_x1, up_x1


def _G_assemble(mv: tuple, cphi: np.ndarray, sphi: np.ndarray) -> np.ndarray:
    """Green tensor (N, 3, 3) from synthesis vectors + receiver azimuth
    factors (the cheap angular half — G at mirrored receiver offsets
    reuses one ``_hankel_apply`` result with different factors)."""
    uz_z, ur_z, uz_x1, ur_x1, up_x1 = mv
    G = np.zeros((uz_z.shape[0], 3, 3), dtype=np.complex128)
    G[:, 0, 2] = ur_z * cphi
    G[:, 1, 2] = ur_z * sphi
    G[:, 2, 2] = uz_z
    G[:, 0, 0] = cphi * ur_x1 * cphi + sphi * up_x1 * sphi
    G[:, 1, 0] = cphi * ur_x1 * sphi - sphi * up_x1 * cphi
    G[:, 2, 0] = cphi * uz_x1
    G[:, 0, 1] = sphi * ur_x1 * cphi - cphi * up_x1 * sphi
    G[:, 1, 1] = sphi * ur_x1 * sphi + cphi * up_x1 * cphi
    G[:, 2, 1] = sphi * uz_x1
    return G


def _G_from_weights(kernels: dict, k_grid: np.ndarray, weights: tuple,
                    cphi: np.ndarray, sphi: np.ndarray) -> np.ndarray:
    """Surface Green tensor (N, 3, 3) from force kernels + precomputed
    Hankel weight matrices (the synthesis half of
    :func:`dynamic_point_force_G`)."""
    return _G_assemble(_hankel_apply(weights, k_grid, kernels), cphi, sphi)


def dynamic_point_force_G(model, zs: float, obs_xy: np.ndarray,
                          w_c: complex, kernels: dict,
                          k_grid: np.ndarray) -> np.ndarray:
    """Complex surface Green tensor (N, 3, 3) of buried unit point
    forces at one complex frequency (layout identical to the static
    ``point_force_surface_displacement``: component i ∈ (x=E, y=N,
    z=down) per unit force j)."""
    obs_xy = np.asarray(obs_xy, dtype=np.float64)
    r = np.hypot(obs_xy[:, 0], obs_xy[:, 1])
    r = np.maximum(r, 1e-6)
    cphi = obs_xy[:, 0] / r
    sphi = obs_xy[:, 1] / r
    dk = k_grid[1] - k_grid[0] if k_grid.size > 1 else k_grid[0] * 2
    gk = {n: kernels[n] * k_grid * dk for n in
          ("U0", "V0", "U1", "V1", "W1")}

    kr = np.outer(r, k_grid)
    J0 = j0(kr)
    J1 = j1(kr)
    with np.errstate(divide="ignore", invalid="ignore"):
        J1_over = np.where(kr > 0, J1 / np.where(kr > 0, kr, 1.0), 0.5)
    J1p = J0 - J1_over

    uz_z = J0 @ gk["U0"]
    ur_z = -(J1 @ gk["V0"])
    uz_x1 = J1 @ gk["U1"]
    ur_x1 = J1p @ gk["V1"] + J1_over @ gk["W1"]
    up_x1 = J1_over @ gk["V1"] + J1p @ gk["W1"]

    G = np.zeros((obs_xy.shape[0], 3, 3), dtype=np.complex128)
    G[:, 0, 2] = ur_z * cphi
    G[:, 1, 2] = ur_z * sphi
    G[:, 2, 2] = uz_z
    G[:, 0, 0] = cphi * ur_x1 * cphi + sphi * up_x1 * sphi
    G[:, 1, 0] = cphi * ur_x1 * sphi - sphi * up_x1 * cphi
    G[:, 2, 0] = cphi * uz_x1
    G[:, 0, 1] = sphi * ur_x1 * cphi - cphi * up_x1 * sphi
    G[:, 1, 1] = sphi * ur_x1 * sphi + cphi * up_x1 * cphi
    G[:, 2, 1] = sphi * uz_x1
    return G


def dynamic_source_gradient(model, zs: float, obs_xy: np.ndarray,
                            w_c: complex, k_grid: np.ndarray,
                            rel_step: float = 1e-3) -> np.ndarray:
    """∂G_kp/∂ξ_q over the source position at one complex frequency:
    (N, 3, 3, 3) complex — horizontal derivatives by receiver
    translation, the vertical one by two extra kernel solves
    (the static module's force-dipole construction)."""
    obs_xy = np.asarray(obs_xy, dtype=np.float64)
    d = rel_step * zs
    ex = np.array([1.0, 0.0])
    ey = np.array([0.0, 1.0])
    kern0 = dynamic_force_kernels(model, zs, w_c, k_grid)

    def G_at(shift_xy, kern, depth):
        return dynamic_point_force_G(model, depth, obs_xy - shift_xy[None, :],
                                     w_c, kern, k_grid)

    dG_dx = (G_at(d * ex, kern0, zs) - G_at(-d * ex, kern0, zs)) / (2 * d)
    dG_dy = (G_at(d * ey, kern0, zs) - G_at(-d * ey, kern0, zs)) / (2 * d)
    zero = np.zeros(2)
    kp = dynamic_force_kernels(model, zs + d, w_c, k_grid)
    km = dynamic_force_kernels(model, zs - d, w_c, k_grid)
    dG_dz = (G_at(zero, kp, zs + d) - G_at(zero, km, zs - d)) / (2 * d)
    return np.stack([dG_dx, dG_dy, dG_dz], axis=-1)


def elementary_mt_spectra(model, zs: float, distances: np.ndarray,
                          w_c: complex, k_grid: np.ndarray,
                          rel_step: float = 1e-3) -> np.ndarray:
    """(6, 3, nd) complex spectra of the six unit elementary moment
    tensors (impulse moment-rate, i.e. **step moment** after the 1/(iω')
    integration applied here) at receivers due north (azimuth 0), in
    (Z up, R, T) components — one source-gradient evaluation shared by
    all six MTs."""
    distances = np.asarray(distances, dtype=np.float64)
    obs_xy = np.stack([np.zeros_like(distances), distances], axis=-1)
    dG = dynamic_source_gradient(model, zs, obs_xy, w_c, k_grid, rel_step)
    out = np.zeros((6, 3, distances.size), dtype=np.complex128)
    eye6 = np.eye(6)
    for kk in range(6):
        u = np.einsum("pq,nkpq->nk", _m6_ned_to_xyz(eye6[kk]), dG)
        # moment step: ∫ impulse → 1/(iω'); (x=E, y=N, z=down) → (Z, R, T)
        u = u / (1j * w_c)
        out[kk, 0] = -u[:, 2]      # Z up
        out[kk, 1] = u[:, 1]       # R = north at azimuth 0
        out[kk, 2] = u[:, 0]       # T = east at azimuth 0
    return out


def elementary_mt_spectra_band(model, zs: float, distances: np.ndarray,
                               w_list, k_grid: np.ndarray,
                               rel_step: float = 1e-3) -> np.ndarray:
    """(6, 3, nd, nw) elementary-MT spectra for a whole frequency BAND
    sharing one wavenumber grid.

    Numerically equivalent to calling :func:`elementary_mt_spectra` per
    frequency (the shared grid only extends the integration beyond each
    frequency's own truncation point, where the integrand has already
    decayed), but ~an order of magnitude faster for table builds on a
    single host core: the Bessel synthesis matrices — which dominate the
    per-frequency cost — depend only on (receiver offsets, k) and are
    computed once per depth here, with only the cheap global-matrix
    solves repeating per frequency."""
    distances = np.asarray(distances, dtype=np.float64)
    w_list = np.asarray(w_list, dtype=np.complex128)
    d = rel_step * zs
    nd = distances.size

    # four receiver-offset geometries of the source-gradient stencil
    r_x = np.hypot(d, distances)
    W0 = _hankel_weights(distances, k_grid)           # unshifted (z-dipole)
    Wx = _hankel_weights(r_x, k_grid)                 # ±d·ex (shared r)
    Wym = _hankel_weights(distances - d, k_grid)      # shift +d·ey
    Wyp = _hankel_weights(distances + d, k_grid)      # shift −d·ey
    ones = np.ones(nd)
    zeros = np.zeros(nd)
    sphi_x = distances / r_x
    cphi_xp = -d / r_x                                # obs − (+d·ex)
    cphi_xm = d / r_x

    m_xyz = [_m6_ned_to_xyz(row) for row in np.eye(6)]
    out = np.zeros((6, 3, nd, w_list.size), dtype=np.complex128)
    for jw, w_c in enumerate(w_list):
        kern0 = dynamic_force_kernels(model, zs, w_c, k_grid)
        kp = dynamic_force_kernels(model, zs + d, w_c, k_grid)
        km = dynamic_force_kernels(model, zs - d, w_c, k_grid)
        # the ±d·ex offsets share radius r_x, hence ONE matvec set with
        # mirrored azimuth factors — 5 Hankel applications instead of 6
        mv_x = _hankel_apply(Wx, k_grid, kern0)
        G_xp = _G_assemble(mv_x, cphi_xp, sphi_x)
        G_xm = _G_assemble(mv_x, cphi_xm, sphi_x)
        G_yp = _G_assemble(_hankel_apply(Wym, k_grid, kern0), zeros, ones)
        G_ym = _G_assemble(_hankel_apply(Wyp, k_grid, kern0), zeros, ones)
        G_zp = _G_assemble(_hankel_apply(W0, k_grid, kp), zeros, ones)
        G_zm = _G_assemble(_hankel_apply(W0, k_grid, km), zeros, ones)
        dG = np.stack([(G_xp - G_xm) / (2 * d),
                       (G_yp - G_ym) / (2 * d),
                       (G_zp - G_zm) / (2 * d)], axis=-1)
        for kk in range(6):
            u = np.einsum("pq,nkpq->nk", m_xyz[kk], dG) / (1j * w_c)
            out[kk, 0, :, jw] = -u[:, 2]     # Z up
            out[kk, 1, :, jw] = u[:, 1]      # R (north at azimuth 0)
            out[kk, 2, :, jw] = u[:, 0]      # T (east at azimuth 0)
    return out


# ---------------------------------------------------------------------------
# Kennett-recursion band synthesis (the fast table-builder path)
# ---------------------------------------------------------------------------


_KERNEL_NAMES = ("U0", "V0", "U1", "V1", "W1")


def _rmatmul(J: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Real (nr, nk) @ complex (nk, nc) without promoting J to complex:
    the complex columns viewed as interleaved real pairs turn one zgemm
    (with a 79 MB promotion copy of J per call at table scale) into one
    dgemm at half the flops."""
    C = np.ascontiguousarray(C, dtype=np.complex128)
    out = J @ C.view(np.float64).reshape(C.shape[0], -1)
    return out.view(np.complex128)


def _hankel_apply_band(weights: tuple, k_grid: np.ndarray,
                       kernels: dict) -> tuple:
    """Frequency-batched :func:`_hankel_apply`: kernels are (nf, nk)
    bands, every Bessel matrix is applied to all frequencies in one
    matmul.  Returns five (nr, nf) synthesis arrays."""
    J0, J1, J1_over, J1p = weights
    dk = k_grid[1] - k_grid[0] if k_grid.size > 1 else k_grid[0] * 2
    kd = (k_grid * dk)[None, :]
    u0 = (kernels["U0"] * kd).T                      # (nk, nf)
    nf = u0.shape[1]
    pair_vu = np.concatenate([(kernels["V0"] * kd).T,
                              (kernels["U1"] * kd).T], axis=1)  # (nk, 2nf)
    pair_vw = np.concatenate([(kernels["V1"] * kd).T,
                              (kernels["W1"] * kd).T], axis=1)

    uz_z = _rmatmul(J0, u0)
    j1_vu = _rmatmul(J1, pair_vu)
    jo_vw = _rmatmul(J1_over, pair_vw)
    jp_vw = _rmatmul(J1p, pair_vw)
    ur_z = -j1_vu[:, :nf]
    uz_x1 = j1_vu[:, nf:]
    ur_x1 = jp_vw[:, :nf] + jo_vw[:, nf:]
    up_x1 = jo_vw[:, :nf] + jp_vw[:, nf:]
    return uz_z, ur_z, uz_x1, ur_x1, up_x1


def _G_assemble_band(mv: tuple, cphi: np.ndarray,
                     sphi: np.ndarray) -> np.ndarray:
    """(nr, nf, 3, 3) Green tensors from (nr, nf) synthesis arrays +
    (nr,) azimuth factors (band analogue of :func:`_G_assemble`)."""
    uz_z, ur_z, uz_x1, ur_x1, up_x1 = mv
    c = cphi[:, None]
    s = sphi[:, None]
    G = np.zeros(uz_z.shape + (3, 3), dtype=np.complex128)
    G[..., 0, 2] = ur_z * c
    G[..., 1, 2] = ur_z * s
    G[..., 2, 2] = uz_z
    G[..., 0, 0] = c * ur_x1 * c + s * up_x1 * s
    G[..., 1, 0] = c * ur_x1 * s - s * up_x1 * c
    G[..., 2, 0] = c * uz_x1
    G[..., 0, 1] = s * ur_x1 * c - c * up_x1 * s
    G[..., 1, 1] = s * ur_x1 * s + c * up_x1 * c
    G[..., 2, 1] = s * uz_x1
    return G


def _kernels_band_safe(model, zs_set, w_c: np.ndarray, k_grid: np.ndarray,
                       w_escalate: float = 0.06,
                       fallback_tol: float = 1e-6) -> dict:
    """Force kernels (nf, nk) per source depth via the Kennett solver,
    with automatic precision escalation: the P-SV wave basis degenerates
    as ω → 0 (ν_α → ν_β), amplifying roundoff in the R/T recursion by
    ~|ω|⁻⁵ — so bins with |ω| < ``w_escalate`` are recomputed in
    complex256 (80-bit, ~2000× smaller eps), and any bin whose measured
    c128↔c256 disagreement implies a c256 error above ``fallback_tol``
    falls back to the dense global-matrix solver (which never forms the
    near-singular R/T intermediates).  Empirically (4-layer crust,
    zs = 1 km, |ω| = 6.1e-3): c128 error 2.5e-3, c256 error 3e-6,
    scaling ~|ω|⁻⁵ — see tests/test_reflectivity.py."""
    from beat_tpu.heart.reflectivity import ReflectivitySolver

    w2 = (w_c * w_c)[:, None]
    k2 = np.asarray(k_grid)[None, :]
    solver = ReflectivitySolver(model, w2, k2)
    kerns = {zs: solver.force_kernels(zs) for zs in zs_set}
    del solver

    low = np.abs(w_c) < w_escalate
    if not low.any():
        return kerns
    s256 = ReflectivitySolver(model, w2[low].astype(np.complex256), k2,
                              dtype=np.complex256)
    eps_gain = 1500.0          # conservative eps128/eps256 error shrink
    low_idx = np.flatnonzero(low)
    for zs in zs_set:
        k256 = s256.force_kernels(zs)
        bad_bins = set()
        for name in _KERNEL_NAMES:
            a256 = k256[name].astype(np.complex128)
            a128 = kerns[zs][name][low]
            scale = np.abs(a256).max(axis=1) + 1e-300
            disagree = np.abs(a128 - a256).max(axis=1) / scale
            kerns[zs][name][low] = a256
            bad_bins.update(low_idx[np.flatnonzero(
                disagree / eps_gain > fallback_tol)])
        for jf in sorted(bad_bins):
            logger.info("kennett: bin |w|=%.3g at zs=%g m beyond c256 "
                        "precision — global-matrix fallback", abs(w_c[jf]), zs)
            exact = dynamic_force_kernels(model, zs, complex(w_c[jf]), k_grid)
            for name in _KERNEL_NAMES:
                kerns[zs][name][jf] = exact[name]
    return kerns


def _hybrid_solve_grid(model, k_grid: np.ndarray, w_abs: float,
                       pts_per_decade: int = 128) -> tuple:
    """Split the Hankel grid into a pole-resolving dense head and a
    log-spaced evanescent tail.

    The Hankel grid's density (dk from the Bessel oscillation over the
    Bouchon period) is needed by the SYNTHESIS everywhere, but the
    kernels themselves only have fine k-structure in the propagating
    region k ≲ ω/v (surface-wave poles of width ~ζ/v ≈ dk); beyond
    ~1.3·ω_max/vs_min they are smooth exponential tails.  Solving on
    [dense head + log tail] and spline-expanding cuts the solve lattice
    by ~30-50× at regional-table scale.

    Returns ``(solve_grid, n_dense)`` with
    ``solve_grid[:n_dense] == k_grid[:n_dense]`` exactly.
    """
    vs_min = float(np.min(np.real(model.vs)))
    k_dense = 1.3 * w_abs / vs_min
    n_dense = int(np.searchsorted(k_grid, k_dense)) + 1
    if n_dense >= k_grid.size - 8:
        return k_grid, k_grid.size
    k_lo = k_grid[n_dense - 1]
    k_hi = k_grid[-1]
    n_tail = max(int(np.ceil(np.log10(k_hi / k_lo) * pts_per_decade)), 8)
    tail = np.geomspace(k_lo, k_hi, n_tail + 1)[1:]
    # make sure the spline domain covers the very last Hankel point
    tail[-1] = k_hi
    return np.concatenate([k_grid[:n_dense], tail]), n_dense


def _expand_kernels(kerns: dict, solve_grid: np.ndarray, n_dense: int,
                    k_grid: np.ndarray, zs: float) -> dict:
    """Expand kernels solved on the hybrid grid to the full Hankel grid:
    dense head copied verbatim; tail values de-trended by the dominant
    evanescent decay e^{-k·zs}, cubic-splined in ln k, re-trended.
    De-trending keeps the interpolant polynomial-smooth (the raw tail
    spans many orders of magnitude), holding the relative interpolation
    error at ~1e-7 for 128 points/decade."""
    if n_dense >= k_grid.size:
        return kerns
    from scipy.interpolate import CubicSpline

    k_tail_solve = solve_grid[n_dense - 1:]
    lnk_solve = np.log(k_tail_solve)
    k_tail_out = k_grid[n_dense:]
    lnk_out = np.log(k_tail_out)
    grow_s = np.exp(k_tail_solve * zs)
    decay_o = np.exp(-k_tail_out * zs)
    out = {}
    for name, v in kerns.items():
        full = np.empty((v.shape[0], k_grid.size), dtype=v.dtype)
        full[:, :n_dense] = v[:, :n_dense]
        g = v[:, n_dense - 1:] * grow_s
        full[:, n_dense:] = CubicSpline(lnk_solve, g, axis=1)(lnk_out) \
            * decay_o
        out[name] = full
    return out


def mt_spectra_kennett_bucket(model, zs_list, distances, w_list,
                              k_grid: np.ndarray, rel_step: float = 1e-3,
                              nf_chunk: int = 32) -> np.ndarray:
    """(nz, 6, 3, nd, nf) elementary-MT spectra for a GROUP of source
    depths sharing one wavenumber grid — the Kennett-recursion fast path.

    Numerically equivalent to :func:`elementary_mt_spectra_band` per
    depth, but structurally faster at table scale:

    * the interface sweeps of the R/T recursion are shared by every
      source depth in the bucket AND by the ±d finite-difference dipole
      (O(L) 2×2 ops per lattice point instead of the global matrix's
      O(L³) elimination);
    * the Bessel synthesis matrices are shared across depths (one fixed
      horizontal FD step ``d = rel_step·min(zs)`` — a smaller step for
      the deeper members, still far above the c128 cancellation floor);
    * Hankel synthesis batches all frequencies of a chunk into single
      real-valued GEMMs.
    """
    distances = np.asarray(distances, dtype=np.float64)
    zs_list = [float(z) for z in zs_list]
    w_list = np.asarray(w_list, dtype=np.complex128)
    nd, nz, nf = distances.size, len(zs_list), w_list.size
    d = rel_step * min(zs_list)

    r_x = np.hypot(d, distances)
    W0 = _hankel_weights(distances, k_grid)
    Wx = _hankel_weights(r_x, k_grid)
    Wym = _hankel_weights(distances - d, k_grid)
    Wyp = _hankel_weights(distances + d, k_grid)
    ones = np.ones(nd)
    zeros = np.zeros(nd)
    sphi_x = distances / r_x
    cphi_xp = -d / r_x
    cphi_xm = d / r_x
    m_xyz = np.stack([_m6_ned_to_xyz(row) for row in np.eye(6)])  # (6,3,3)

    zs_eval = []
    for zs in zs_list:
        zs_eval.extend((zs, zs + d, zs - d))
    zs_eval = sorted(set(zs_eval))

    w_abs = float(np.abs(w_list).max())
    solve_grid, n_dense = _hybrid_solve_grid(model, k_grid, w_abs)

    out = np.zeros((nz, 6, 3, nd, nf), dtype=np.complex128)
    for c0 in range(0, nf, nf_chunk):
        sl = slice(c0, min(c0 + nf_chunk, nf))
        w_c = w_list[sl]
        kerns = _kernels_band_safe(model, zs_eval, w_c, solve_grid)
        kerns = {zs: _expand_kernels(kerns[zs], solve_grid, n_dense,
                                     k_grid, zs) for zs in zs_eval}
        for iz, zs in enumerate(zs_list):
            kern0, kp, km = kerns[zs], kerns[zs + d], kerns[zs - d]
            mv_x = _hankel_apply_band(Wx, k_grid, kern0)
            G_xp = _G_assemble_band(mv_x, cphi_xp, sphi_x)
            G_xm = _G_assemble_band(mv_x, cphi_xm, sphi_x)
            G_yp = _G_assemble_band(
                _hankel_apply_band(Wym, k_grid, kern0), zeros, ones)
            G_ym = _G_assemble_band(
                _hankel_apply_band(Wyp, k_grid, kern0), zeros, ones)
            G_zp = _G_assemble_band(
                _hankel_apply_band(W0, k_grid, kp), zeros, ones)
            G_zm = _G_assemble_band(
                _hankel_apply_band(W0, k_grid, km), zeros, ones)
            dG = np.stack([(G_xp - G_xm) / (2 * d),
                           (G_yp - G_ym) / (2 * d),
                           (G_zp - G_zm) / (2 * d)], axis=-1)  # (nd,nfc,3,3,3)
            # moment step: 1/(iw'); project the 6 elementary MTs at once
            u = np.einsum("mpq,dfcpq->mdfc", m_xyz, dG) \
                / (1j * w_c)[None, None, :, None]
            out[iz, :, 0, :, sl] = -u[..., 2]       # Z up
            out[iz, :, 1, :, sl] = u[..., 1]        # R (north at az 0)
            out[iz, :, 2, :, sl] = u[..., 0]        # T (east at az 0)
    return out


def _depth_buckets(model, depths, r_max, T, w_abs, ppw, tail_coeff,
                   ratio: float = 2.0):
    """Group table depths so each bucket shares one wavenumber grid:
    k_max is dominated by the evanescent tail ``tail_coeff/zs``, so a
    single grid sized for the shallowest node would make every deep node
    integrate over up to ~10× more wavenumbers than it needs.  Buckets
    keep the shared grid within ``ratio`` of each member's own need."""
    def kmax(zs):
        vs_min = float(np.min(model.vs))
        return w_abs / vs_min * 1.05 + tail_coeff / max(zs, 1e3)

    order = sorted(range(len(depths)), key=lambda i: -kmax(depths[i]))
    buckets = []
    cur, cur_k = [], None
    for i in order:
        ki = kmax(depths[i])
        if cur and cur_k / ki > ratio:
            buckets.append(cur)
            cur, cur_k = [], None
        if not cur:
            cur_k = ki
        cur.append(i)
    if cur:
        buckets.append(cur)
    return buckets


# ---------------------------------------------------------------------------
# Table builder
# ---------------------------------------------------------------------------


def nudge_depths_off_interfaces(model, depths, rel_step: float = 1e-3):
    """Shift the (uniform) depth grid by a tiny constant offset until no
    node's vertical FD dipole (±rel_step·z) straddles a layer interface.
    The uniform shift keeps the grid bilinear-interpolation-friendly;
    the offset is ≲ a few times rel_step·depth (metres)."""
    depths = np.asarray(depths, dtype=np.float64).copy()

    def bad(z):
        d = 2.0 * rel_step * z          # 2x the FD step as safety margin
        return (model.layer_of(z - d) != model.layer_of(z + d)
                or model.layer_of(z) != model.layer_of(z + d))

    for _ in range(16):
        offenders = [z for z in depths if bad(z)]
        if not offenders:
            return depths
        shift = 3.0 * rel_step * max(offenders)
        depths = depths + shift
        logger.info("depth grid shifted %.3g m off a layer interface", shift)
    raise ValueError(
        f"could not place the depth grid clear of layer interfaces "
        f"{list(model.tops)} — choose depth bounds away from interfaces")


def build_layered_waveform_table(model, distances, depths, nt: int, dt: float,
                                 t0: float = 0.0, zeta_cycles: float = 1.0,
                                 rel_step: float = 1e-3, ppw: float = 1.2,
                                 fmax: float | None = None,
                                 tail_coeff: float = 50.0,
                                 method: str = "kennett"):
    """
    Build a :class:`GreensTable` for a 1-D layered model by the discrete
    wavenumber method — natively, with no external wavefield code.

    model : :class:`beat_tpu.heart.velocity_model.LayeredModel`
    distances, depths : table grid [m] (depths strictly inside layers,
        more than ``rel_step·depth`` away from interfaces)
    nt, dt, t0 : table time axis (responses to unit moment **steps**,
        matching ``build_homogeneous_table``'s convention so the STF
        pipeline applies unchanged)
    zeta_cycles : Bouchon damping ζ = ζ_cycles·π/(nt·dt); wrap-around is
        suppressed by e^{−π·ζ_cycles}
    fmax : optional synthesis cutoff [Hz] — spectra above it are left
        zero (band-limit for speed; datasets are bandpassed anyway)
    tail_coeff : evanescent-tail truncation of the k-grid (see
        :func:`dynamic_integration_grid`)
    method : 'kennett' (default) — vectorized Kennett R/T recursion
        with depth-bucketed shared k-grids, hybrid dense/log-tail solve
        lattice and frequency-batched Hankel GEMMs (~50× faster than
        'band' at regional-table scale; see beat_tpu.heart.reflectivity);
        'band' = global-matrix solves sharing one k-grid + Bessel
        matrices per depth; 'perfreq' = legacy per-frequency grids.
        All three are cross-validated against each other and against
        analytic ground truths (tests/test_reflectivity.py,
        tests/test_external_validation.py)

    Returns the table with spectra aligned to the ``t0`` time axis via
    :func:`beat_tpu.heart.store_convert.trace_to_spectrum`.
    """
    import jax.numpy as jnp

    from beat_tpu.heart.gftable import GreensTable
    from beat_tpu.heart.store_convert import trace_to_spectrum

    distances = np.asarray(distances, dtype=np.float64)
    depths = np.asarray(depths, dtype=np.float64)
    for zs in depths:
        d = rel_step * float(zs)
        if model.layer_of(zs - d) != model.layer_of(zs + d) or \
                model.layer_of(zs) != model.layer_of(zs + d):
            raise ValueError(
                f"depth node {zs:g} m is within rel_step·z = {d:g} m of a "
                f"layer interface (tops {list(model.tops)}): the vertical "
                f"finite-difference dipole would straddle the material "
                f"discontinuity — move the node or adjust the grid "
                f"(build_gfs nudges nodes automatically)")
    freqs = np.fft.rfftfreq(nt, dt)
    nf = freqs.size
    T = nt * dt
    zeta = zeta_cycles * np.pi / T
    r_max = float(distances.max())
    if fmax is None:
        fmax = freqs[-1]

    damped = np.zeros((6, 3, distances.size, depths.size, nf),
                      dtype=np.complex128)
    in_band = freqs <= fmax + 1e-12
    w_band = 2.0 * np.pi * freqs[in_band] - 1j * zeta

    if method == "kennett":
        # Kennett R/T recursion, depths bucketed onto shared k-grids
        w_abs = float(np.abs(w_band).max())
        for bucket in _depth_buckets(model, depths, r_max, T, w_abs,
                                     ppw, tail_coeff):
            zs_min = float(min(depths[i] for i in bucket))
            k_grid = dynamic_integration_grid(
                model, zs_min, r_max, T, w_abs, ppw=ppw,
                tail_coeff=tail_coeff)
            spec = mt_spectra_kennett_bucket(
                model, [depths[i] for i in bucket], distances, w_band,
                k_grid, rel_step)
            for jb, iz in enumerate(bucket):
                damped[:, :, :, iz, in_band] = spec[jb]
            logger.info("layered waveform table: %i depths done on a "
                        "%i-point k-grid (%i freqs, %i distances)",
                        len(bucket), k_grid.size, len(w_band),
                        distances.size)

    for iz, zs in enumerate(depths):
        if method == "kennett":
            break
        if method == "band":
            k_grid = dynamic_integration_grid(
                model, zs, r_max, T, float(np.abs(w_band).max()),
                ppw=ppw, tail_coeff=tail_coeff)
            damped[:, :, :, iz, in_band] = elementary_mt_spectra_band(
                model, zs, distances, w_band, k_grid, rel_step)
        elif method == "perfreq":
            for jf, f in enumerate(freqs):
                if f > fmax + 1e-12:
                    continue
                w_c = 2.0 * np.pi * f - 1j * zeta
                k_grid = dynamic_integration_grid(
                    model, zs, r_max, T, abs(w_c), ppw=ppw,
                    tail_coeff=tail_coeff)
                damped[:, :, :, iz, jf] = elementary_mt_spectra(
                    model, zs, distances, w_c, k_grid, rel_step)
        else:
            raise ValueError(f"method must be 'kennett', 'band' or "
                             f"'perfreq', got {method!r}")
        logger.info("layered waveform table: depth %g m done (%i freqs, "
                    "%i distances)", zs, nf, distances.size)

    # undo the Bouchon damping in the time domain, align to t0
    t_rel = np.arange(nt) * dt
    growth = np.exp(zeta * t_rel)
    spectra = np.zeros_like(damped)
    for idx in np.ndindex(6, 3, distances.size, depths.size):
        tr = np.fft.irfft(damped[idx], n=nt) * growth
        spectra[idx] = trace_to_spectrum(tr, tmin=0.0, dt_in=dt,
                                         nt=nt, dt=dt, t0=t0)

    # ray-traced first-arrival tables for window placement
    from beat_tpu.heart.velocity_model import travel_times

    tt_p = np.stack([travel_times(model, zs, distances, "p")
                     for zs in depths], axis=-1)
    tt_s = np.stack([travel_times(model, zs, distances, "s")
                     for zs in depths], axis=-1)

    vp_eff, vs_eff = _effective_velocities(model, float(np.median(depths)))
    pairs = np.stack([spectra.real, spectra.imag], axis=-1).astype(np.float32)
    logger.info("Built layered waveform GF table: %i dist x %i depth x %i "
                "samples (DWN, ζ=%g)", distances.size, depths.size, nt, zeta)
    return GreensTable(spectra=jnp.asarray(pairs), distances=distances,
                       depths=depths, dt=dt, nt=nt, t0=t0,
                       vp=vp_eff, vs=vs_eff, rho=float(model.rho[0]),
                       tt_p=tt_p, tt_s=tt_s)


def _effective_velocities(model, zs: float) -> tuple:
    """Straight-ray effective (vp, vs) down to the source depth (travel-
    time estimates only; arrival windows should use the ray tracer of
    :mod:`beat_tpu.heart.velocity_model` or picked arrivals)."""
    tops = np.append(model.tops, zs + 1e9)
    t_p = t_s = 0.0
    z_cum = 0.0
    for i in range(model.nlayers):
        h = min(tops[i + 1], zs) - tops[i]
        if h <= 0:
            break
        t_p += h / model.vp[i]
        t_s += h / model.vs[i]
        z_cum += h
    if z_cum <= 0:
        return float(model.vp[0]), float(model.vs[0])
    return z_cum / t_p, z_cum / t_s
