"""
Kennett reflection/transmission recursion for the layered waveform GFs —
the fast solver behind :mod:`beat_tpu.heart.layered_waveforms`.

The global-matrix solver (``layered_waveforms._solve_psv_dyn``) assembles
one dense (4L+2)-sized complex system per (ω, k) and eliminates it — an
O(L³) cost per lattice point that dominates real-scale table builds.
This module computes the identical surface kernels by the standard
reflectivity recursion (Kennett 1983; Müller 1985): per layer a handful
of 2×2 complex operations (scalars for SH), fully vectorized over the
whole (frequency × wavenumber) lattice at once, unconditionally stable
through decay-normalized layer phases (all |e^{-νh}| ≤ 1).

Performance notes (single-host numpy path):

* Every 2×2 matrix over the lattice is stored as FOUR separate
  contiguous arrays (a tuple ``(m00, m01, m10, m11)``), never as a
  trailing ``(..., 2, 2)`` axis — trailing tiny dims make every
  elementwise pass 4×-strided and were measured 4-6× slower.
* All small solves (interface R/T, source decomposition) are closed-form
  2×2 block Schur eliminations — no generic batched Gaussian
  elimination, whose pivot bookkeeping costs more memory traffic than
  the arithmetic.
* The interface sweeps depend only on the model — NOT the source depth:
  one bottom-up sweep (R_D below every interface) + one top-down sweep
  (stack above every layer) are shared by ALL source depths — the
  finite-difference source dipole (zs, zs±d) and every depth node of a
  GF table bucket reuse them.
* Everything is elementwise → trivially JAX-able for on-chip builds.

Conventions identical to :mod:`layered_waveforms` (same wave columns,
source jumps, stress scaling), validated by
``tests/test_reflectivity.py``: kernels match ``dynamic_force_kernels``
to ~1e-8 at waveform frequencies; the ω → 0 P-SV basis degeneracy is
handled upstream by precision escalation
(``layered_waveforms._kernels_band_safe``).

Reference: the qseis/qssp Fortran engines the upstream framework shells
out to (``beat/heart.py:2126-2330``) implement this same family of
methods.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# 2x2 algebra on component tuples (m00, m01, m10, m11) — all contiguous
# ---------------------------------------------------------------------------


def _mmul(A, B):
    a, b, c, d = A
    e, f, g, h = B
    return (a * e + b * g, a * f + b * h, c * e + d * g, c * f + d * h)


def _minv(A):
    a, b, c, d = A
    det = a * d - b * c
    return (d / det, -b / det, -c / det, a / det)


def _msub_eye(A):
    """I - A"""
    a, b, c, d = A
    return (1.0 - a, -b, -c, 1.0 - d)


def _mdress(E, A):
    """diag(E) @ A @ diag(E) for E = (e0, e1)."""
    a, b, c, d = A
    e0, e1 = E
    return (e0 * a * e0, e0 * b * e1, e1 * c * e0, e1 * d * e1)


def _mzero_like(x):
    z = np.zeros_like(x)
    return (z, z.copy(), z.copy(), z.copy())


# ---------------------------------------------------------------------------
# Per-layer wave columns (z-independent, normalized once per layer)
# ---------------------------------------------------------------------------


class _LayerWaves:
    """Normalized P-SV + SH wave columns of one material over the
    lattice.  Raw entries follow ``layered_waveforms._psv_wave_entries``
    exactly (same potentials and sign conventions); stress rows are
    pre-divided by ``stress_scale`` and each column by its max-abs
    entry, so the block solves stay well-conditioned and amplitudes are
    consistent everywhere the layer appears.

    Column blocks are stored as 2×2 component tuples:
    ``Du/Ds`` = displacement/stress blocks of [P down, SV down],
    ``Uu/Us`` = same for [P up, SV up]; SH columns as (W, T) pairs.
    """

    __slots__ = ("nu_a", "nu_b", "nu_sh", "Du", "Ds", "Uu", "Us",
                 "sh_D", "sh_U")

    def __init__(self, lam, mu, rho, w2, k, stress_scale,
                 dtype=np.complex128):
        k = np.asarray(k)
        va2 = (lam + 2 * mu) / rho
        vb2 = mu / rho
        nu_a = np.sqrt((k * k - w2 / va2).astype(dtype))
        nu_b = np.sqrt((k * k - w2 / vb2).astype(dtype))
        self.nu_a, self.nu_b = nu_a, nu_b
        self.nu_sh = nu_b

        kk = (k * k).astype(dtype) + np.zeros_like(nu_a)
        kc = k.astype(dtype) + np.zeros_like(nu_a)
        p_even = (2 * mu * nu_a**2 - lam * (w2 / va2)) / stress_scale \
            + np.zeros_like(nu_a)
        s_even = (mu * k * (nu_b**2 + k * k)) / stress_scale \
            + np.zeros_like(nu_a)
        pk2 = 2 * mu * nu_a * kc / stress_scale        # P col S entry (+up)
        sk2 = 2 * mu * nu_b * kk / stress_scale        # SV col P entry (+up)

        def norm4(u, v, p, s):
            n = np.maximum(np.maximum(np.abs(u), np.abs(v)),
                           np.maximum(np.abs(p), np.abs(s)))
            return u / n, v / n, p / n, s / n

        # raw columns (layered_waveforms._psv_wave_entries):
        # P (s=±1):  U = s·ν_α, V = k,     P = p_even, S = s·2µν_α k
        # SV (s=±1): U = k²,    V = s·ν_β k, P = s·2µν_β k², S = s_even
        uPd, vPd, pPd, sPd = norm4(-nu_a, kc, p_even, -pk2)
        uSd, vSd, pSd, sSd = norm4(kk, -nu_b * kc, -sk2, s_even)
        uPu, vPu, pPu, sPu = norm4(nu_a, kc, p_even, pk2)
        uSu, vSu, pSu, sSu = norm4(kk, nu_b * kc, sk2, s_even)
        self.Du = (uPd, uSd, vPd, vSd)
        self.Ds = (pPd, pSd, sPd, sSd)
        self.Uu = (uPu, uSu, vPu, vSu)
        self.Us = (pPu, pSu, sPu, sSu)

        # SH columns y = (W, T), T = µ ∂_z W
        t_dn = -mu * nu_b / stress_scale
        t_up = mu * nu_b / stress_scale
        n_dn = np.maximum(np.abs(t_dn), 1.0)
        n_up = np.maximum(np.abs(t_up), 1.0)
        self.sh_D = (1.0 / n_dn, t_dn / n_dn)
        self.sh_U = (1.0 / n_up, t_up / n_up)


def _madd(A, B):
    return tuple(x + y for x, y in zip(A, B))


def _msub(A, B):
    return tuple(x - y for x, y in zip(A, B))


def _interface_rt(a: _LayerWaves, b: _LayerWaves):
    """Local welded-contact R/T at one interface by 2×2 block Schur:
    down incidence from above solves ``[U_a, -D_b][r_d; t_d] = -D_a``
    (continuity of (U, V, P, S)), up incidence from below solves
    ``[D_b, -U_a][r_u; t_u] = -U_b``."""
    iUu_a = _minv(a.Uu)
    S = _mmul(a.Us, iUu_a)
    t_d = _mmul(_minv(_msub(_mmul(S, b.Du), b.Ds)),
                _msub(_mmul(S, a.Du), a.Ds))
    r_d = _mmul(iUu_a, _msub(_mmul(b.Du, t_d), a.Du))

    iDu_b = _minv(b.Du)
    Sb = _mmul(b.Ds, iDu_b)
    t_u = _mmul(_minv(_msub(_mmul(Sb, a.Uu), a.Us)),
                _msub(_mmul(Sb, b.Uu), b.Us))
    r_u = _mmul(iDu_b, _msub(_mmul(a.Uu, t_u), b.Uu))

    # SH (scalars): [a_up, -b_dn][r; t] = -a_dn  /  [b_dn, -a_up] etc.
    aD0, aD1 = a.sh_D
    aU0, aU1 = a.sh_U
    bD0, bD1 = b.sh_D
    bU0, bU1 = b.sh_U
    det_d = -aU0 * bD1 + bD0 * aU1
    rs_d = (aD0 * bD1 - bD0 * aD1) / det_d
    ts_d = (-aU0 * aD1 + aD0 * aU1) / det_d
    det_u = -bD0 * aU1 + aU0 * bD1
    rs_u = (bU0 * aU1 - aU0 * bU1) / det_u
    ts_u = (-bD0 * bU1 + bU0 * bD1) / det_u
    return (r_d, t_d, r_u, t_u), (rs_d, ts_d, rs_u, ts_u)


# ---------------------------------------------------------------------------
# Region composition (Kennett addition rules)
# ---------------------------------------------------------------------------


class _Region:
    """R/T matrices of a stack between two levels: with d_t/u_t the
    down/up amplitudes at the top and d_b/u_b at the bottom,
    ``u_t = R_D d_t + T_U u_b`` and ``d_b = T_D d_t + R_U u_b``."""

    __slots__ = ("R_D", "T_D", "R_U", "T_U")

    def __init__(self, R_D, T_D, R_U, T_U):
        self.R_D, self.T_D, self.R_U, self.T_U = R_D, T_D, R_U, T_U

    @classmethod
    def empty(cls, proto):
        z = np.zeros_like(proto)
        one = np.ones_like(proto)
        eye = (one, z, z.copy(), one.copy())
        zero = (z.copy(), z.copy(), z.copy(), z.copy())
        return cls(zero, eye,
                   tuple(x.copy() for x in zero),
                   tuple(x.copy() for x in eye))

    def below(self, other: "_Region") -> "_Region":
        """self stacked ABOVE other."""
        Q = _minv(_msub_eye(_mmul(self.R_U, other.R_D)))
        QT = _mmul(Q, self.T_D)
        R_D = _madd(self.R_D, _mmul(self.T_U, _mmul(other.R_D, QT)))
        T_D = _mmul(other.T_D, QT)
        Q2 = _minv(_msub_eye(_mmul(other.R_D, self.R_U)))
        T_U = _mmul(self.T_U, _mmul(Q2, other.T_U))
        R_U = _madd(other.R_U,
                    _mmul(other.T_D, _mmul(Q, _mmul(self.R_U, other.T_U))))
        return _Region(R_D, T_D, R_U, T_U)

    def add_phase_below(self, E):
        """Append a uniform layer (diag phase E = (e_α, e_β)) below."""
        e0, e1 = E
        a, b, c, d = self.T_D
        T_D = (e0 * a, e0 * b, e1 * c, e1 * d)       # E @ T_D
        a, b, c, d = self.T_U
        T_U = (a * e0, b * e1, c * e0, d * e1)       # T_U @ E
        return _Region(self.R_D, T_D, _mdress(E, self.R_U), T_U)


class _RegionSH:
    __slots__ = ("R_D", "T_D", "R_U", "T_U")

    def __init__(self, R_D, T_D, R_U, T_U):
        self.R_D, self.T_D, self.R_U, self.T_U = R_D, T_D, R_U, T_U

    @classmethod
    def empty(cls, proto):
        z = np.zeros_like(proto)
        return cls(z, np.ones_like(proto), z.copy(), np.ones_like(proto))

    def below(self, other):
        Q = 1.0 / (1.0 - self.R_U * other.R_D)
        QT = Q * self.T_D
        return _RegionSH(self.R_D + self.T_U * other.R_D * QT,
                         other.T_D * QT,
                         other.R_U + other.T_D * Q * self.R_U * other.T_U,
                         self.T_U * Q * other.T_U)

    def add_phase_below(self, e):
        return _RegionSH(self.R_D, e * self.T_D,
                         e * self.R_U * e, self.T_U * e)


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------


class ReflectivitySolver:
    """Precomputes the source-independent interface sweeps of one model
    over one (w2, k) lattice; :meth:`force_kernels` then evaluates any
    number of source depths against them cheaply.

    Anelastic Q enters as constant-Q complex velocities through complex
    Lamé moduli (same as ``layered_waveforms._split_layers_rho``);
    ``stress_scale`` is the same conditioning divisor as the
    global-matrix solver, so the two paths share column normalizations.
    """

    def __init__(self, model, w2, k, dtype=np.complex128):
        self.dtype = dtype
        w2 = np.asarray(w2, dtype=dtype)
        rdtype = np.real(np.zeros(1, dtype)).dtype
        k = np.asarray(k, dtype=rdtype)
        tops = np.asarray(model.tops, dtype=np.float64)
        vp, vs, rho = model.vp, model.vs, model.rho
        if getattr(model, "qp", None) is not None:
            vp = vp * (1.0 + 0.5j / model.qp)
        if getattr(model, "qs", None) is not None:
            vs = vs * (1.0 + 0.5j / model.qs)
        lam = rho * (vp**2 - 2 * vs**2)
        mu = rho * vs**2
        self.tops = tops
        self.thick = np.diff(tops)
        L = tops.size

        w_abs = np.sqrt(np.abs(w2)).astype(rdtype)
        vs_min = float(np.min(np.real(model.vs)))
        mu0 = float(np.median(model.rho * model.vs**2))
        stress_scale = (mu0 * (k + w_abs / vs_min)).astype(rdtype)
        self._jump_scale = stress_scale

        self.layers = [
            _LayerWaves(lam[i], mu[i], rho[i], w2, k, stress_scale,
                        dtype=dtype)
            for i in range(L)
        ]
        proto = self.layers[0].nu_a

        # layer phase pairs e^{-nu h} for finite layers
        self._E = [None] * L
        self._E_sh = [None] * L
        for i in range(L - 1):
            h = self.thick[i]
            self._E[i] = (np.exp(-self.layers[i].nu_a * h),
                          np.exp(-self.layers[i].nu_b * h))
            self._E_sh[i] = np.exp(-self.layers[i].nu_sh * h)

        iface = {}
        iface_sh = {}
        for i in range(1, L):
            iface[i], iface_sh[i] = _interface_rt(self.layers[i - 1],
                                                  self.layers[i])

        # bottom-up sweep: composite R_D of everything below interface i
        # (at depth tops[i]), referenced AT tops[i]
        self._rbelow = [None] * L
        self._rbelow_sh = [None] * L
        R = _mzero_like(proto)
        Rs = np.zeros_like(proto)
        for i in range(L - 1, 0, -1):
            r_d, t_d, r_u, t_u = iface[i]
            rs_d, ts_d, rs_u, ts_u = iface_sh[i]
            if i < L - 1:
                Rd = _mdress(self._E[i], R)
                e = self._E_sh[i]
                Rds = e * Rs * e
            else:
                Rd = _mzero_like(proto)
                Rds = np.zeros_like(proto)
            Q = _minv(_msub_eye(_mmul(r_u, Rd)))
            R = _madd(r_d, _mmul(t_u, _mmul(Rd, _mmul(Q, t_d))))
            Rs = rs_d + ts_u * Rds * ts_d / (1.0 - rs_u * Rds)
            self._rbelow[i] = R
            self._rbelow_sh[i] = Rs

        # top-down sweep: welded region [surface .. tops[j]] per layer j
        self._above = [None] * L
        self._above_sh = [None] * L
        reg = _Region.empty(proto)
        reg_sh = _RegionSH.empty(proto)
        self._above[0] = reg
        self._above_sh[0] = reg_sh
        for j in range(1, L):
            reg = reg.add_phase_below(self._E[j - 1])
            reg_sh = reg_sh.add_phase_below(self._E_sh[j - 1])
            reg = reg.below(_Region(*iface[j]))
            reg_sh = reg_sh.below(_RegionSH(*iface_sh[j]))
            self._above[j] = reg
            self._above_sh[j] = reg_sh

        # free-surface reflection from layer-0 stress rows: P=S=0 at z=0
        top = self.layers[0]
        self._R_F = _mmul(_minv(top.Ds), tuple(-x for x in top.Us))
        self._R_F_sh = -top.sh_U[1] / top.sh_D[1]

        # receiver operator: displacement rows at z=0
        recv = _madd(top.Uu, _mmul(top.Du, self._R_F))
        recv_sh = top.sh_U[0] + top.sh_D[0] * self._R_F_sh

        # per-layer "above incl. free surface" pieces referenced at
        # tops[j]: R_U_hat = R_U + T_D R_F (I − R_D R_F)^{-1} T_U and the
        # surface-arrival operator W_j = recv (I − R_D R_F)^{-1} T_U
        self._ruhat = [None] * L
        self._ruhat_sh = [None] * L
        self._wsurf = [None] * L
        self._wsurf_sh = [None] * L
        for j in range(L):
            A = self._above[j]
            Qf = _minv(_msub_eye(_mmul(A.R_D, self._R_F)))
            QT = _mmul(Qf, A.T_U)
            self._ruhat[j] = _madd(A.R_U,
                                   _mmul(A.T_D, _mmul(self._R_F, QT)))
            self._wsurf[j] = _mmul(recv, QT)
            As = self._above_sh[j]
            qf = 1.0 / (1.0 - As.R_D * self._R_F_sh)
            self._ruhat_sh[j] = As.R_U + As.T_D * self._R_F_sh * qf * As.T_U
            self._wsurf_sh[j] = recv_sh * qf * As.T_U

    # -- per-source evaluation ------------------------------------------

    def layer_of(self, zs: float) -> int:
        j = int(np.searchsorted(self.tops, zs, side="right") - 1)
        if j < 0 or zs <= self.tops[0]:
            raise ValueError(f"source depth {zs} above the model top")
        return j

    def force_kernels(self, zs: float) -> dict:
        """Surface displacement kernels of buried unit point forces —
        same five outputs and conventions as
        ``layered_waveforms.dynamic_force_kernels``, over the whole
        lattice at once."""
        j = self.layer_of(zs)
        lay = self.layers[j]

        dz_top = zs - self.tops[j]
        e_up = (np.exp(-lay.nu_a * dz_top), np.exp(-lay.nu_b * dz_top))
        e_up_sh = np.exp(-lay.nu_sh * dz_top)
        if j < len(self.tops) - 1:
            dz_bot = self.tops[j + 1] - zs
            e_dn = (np.exp(-lay.nu_a * dz_bot), np.exp(-lay.nu_b * dz_bot))
            e_dn_sh = np.exp(-lay.nu_sh * dz_bot)
            R_D_hat = _mdress(e_dn, self._rbelow[j + 1])
            R_D_hat_sh = e_dn_sh * self._rbelow_sh[j + 1] * e_dn_sh
        else:
            R_D_hat = _mzero_like(lay.nu_a)
            R_D_hat_sh = np.zeros_like(lay.nu_a)

        R_U_hat = _mdress(e_up, self._ruhat[j])
        R_U_hat_sh = e_up_sh * self._ruhat_sh[j] * e_up_sh

        # source jumps (below − above) in scaled (U, V, P, S) variables:
        # vertical force ΔP = −1/2π, horizontal ΔS = −1/2π, SH ΔT same.
        # Decompose j = D σ_D − U σ_U by block Schur: displacement rows
        # give σ_D = Du^{-1} Uu σ_U; stress rows then
        # (Ds Du^{-1} Uu − Us) σ_U = j_s.  The two RHS stress vectors are
        # (jp, 0) and (0, js) = diag(c, c), so σ_U = c · Schur^{-1}.
        c = (-1.0 / (2.0 * np.pi)) / self._jump_scale
        iDu = _minv(lay.Du)
        G = _mmul(iDu, lay.Uu)
        iS = _minv(_msub(_mmul(lay.Ds, G), lay.Us))
        sU = (iS[0] * c, iS[1] * c, iS[2] * c, iS[3] * c)
        sD = _mmul(G, sU)

        # reverberation at source level, then propagate to the surface:
        # u0 = wsurf · E_up · (I − R̂_D R̂_U)^{-1} (σ_U + R̂_D σ_D)
        Q = _minv(_msub_eye(_mmul(R_D_hat, R_U_hat)))
        src = _madd(sU, _mmul(R_D_hat, sD))
        e0, e1 = e_up
        W = self._wsurf[j]
        W = (W[0] * e0, W[1] * e1, W[2] * e0, W[3] * e1)   # wsurf @ E_up
        u0 = _mmul(W, _mmul(Q, src))

        # SH: scalar jump (0, c) decomposed on [D, −U] by Cramer
        D0, D1 = lay.sh_D
        U0c, U1c = lay.sh_U
        det = -D0 * U1c + U0c * D1
        s_D = (U0c * c) / det
        s_U = (D0 * c) / det
        q_sh = 1.0 / (1.0 - R_D_hat_sh * R_U_hat_sh)
        w_sh = self._wsurf_sh[j] * e_up_sh * q_sh * (s_U + R_D_hat_sh * s_D)

        # u0 columns = [vertical-force RHS, horizontal-force RHS];
        # rows = (U, V) at the surface
        return {"U0": u0[0], "V0": u0[2],
                "U1": u0[1], "V1": u0[3],
                "W1": w_sh}


def reflectivity_force_kernels(model, zs: float, w_c, k_grid,
                               dtype=np.complex128) -> dict:
    """One-shot convenience wrapper matching
    ``dynamic_force_kernels(model, zs, w_c, k_grid)`` for a scalar
    complex frequency (used by the equivalence tests)."""
    w_c = np.asarray(w_c, dtype=dtype)
    solver = ReflectivitySolver(model, (w_c * w_c).reshape(-1, 1),
                                np.asarray(k_grid)[None, :], dtype=dtype)
    kern = solver.force_kernels(zs)
    if w_c.ndim == 0:
        return {n: v[0] for n, v in kern.items()}
    return kern
