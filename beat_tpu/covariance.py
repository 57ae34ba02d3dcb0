"""
Noise covariance models, weight factorisation, and sampler covariances.

Host-side (numpy, float64) re-design of ``beat/covariance.py`` and the
``Covariance`` container from ``beat/heart.py:104-264``.  Estimation runs
between SMC stages on small host arrays; the products consumed on device
are the per-dataset inverse-Cholesky weight matrices and log-determinants
(see :mod:`beat_tpu.distributions`).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np
import scipy.linalg

from beat_tpu.utility import distances, ensure_cov_psd, running_window_rms

logger = logging.getLogger("beat_tpu.covariance")


# ---------------------------------------------------------------------------
# Covariance container (reference heart.Covariance, beat/heart.py:104-264)
# ---------------------------------------------------------------------------


def log_determinant(A: np.ndarray, inverse: bool = False) -> float:
    """Log determinant via Cholesky (reference ``heart.log_determinant`` :65)."""
    chol = scipy.linalg.cholesky(A, lower=True)
    ldet = 2.0 * np.sum(np.log(np.diag(chol)))
    return -ldet if inverse else ldet


def chol_inverse(C: np.ndarray) -> np.ndarray:
    """
    Inverse of the lower Cholesky factor of ``C`` — the weight matrix ``W``
    with ``W C Wᵀ = I``.  Falls back to a QR-based factorisation when ``C``
    is not positive definite (reference ``heart.py:212-237``).
    """
    C = np.asarray(C, dtype=np.float64)
    try:
        L = scipy.linalg.cholesky(C, lower=True)
    except scipy.linalg.LinAlgError:
        logger.warning("Covariance not positive definite — QR/PSD-repair fallback")
        C = ensure_cov_psd(C)
        L = scipy.linalg.cholesky(C, lower=True)
    W = scipy.linalg.solve_triangular(L, np.eye(C.shape[0]), lower=True)
    if np.isnan(W).any() or np.isinf(W).any():
        raise ValueError("chol_inverse contains NaN/Inf")
    return W


@dataclass
class Covariance:
    """
    Dataset noise covariance split into data / prediction parts
    (reference ``heart.Covariance``).  ``total = data + pred_g + pred_v``.
    """

    data: np.ndarray | None = None
    pred_g: np.ndarray | None = None
    pred_v: np.ndarray | None = None

    def _parts(self):
        return [p for p in (self.data, self.pred_g, self.pred_v) if p is not None]

    @property
    def p_total(self) -> np.ndarray:
        parts = self._parts()
        if not parts:
            raise ValueError("Covariance has no parts set")
        total = np.zeros_like(parts[0])
        for p in parts:
            total = total + p
        return total

    @property
    def chol_inverse(self) -> np.ndarray:
        return chol_inverse(self.p_total)

    @property
    def log_pdet(self) -> float:
        return log_determinant(ensure_cov_psd(self.p_total))

    @property
    def inverse(self) -> np.ndarray:
        W = self.chol_inverse
        return W.T @ W

    def get_min_max_components(self):
        t = self.p_total
        return float(t.min()), float(t.max())


# ---------------------------------------------------------------------------
# Structure generators (reference covariance.py:24-105)
# ---------------------------------------------------------------------------


def exponential_data_covariance(n: int, dt: float, tzero: float) -> np.ndarray:
    """C_ij = σ² exp(-|i-j|·dt/tzero) with σ² set like the reference :24."""
    idx = np.arange(n)
    return np.exp(-np.abs(idx[:, None] - idx[None, :]) * dt / tzero)


def identity_data_covariance(n: int, dt: float = 0.0, tzero: float = 0.0) -> np.ndarray:
    return np.eye(n)


def ones_data_covariance(n: int, dt: float = 0.0, tzero: float = 0.0) -> np.ndarray:
    return np.ones((n, n)) + np.eye(n) * 1e-6


noise_structure_catalog = {
    "exponential": exponential_data_covariance,
    "identity": identity_data_covariance,
    "import": identity_data_covariance,
    "ones": ones_data_covariance,
    "variance": identity_data_covariance,
    "non-toeplitz": identity_data_covariance,
}


# ---------------------------------------------------------------------------
# Non-Toeplitz noise estimation (Dettmer et al. 2007)
# Reference: beat/covariance.py:716-849
# ---------------------------------------------------------------------------


def autocovariance(data: np.ndarray) -> np.ndarray:
    """Biased sample autocovariance of a 1-d series (reference :716)."""
    n = data.size
    meand = data.mean()
    centered = data - meand
    acov = np.correlate(centered, centered, mode="full")[n - 1:] / n
    return acov


def toeplitz_covariance(data: np.ndarray, window_size: int):
    """
    Symmetric Toeplitz covariance from the autocovariance of the
    RMS-normalised residual, plus the running-window RMS scale
    (reference :739).
    """
    data = np.asarray(data, dtype=np.float64)
    stds = running_window_rms(data, window_size=window_size, mode="same")
    acov = autocovariance(data / stds)
    return scipy.linalg.toeplitz(acov), stds


def non_toeplitz_covariance(data: np.ndarray, window_size: int) -> np.ndarray:
    """
    Non-stationary covariance: Toeplitz base scaled by the outer product of
    running RMS (reference :754).  ``window_size`` defaults to n/5 in
    callers.
    """
    toep, stds = toeplitz_covariance(data, window_size)
    return toep * np.outer(stds, stds)


def k_nearest_neighbor_rms(coords: np.ndarray, data: np.ndarray,
                           k: int | None = None,
                           max_dist_perc: float | None = 0.2) -> np.ndarray:
    """
    Per-point RMS over neighbours — either the ``k`` nearest or all
    within ``max_dist_perc`` of the scene extent (reference
    ``covariance.py:774-812``; KDTree, not the O(N²) scan).
    """
    from scipy.spatial import cKDTree

    if (k is None) == (max_dist_perc is None):
        raise ValueError("Define either k or max_dist_perc (exactly one)")
    tree = cKDTree(coords)
    rms = np.empty(data.size)
    if k is not None:
        _, idxs = tree.query(coords, k=k)
        idxs = np.reshape(idxs, (data.size, -1))  # k=1 squeezes the axis
        return np.sqrt(np.mean(data[idxs] ** 2, axis=-1))
    span = coords.max(axis=0) - coords.min(axis=0)
    radius = float(np.linalg.norm(span)) * max_dist_perc
    for i, idxs in enumerate(tree.query_ball_point(coords, r=radius)):
        rms[i] = np.sqrt(np.mean(data[idxs] ** 2))
    return rms


def toeplitz_covariance_2d(coords: np.ndarray, data: np.ndarray, max_dist_perc: float = 0.2):
    """2-d analogue: autocovariance over distance bins (reference :814)."""
    stds = k_nearest_neighbor_rms(coords, data, max_dist_perc=max_dist_perc)
    acov = autocovariance(data / stds)
    return scipy.linalg.toeplitz(acov), stds


def non_toeplitz_covariance_2d(coords: np.ndarray, data: np.ndarray, max_dist_perc: float = 0.2) -> np.ndarray:
    """Spatial non-stationary covariance for InSAR scenes (reference :831)."""
    toep, stds = toeplitz_covariance_2d(coords, data, max_dist_perc)
    return ensure_cov_psd(toep * np.outer(stds, stds))


# ---------------------------------------------------------------------------
# Noise analysers (reference covariance.py:154-360)
# ---------------------------------------------------------------------------


@dataclass
class SeismicNoiseAnalyser:
    """
    Estimate data covariance of waveform datasets
    (reference ``covariance.SeismicNoiseAnalyser`` :236).

    structure: 'variance' (pre-arrival window variance × identity),
    'exponential', 'import', 'non-toeplitz'.
    """

    structure: str = "variance"
    pre_arrival_time: float = 5.0

    def get_data_covariance(self, ydata: np.ndarray, dt: float,
                            arrival_index: int | None = None,
                            residual: np.ndarray | None = None,
                            noise: np.ndarray | None = None) -> np.ndarray:
        """Covariance over the samples of ``ydata`` (the FIT window — the
        returned matrix is (ydata.size, ydata.size)).  ``noise``: the
        pre-arrival noise segment setting the variance level; without it
        the first ``arrival_index``/``pre_arrival_time`` samples of
        ``ydata`` are used."""
        n = ydata.size
        if noise is None:
            cut = (arrival_index if arrival_index is not None
                   else max(2, int(self.pre_arrival_time / dt)))
            noise = ydata[:cut]
        var = float(np.var(noise)) if noise.size > 1 else float(np.var(ydata))
        var = max(var, 1e-30)
        if self.structure == "variance":
            return np.eye(n) * var
        elif self.structure == "exponential":
            return exponential_data_covariance(n, dt, tzero=max(dt * 4, 0.5)) * var
        elif self.structure == "non-toeplitz":
            res = residual if residual is not None else ydata
            return non_toeplitz_covariance(res, window_size=max(4, res.size // 5))
        elif self.structure == "import":
            return np.eye(n)
        raise ValueError(f"Unknown noise structure {self.structure}")


@dataclass
class GeodeticNoiseAnalyser:
    """Reference ``covariance.GeodeticNoiseAnalyser`` :154."""

    structure: str = "import"
    max_dist_perc: float = 0.2

    def get_data_covariance(self, coords: np.ndarray, displacement: np.ndarray,
                            imported: np.ndarray | None = None,
                            residual: np.ndarray | None = None) -> np.ndarray:
        n = displacement.size
        if self.structure == "import":
            if imported is None:
                var = max(float(np.var(displacement)), 1e-30)
                return np.eye(n) * var
            return imported
        elif self.structure == "non-toeplitz":
            res = residual if residual is not None else displacement
            return non_toeplitz_covariance_2d(coords, res, self.max_dist_perc)
        raise ValueError(f"Unknown noise structure {self.structure}")


# ---------------------------------------------------------------------------
# Model-prediction covariances from forward-model ensembles
# (reference covariance.py:561-660: seismic/geodetic_cov_velocity_models)
# ---------------------------------------------------------------------------


def prediction_covariance_from_ensemble(predictions: np.ndarray) -> np.ndarray:
    """
    Covariance of forward-model predictions over an ensemble of earth
    models (reference ``seismic_cov_velocity_models`` :561 /
    ``geodetic_cov_velocity_models`` :625: synthetics are computed for
    ``crust_ind`` model variations and their sample covariance becomes
    ``Covariance.pred_v``).

    predictions : (n_models, nsamples) synthetic data per ensemble member.
    """
    predictions = np.asarray(predictions, dtype=np.float64)
    if predictions.shape[0] < 2:
        raise ValueError("need >= 2 ensemble members for a prediction covariance")
    return ensure_cov_psd(np.cov(predictions, rowvar=False, bias=False))


def seismic_cov_velocity_models(composite, point: dict, ensemble_tables,
                                wmap_idx: int = 0) -> list:
    """
    Per-dataset prediction covariances for one wavemap from an ensemble of
    Green's-function tables (velocity-model variations; the reference runs
    a fork pool over crust_inds — here each member is one vmapped forward).
    Returns a list of (nsamples, nsamples) matrices, one per dataset.
    """
    import jax.numpy as jnp

    wmap = composite.wavemaps[wmap_idx]
    base_dev = composite._device[wmap_idx]
    jpoint = {k: jnp.asarray(v) for k, v in point.items()}
    preds = []
    try:
        for table in ensemble_tables:
            # the forward reads the device bundle — swap only the two
            # table-dependent entries (same fit windows: window starts/
            # tapers stay those of the reference model).  Rebuilding the
            # whole bundle would re-factorize every dataset covariance
            # (O(n³) Choleskys) per ensemble member for nothing.
            dev = dict(base_dev)
            dev["table"] = table
            dev["win_basis"] = table.windowed_ibasis(
                wmap.window_starts, wmap.taper_window, wmap.nsamples_win)
            composite._device[wmap_idx] = dev
            preds.append(np.asarray(composite.synthetics_fit(jpoint, wmap_idx)))
    finally:
        composite._device[wmap_idx] = base_dev
    preds = np.stack(preds)  # (n_models, ntargets, nsamples)
    return [prediction_covariance_from_ensemble(preds[:, i])
            for i in range(preds.shape[1])]


def geodetic_cov_velocity_models(composite, point: dict, nus=(0.2, 0.25, 0.3),
                                 ensemble_tables=None) -> list:
    """
    Geodetic prediction covariances from earth-model variations
    (reference ``geodetic_cov_velocity_models`` :625, psgrn crust_ind
    ensembles).  Two ensemble axes: ``ensemble_tables`` — perturbed
    layered static GF tables (``build_gfs`` ``n_variations``) — or, for
    the homogeneous Okada/MT path, Poisson-ratio variations ``nus``.
    Returns per-dataset covariance matrices.
    """
    import jax.numpy as jnp

    jpoint = {k: jnp.asarray(v) for k, v in point.items()}
    preds = []
    if ensemble_tables:
        base_table = composite.static_table
        try:
            for table in ensemble_tables:
                composite.static_table = table
                composite._device["static_table"] = table
                preds.append(np.asarray(composite.synthetics_los(jpoint)))
        finally:
            composite.static_table = base_table
            if base_table is not None:
                composite._device["static_table"] = base_table
            else:
                composite._device.pop("static_table", None)
    else:
        base_nu = composite.nu
        try:
            for nu in nus:
                composite.nu = float(nu)
                preds.append(np.asarray(composite.synthetics_los(jpoint)))
        finally:
            composite.nu = base_nu
    preds = np.stack(preds)
    return [prediction_covariance_from_ensemble(preds[:, slc])
            for slc in composite.stack.slices]


# ---------------------------------------------------------------------------
# Sampler proposal covariances (reference covariance.py:851-908)
# ---------------------------------------------------------------------------


def init_proposal_covariance(priors_lower: np.ndarray, priors_upper: np.ndarray,
                             scale: float = 1.0) -> np.ndarray:
    """Diagonal seed proposal covariance from prior widths (reference :851)."""
    widths = (priors_upper - priors_lower) / scale
    widths = np.where(widths <= 0, 1e-12, widths)
    return np.diag((widths / 6.0) ** 2)


def calc_sample_covariance(population: np.ndarray, likelihoods: np.ndarray,
                           beta: float, prev_beta: float = 0.0) -> np.ndarray:
    """
    Tempered importance-weighted sample covariance for the proposal
    (reference ``calc_sample_covariance`` :865 / SMC ``calc_covariance``).
    """
    lweights = (beta - prev_beta) * (likelihoods - likelihoods.max())
    weights = np.exp(lweights)
    weights = weights / weights.sum()
    cov = np.cov(population, aweights=weights, rowvar=False, bias=False)
    cov = np.atleast_2d(cov)
    cov = ensure_cov_psd(cov)
    if np.isnan(cov).any() or np.isinf(cov).any():
        raise ValueError("Sample covariance contains NaN/Inf")
    return cov
