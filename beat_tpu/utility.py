"""
Shared utilities: point/vector bijections, covariance PSD repair, windowed
statistics and small numerics helpers.

Replaces the reference's ``beat/utility.py`` bijection machinery
(``ListArrayOrdering``/``ListToArrayBijection``, ``utility.py:113,167``)
with a single :class:`Ordering` that maps between named parameter dicts
("points") and flat vectors — the flat vector is what JAX samplers carry,
batched over a chains axis.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

logger = logging.getLogger("beat_tpu.utility")

# ---------------------------------------------------------------------------
# Point <-> flat-vector bijection
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VarSpec:
    """One named variable inside the flat vector."""

    name: str
    shape: tuple
    slc: slice

    @property
    def size(self) -> int:
        return int(np.prod(self.shape, dtype=int)) if self.shape else 1


class Ordering:
    """
    Deterministic layout of named (possibly vector-valued) variables inside
    one flat parameter vector.  Analogue of the reference
    ``ListArrayOrdering`` + ``DictToArrayBijection``
    (``beat/utility.py:113-328``), but shape-static and JAX-friendly:
    ``to_array``/``to_point`` work on numpy or jax arrays and support
    arbitrary leading batch dimensions.
    """

    def __init__(self, names_shapes):
        self.vmap: list[VarSpec] = []
        idx = 0
        for name, shape in names_shapes:
            shape = tuple(int(s) for s in shape)
            size = int(np.prod(shape, dtype=int)) if shape else 1
            self.vmap.append(VarSpec(name, shape, slice(idx, idx + size)))
            idx += size
        self.size = idx
        self._by_name = {v.name: v for v in self.vmap}

    @property
    def names(self):
        return [v.name for v in self.vmap]

    def __contains__(self, name):
        return name in self._by_name

    def __getitem__(self, name) -> VarSpec:
        return self._by_name[name]

    def to_array(self, point: dict, dtype=None):
        """Map dict of named arrays -> flat vector (numpy)."""
        out = np.zeros(self.size, dtype=dtype or np.float64)
        for v in self.vmap:
            val = np.asarray(point[v.name], dtype=out.dtype)
            out[v.slc] = val.reshape(-1)
        return out

    def to_point(self, array) -> dict:
        """Map flat vector (with optional leading batch dims) -> dict."""
        point = {}
        for v in self.vmap:
            sl = array[..., v.slc]
            point[v.name] = sl.reshape(array.shape[:-1] + v.shape) if v.shape else sl[..., 0]
        return point

    def slice_of(self, name) -> slice:
        return self._by_name[name].slc


# ---------------------------------------------------------------------------
# Covariance PSD repair  (reference: beat/utility.py:1034-1140)
# ---------------------------------------------------------------------------


def is_pos_def(m: np.ndarray) -> bool:
    try:
        np.linalg.cholesky(m)
        return True
    except np.linalg.LinAlgError:
        return False


def near_psd(x: np.ndarray, epsilon: float = 2.0 * np.finfo(float).eps) -> np.ndarray:
    """
    Nearest positive-semi-definite matrix by eigenvalue clipping on the
    correlation matrix (Higham-style), as in the reference
    ``utility.near_psd`` (``beat/utility.py:1059``).
    """
    if min(x.shape) == 0:
        return x
    d = np.sqrt(np.clip(np.diag(x), epsilon, None))
    scaling = np.outer(d, d)
    corr = x / scaling
    vals, vecs = np.linalg.eigh((corr + corr.T) / 2.0)
    vals = np.clip(vals, epsilon, None)
    t = 1.0 / (vecs**2 @ vals)
    b = vecs * np.sqrt(np.outer(t, vals))
    corr_psd = b @ b.T
    np.fill_diagonal(corr_psd, 1.0)
    return corr_psd * scaling


def ensure_cov_psd(cov: np.ndarray) -> np.ndarray:
    """Return a PSD version of ``cov`` (identity-jitter then near_psd)."""
    cov = np.asarray(cov, dtype=np.float64)
    cov = (cov + cov.T) / 2.0
    if is_pos_def(cov):
        return cov
    jitter = 1e-10 * np.max(np.abs(np.diag(cov)), initial=1.0)
    for _ in range(8):
        if is_pos_def(cov + jitter * np.eye(cov.shape[0])):
            return cov + jitter * np.eye(cov.shape[0])
        jitter *= 10.0
    return near_psd(cov)


# ---------------------------------------------------------------------------
# Windowed statistics / misc numerics
# ---------------------------------------------------------------------------


def running_window_rms(data: np.ndarray, window_size: int, mode: str = "valid") -> np.ndarray:
    """RMS of a sliding window (reference ``utility.py:1141``)."""
    data2 = np.power(np.asarray(data, dtype=np.float64), 2)
    window = np.ones(int(window_size)) / float(window_size)
    return np.sqrt(np.convolve(data2, window, mode))


def find_elbow(data: np.ndarray) -> int:
    """
    Index of the elbow of a monotone curve: the point with the maximum
    distance from the straight line between the endpoints
    (reference ``utility.find_elbow`` ``beat/utility.py:1622``).
    ``data``: (n, 2) array of (x, y).
    """
    data = np.asarray(data, dtype=np.float64)
    line = data[-1] - data[0]
    line = line / np.linalg.norm(line)
    rel = data - data[0]
    proj = np.outer(rel @ line, line)
    dists = np.linalg.norm(rel - proj, axis=1)
    return int(np.argmax(dists))


def biggest_common_divisor(a: int, b: int) -> int:
    return int(np.gcd(int(a), int(b)))


def distances(points_a: np.ndarray, points_b: np.ndarray) -> np.ndarray:
    """Pairwise Euclidean distances (na, nb)."""
    a = np.atleast_2d(points_a)
    b = np.atleast_2d(points_b)
    return np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=-1))


def adjust_point_units(point: dict, km_vars=("east_shift", "north_shift", "depth", "length", "width",
                                             "nucleation_strike", "nucleation_dip")) -> dict:
    """Convert km-valued geometry parameters to metres (reference ``utility.py:651``)."""
    out = {}
    for k, v in point.items():
        base = k.rstrip("0123456789_")
        out[k] = np.asarray(v) * 1000.0 if base in km_vars else v
    return out


def setup_logging(project_dir: str | None = None, level: int = logging.INFO,
                  logfilename: str = "BEAT_log.txt") -> None:
    """Console + per-project file logging (reference ``utility.py:800``)."""
    handlers: list[logging.Handler] = [logging.StreamHandler()]
    if project_dir is not None:
        import os

        handlers.append(logging.FileHandler(os.path.join(project_dir, logfilename)))
    logging.basicConfig(
        level=level,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        handlers=handlers,
        force=True,
    )


def list2string(lst, fill=", ") -> str:
    return fill.join(str(x) for x in lst)


# ---------------------------------------------------------------------------
# Finite-difference stencils (reference utility.StencilOperator :1658)
# ---------------------------------------------------------------------------

STENCILS = {
    3: {"coefficients": np.array([-1.0, 0.0, 1.0]), "denominator": 2.0},
    5: {"coefficients": np.array([1.0, -8.0, 0.0, 8.0, -1.0]), "denominator": 12.0},
}


def fd_gradient(f, x0: np.ndarray, h: float = 1e-4, order: int = 3) -> np.ndarray:
    """Central finite-difference gradient of a scalar function."""
    st = STENCILS[order]
    n = len(st["coefficients"])
    offs = np.arange(n) - n // 2
    g = np.zeros_like(np.asarray(x0, dtype=np.float64))
    for i in range(x0.size):
        acc = 0.0
        for c, o in zip(st["coefficients"], offs):
            if c == 0.0:
                continue
            xp = np.array(x0, dtype=np.float64)
            xp[i] += o * h
            acc += c * f(xp)
        g[i] = acc / (st["denominator"] * h)
    return g
