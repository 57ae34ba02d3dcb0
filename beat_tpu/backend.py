"""
Sample trace storage: stage-structured checkpoints with resume.

Re-design of ``beat/backend.py``: the reference writes one CSV/binary file
per chain because chains live in separate worker processes.  Here all
chains advance together on device, so a stage checkpoint is a single
atomic ``.npz`` per stage containing the (thinned) trace of *all* chains
plus the sampler state needed to resume (β, proposal covariance,
resampling indexes, end-point population).

Layout under ``<homepath>/``:

    stage_0/trace.npz  stage_0/state.npz  stage_0/meta.json
    stage_1/...
    stage_-1/...        (final posterior stage, β = 1)

Corruption detection (reference ``check_multitrace`` ``backend.py:1224``):
a stage is valid iff its npz files load and shapes match ``meta.json``;
invalid stages are re-run from the previous stage's state.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import tempfile

import numpy as np

logger = logging.getLogger("beat_tpu.backend")


def _atomic_save(path: str, **arrays) -> None:
    """Write an npz atomically (tmp file + rename) so crashes can't corrupt."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    # suffix must be .npz — np.savez appends it otherwise and the rename
    # would move an empty placeholder file.
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


class StageTrace:
    """In-memory view of one stage's sampled trace."""

    def __init__(self, q_trace: np.ndarray, llk_trace: np.ndarray, varnames=None, ordering=None):
        # q_trace: (n_records, n_chains, dim); llk_trace: (n_records, n_chains)
        self.q_trace = q_trace
        self.llk_trace = llk_trace
        self.varnames = varnames or []
        self.ordering = ordering

    @property
    def n_chains(self) -> int:
        return self.q_trace.shape[1]

    @property
    def n_records(self) -> int:
        return self.q_trace.shape[0]

    def get_values(self, varname: str, combine: bool = True, burn: int = 0, thin: int = 1):
        """Extract one variable's samples (reference MultiTrace.get_values)."""
        if self.ordering is None or varname not in self.ordering:
            raise KeyError(varname)
        spec = self.ordering[varname]
        vals = self.q_trace[burn::thin, :, spec.slc]
        if spec.shape == ():
            vals = vals[..., 0]
        if combine:
            vals = vals.reshape((-1,) + vals.shape[2:])
        return vals

    def end_points(self):
        """Last sample of every chain: (population (n_chains, dim), llks)."""
        return self.q_trace[-1], self.llk_trace[-1]


class SampleStage:
    """
    Stage directory manager (reference ``backend.SampleStage``
    ``beat/backend.py:985``).
    """

    def __init__(self, homepath: str, ordering=None):
        self.homepath = homepath
        self.ordering = ordering
        os.makedirs(homepath, exist_ok=True)

    # -- paths ------------------------------------------------------------

    def stage_path(self, stage: int) -> str:
        return os.path.join(self.homepath, f"stage_{stage}")

    def _trace_file(self, stage: int) -> str:
        return os.path.join(self.stage_path(stage), "trace.npz")

    def _state_file(self, stage: int) -> str:
        return os.path.join(self.stage_path(stage), "state.npz")

    def _meta_file(self, stage: int) -> str:
        return os.path.join(self.stage_path(stage), "meta.json")

    # -- save / load --------------------------------------------------------

    def save_stage(self, stage: int, trace: dict, state: dict) -> None:
        """
        Persist one finished stage.

        trace: {"q": (n_rec, n_chains, dim) float32, "llk": (n_rec, n_chains)}
        state: json-serialisable scalars + numpy arrays (split automatically).
        """
        arrays = {k: np.asarray(v) for k, v in state.items() if isinstance(v, np.ndarray)}
        scalars = {k: v for k, v in state.items() if not isinstance(v, np.ndarray)}
        _atomic_save(self._trace_file(stage), q=np.asarray(trace["q"], dtype=np.float32),
                     llk=np.asarray(trace["llk"], dtype=np.float32))
        _atomic_save(self._state_file(stage), **arrays)
        meta = {
            "scalars": scalars,
            "shape_q": list(np.asarray(trace["q"]).shape),
            "shape_llk": list(np.asarray(trace["llk"]).shape),
            "varnames": list(self.ordering.names) if self.ordering is not None else [],
        }
        with open(self._meta_file(stage), "w") as f:
            json.dump(meta, f, indent=1)
        logger.info("Saved stage %i to %s", stage, self.stage_path(stage))

    def load_trace(self, stage: int) -> StageTrace:
        with np.load(self._trace_file(stage)) as z:
            q, llk = z["q"], z["llk"]
        meta = self._load_meta(stage)
        return StageTrace(q, llk, varnames=meta.get("varnames"), ordering=self.ordering)

    def load_state(self, stage: int) -> dict:
        meta = self._load_meta(stage)
        state = dict(meta.get("scalars", {}))
        with np.load(self._state_file(stage)) as z:
            for k in z.files:
                state[k] = z[k]
        return state

    def _load_meta(self, stage: int) -> dict:
        with open(self._meta_file(stage)) as f:
            return json.load(f)

    # -- integrity / resume --------------------------------------------------

    def check_stage(self, stage: int) -> bool:
        """Validate a stage checkpoint (analogue of ``check_multitrace``)."""
        try:
            meta = self._load_meta(stage)
            with np.load(self._trace_file(stage)) as z:
                ok = (list(z["q"].shape) == meta["shape_q"]
                      and list(z["llk"].shape) == meta["shape_llk"])
            with np.load(self._state_file(stage)):
                pass
            return bool(ok)
        except Exception as e:  # corrupt/missing files
            logger.warning("Stage %i invalid: %s", stage, e)
            return False

    def highest_sampled_stage(self) -> int:
        """Largest valid stage number on disk, or -2 if none
        (reference ``get_highest_sampled_stage`` ``backend.py:1262``)."""
        stages = []
        if not os.path.isdir(self.homepath):
            return -2
        for name in os.listdir(self.homepath):
            if name.startswith("stage_"):
                try:
                    stages.append(int(name.split("_", 1)[1]))
                except ValueError:
                    continue
        if -1 in stages and self.check_stage(-1):
            return -1
        valid = sorted(s for s in stages if s >= 0 and self.check_stage(s))
        return valid[-1] if valid else -2

    def clean_directory(self, stage: int, rm_flag: bool) -> None:
        p = self.stage_path(stage)
        if os.path.isdir(p) and rm_flag:
            shutil.rmtree(p)

    def rm_all(self) -> None:
        if os.path.isdir(self.homepath):
            shutil.rmtree(self.homepath)
        os.makedirs(self.homepath, exist_ok=True)

    def concatenate_traces(self, stages=None) -> StageTrace:
        """Stack traces of several stages along the record axis
        (reference ``concatenate_traces`` ``backend.py:1310``)."""
        if stages is None:
            top = self.highest_sampled_stage()
            stages = list(range(0, top + 1)) if top >= 0 else [-1]
        traces = [self.load_trace(s) for s in stages]
        return StageTrace(
            np.concatenate([t.q_trace for t in traces], axis=0),
            np.concatenate([t.llk_trace for t in traces], axis=0),
            varnames=traces[0].varnames, ordering=self.ordering,
        )


# ---------------------------------------------------------------------------
# Posterior summary (replaces arviz usage in `beat summarize`)
# ---------------------------------------------------------------------------


def hdi(samples: np.ndarray, prob: float = 0.94) -> tuple:
    """Highest-density interval of 1-d samples."""
    x = np.sort(np.asarray(samples).ravel())
    n = x.size
    m = max(1, int(np.floor(prob * n)))
    widths = x[m:] - x[: n - m]
    if widths.size == 0:
        return float(x[0]), float(x[-1])
    i = int(np.argmin(widths))
    return float(x[i]), float(x[i + m])


def effective_sample_size(chains: np.ndarray) -> float:
    """
    Bulk ESS via the standard initial-monotone-sequence autocorrelation
    estimator over (n_draws, n_chains) samples.
    """
    x = np.asarray(chains, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, m = x.shape
    if n < 4:
        return float(n * m)
    means = x.mean(axis=0)
    w = x.var(axis=0, ddof=1).mean()
    if w == 0:
        return float(n * m)
    acov = np.zeros((n, m))
    for j in range(m):
        c = x[:, j] - means[j]
        ac = np.correlate(c, c, mode="full")[n - 1:] / n
        acov[:, j] = ac
    rho = 1.0 - (w - acov.mean(axis=1)) / w
    # initial positive sequence
    t = 1
    s = 0.0
    while t + 1 < n:
        pair = rho[t] + rho[t + 1]
        if pair < 0:
            break
        s += pair
        t += 2
    tau = 1.0 + 2.0 * rho[0] if n < 3 else -1.0 + 2.0 * (rho[0] + s)
    tau = max(tau, 1.0 / np.log10(n * m + 10))
    return float(n * m / tau)


def rhat(chains: np.ndarray) -> float:
    """Gelman-Rubin split-R̂ over (n_draws, n_chains)."""
    x = np.asarray(chains, dtype=np.float64)
    if x.ndim == 1 or x.shape[1] == 1:
        half = x.reshape(-1)
        x = np.stack([half[: half.size // 2], half[half.size // 2: 2 * (half.size // 2)]], axis=1)
    n, m = x.shape
    half = n // 2
    if half < 2:
        # split-R̂ needs >= 2 draws per split half; a heavily thinned
        # trace (one record per stage) legitimately has fewer
        return float("nan")
    splits = np.concatenate([x[:half], x[half: 2 * half]], axis=1)
    n, m = splits.shape
    w = splits.var(axis=0, ddof=1).mean()
    b = n * splits.mean(axis=0).var(ddof=1)
    if w == 0:
        return 1.0
    var_plus = (n - 1) / n * w + b / n
    return float(np.sqrt(var_plus / w))


def summarize_trace(trace: StageTrace, prob: float = 0.94) -> dict:
    """Per-variable posterior summary table (mean, sd, hdi, ess, r_hat)."""
    out = {}
    if trace.ordering is None:
        raise ValueError("trace needs an ordering for summaries")
    for spec in trace.ordering.vmap:
        block = trace.q_trace[:, :, spec.slc]  # (n_rec, n_chains, k)
        for k in range(block.shape[-1]):
            s = block[:, :, k]
            name = spec.name if spec.shape == () else f"{spec.name}[{k}]"
            lo, hi = hdi(s, prob)
            out[name] = {
                "mean": float(s.mean()),
                "sd": float(s.std(ddof=1)),
                f"hdi_{int(prob*100)}%_lower": lo,
                f"hdi_{int(prob*100)}%_upper": hi,
                "ess": effective_sample_size(s),
                "r_hat": rhat(s),
            }
    return out


def extract_bounds_from_summary(summary: dict, varname: str, shape=(), roundto: int = 2,
                                alpha: float = 0.06) -> tuple:
    """
    HDI bounds of a summarised variable, for importing a previous run's
    posterior as priors (reference ``extract_bounds_from_summary``
    ``backend.py:1365``).
    """
    size = int(np.prod(shape, dtype=int)) if shape else 1
    lows, highs = [], []
    for k in range(size):
        name = varname if not shape else f"{varname}[{k}]"
        rec = summary[name]
        keys = [key for key in rec if key.startswith("hdi_")]
        lo_k = min(rec[key] for key in keys)
        hi_k = max(rec[key] for key in keys)
        lows.append(np.floor(lo_k * 10**roundto) / 10**roundto)
        highs.append(np.ceil(hi_k * 10**roundto) / 10**roundto)
    return np.array(lows), np.array(highs)
