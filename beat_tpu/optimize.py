"""
Gradient-based MAP estimation + Laplace approximation.

A capability the reference cannot offer: its pytensor graphs never
expose gradients (``beat/pytensorf.py:5-7`` "Far future"), so BEAT has
no optimizer at all — model exploration always pays for a full MCMC
run.  Here JAX autodiff gives the posterior mode in seconds:

* :func:`map_estimate` — multi-restart L-BFGS in a sigmoid-transformed
  unconstrained space, ALL restarts advanced in lockstep on the device
  (``vmap`` over restarts, one ``lax.scan`` of optimizer steps — the
  same batching design as the samplers: a step costs one batched
  forward/gradient regardless of the restart count).  The monotone
  transform ``q = lo + (hi−lo)·σ(z)`` preserves the argmax of the
  likelihood over the prior box, so no Jacobian term is wanted.
* :func:`laplace_approximation` — curvature at the mode: posterior
  covariance ``(−∇²llk)⁻¹`` over the free dimensions and the Laplace
  evidence ``llk* + d/2·log2π − ½·log|−∇²llk| − log vol(prior)``,
  directly comparable to the SMC transitional-evidence estimate
  (cross-checked in tests/test_optimize.py).

Fixed parameters (``lower == upper``, the config convention for
pinning) are held constant and excluded from both the optimization and
the curvature.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("beat_tpu.optimize")

_EPS = 1e-6


def _transforms(lower, upper):
    """Sigmoid bijection between the free-dimension box and R^d_free;
    fixed dims (span == 0) pass through constant."""
    lo = jnp.asarray(lower, jnp.float32)
    hi = jnp.asarray(upper, jnp.float32)
    span = hi - lo
    free = span > 0

    def to_q(z):
        q = lo + span * jax.nn.sigmoid(z)
        return jnp.where(free, q, lo)

    def to_z(q):
        u = jnp.clip((q - lo) / jnp.where(free, span, 1.0), _EPS, 1 - _EPS)
        return jnp.where(free, jnp.log(u) - jnp.log1p(-u), 0.0)

    return to_q, to_z, free


@partial(jax.jit, static_argnames=("logp_fn", "n_steps"))
def _run_lbfgs(logp_fn, z0, lower, upper, n_steps, logp_args=()):
    """Lockstep multi-restart L-BFGS (z0: (n_restarts, dim))."""
    import optax

    to_q, _, _ = _transforms(lower, upper)

    def neg(z):
        return -logp_fn(to_q(z), *logp_args)

    opt = optax.lbfgs()

    def run_one(z0_1):
        state = opt.init(z0_1)

        def body(carry, _):
            z, st = carry
            val, g = jax.value_and_grad(neg)(z)
            updates, st = opt.update(g, st, z, value=val, grad=g,
                                     value_fn=neg)
            z_new = optax.apply_updates(z, updates)
            # guard divergent line searches: keep the best-known iterate
            ok = jnp.isfinite(neg(z_new)) & jnp.all(jnp.isfinite(z_new))
            z_new = jnp.where(ok, z_new, z)
            return (z_new, st), val

        (zf, _), _ = jax.lax.scan(body, (z0_1, state), None, length=n_steps)
        return zf, -neg(zf)

    return jax.vmap(run_one)(z0)


def map_estimate(logp_fn, lower, upper, n_restarts: int = 32,
                 n_steps: int = 150, seed: int = 0, logp_args=(),
                 start=None):
    """
    Maximize the data log-likelihood over the prior box.

    Returns ``(q_map (dim,), llk_map float, all_llks (n_restarts,))`` —
    ``all_llks`` diagnoses multimodality (spread across restarts).
    ``start``: optional (n, dim) array of extra start points (e.g. the
    config test point) prepended to the uniform random restarts.
    """
    lower = np.asarray(lower, dtype=np.float64)
    upper = np.asarray(upper, dtype=np.float64)
    rng = np.random.default_rng(seed)
    q0 = rng.uniform(lower, upper, size=(n_restarts, lower.size))
    # fixed dims: uniform() returns the pinned value (lo == hi)
    if start is not None:
        q0 = np.concatenate([np.atleast_2d(np.asarray(start)), q0], axis=0)

    to_q, to_z, _ = _transforms(lower, upper)
    z0 = jax.vmap(to_z)(jnp.asarray(q0, jnp.float32))
    zf, llks = _run_lbfgs(logp_fn, z0, tuple(lower), tuple(upper),
                          n_steps, logp_args)
    best = int(jnp.argmax(llks))
    q_map = np.asarray(to_q(zf[best]), dtype=np.float64)
    return q_map, float(llks[best]), np.asarray(llks)


def laplace_approximation(logp_fn, q_map, lower, upper, logp_args=()):
    """
    Gaussian (Laplace) posterior approximation at the MAP point.

    Returns a dict with the free-dimension posterior covariance
    (``cov``, PSD-guarded), per-dimension standard deviations expanded
    to the full parameter vector (0 for fixed dims), the mask of free
    dims, and the Laplace log-evidence under the uniform box prior
    (comparable to the SMC transitional estimate).
    """
    lower = np.asarray(lower, dtype=np.float64)
    upper = np.asarray(upper, dtype=np.float64)
    free = upper > lower
    idx = np.flatnonzero(free)
    q_map = np.asarray(q_map, dtype=np.float64)

    qm = jnp.asarray(q_map, jnp.float32)

    def llk_free(qf):
        q = qm.at[jnp.asarray(idx)].set(qf)
        return logp_fn(q, *logp_args)

    qf0 = jnp.asarray(q_map[idx], jnp.float32)
    H = np.asarray(jax.hessian(llk_free)(qf0), dtype=np.float64)
    prec = -(H + H.T) / 2.0
    # interior maximum → positive definite; guard saddle/boundary cases
    w, V = np.linalg.eigh(prec)
    w_floor = np.maximum(w, 1e-10 * max(w.max(), 1.0))
    cov = (V / w_floor) @ V.T
    llk_map = float(np.asarray(llk_free(qf0)))
    d = idx.size
    log_vol = float(np.sum(np.log(upper[idx] - lower[idx])))
    log_evidence = (llk_map + 0.5 * d * np.log(2 * np.pi)
                    - 0.5 * float(np.sum(np.log(w_floor))) - log_vol)
    sd = np.zeros(lower.size)
    sd[idx] = np.sqrt(np.diag(cov))
    if (w <= 0).any():
        logger.warning(
            "Laplace curvature not positive definite (%d non-positive "
            "eigenvalues) — MAP on a boundary or saddle; evidence/sd "
            "floored", int((w <= 0).sum()))
    return {"cov": cov, "sd": sd, "free": free, "llk_map": llk_map,
            "log_evidence": float(log_evidence),
            "curvature_ok": bool((w > 0).all())}
