"""
End-to-end per-eval device time of the flagship forward logp with each
GreensTable gather strategy, at a real-config-scale table.

Usage: python -m tools.bench_gather_e2e [--chains 512] [--nd 125] [--nz 25]
"""

from __future__ import annotations

import argparse
import functools
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=512)
    ap.add_argument("--nd", type=int, default=125)
    ap.add_argument("--nz", type=int, default=25)
    ap.add_argument("--nt", type=int, default=512)
    ap.add_argument("--stations", type=int, default=8)
    ap.add_argument("--modes", nargs="*", default=["1", "dma"])
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from beat_tpu.profiling import slope_time

    out = {}
    for mode in args.modes:
        os.environ["BEAT_TPU_MM_GATHER"] = mode
        try:
            problem = _build_flagship(
                n_stations=args.stations, nt=args.nt,
                n_distances=args.nd, n_depths=args.nz)
            logp, data = problem.make_logp_fn()
            lower, upper = problem.priors.bounds_arrays()
            rng = np.random.default_rng(0)
            q = jnp.asarray(
                rng.uniform(lower, upper,
                            size=(args.chains, lower.size)),
                dtype=jnp.float32)
            batched = jax.vmap(lambda x, d: logp(x, d), in_axes=(0, None))

            @functools.partial(jax.jit, static_argnums=(2,))
            def scan_evals(qq, d, n, batched=batched):
                def body(eps, _):
                    return (jnp.float32(1e-20)
                            * jnp.sum(batched(qq + eps, d)), None)

                eps, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=n)
                return eps

            per_eval = slope_time(lambda n, rep: float(
                scan_evals(q + jnp.float32(1e-7 * rep), data, n)), 2, 18)
            table_bytes = sum(
                int(np.prod(x.shape)) * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(data)
                if hasattr(x, "shape") and x.size > 1_000_000)
            out[f"mode_{mode}"] = {
                "per_eval_ms": round(per_eval * 1e3, 3),
                "evals_per_s": round(args.chains / per_eval, 0),
                "table_mb": round(table_bytes / 1e6, 1),
            }
            print(f"  mode={mode}: {out[f'mode_{mode}']}", flush=True)
        finally:
            os.environ.pop("BEAT_TPU_MM_GATHER", None)

    print(json.dumps({"chains": args.chains, **out}))


if __name__ == "__main__":
    main()
