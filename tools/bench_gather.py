"""
On-chip shoot-out of the GreensTable bilinear-gather strategies.

Times, per lockstep eval (n_out = chains × targets blended rows):

* ``onehot``  — the MXU one-hot matmul (current TPU default,
  ``gftable._gather_spectra_mm``): streams the whole table once per
  128-row chain block.
* ``take``    — 4 corner-row ``jnp.take`` + blend
  (``gftable._gather_spectra_take``): XLA rewrites it into the same
  whole-table streaming.
* ``rowgather`` — first-generation per-row DMA kernel
  (``ops/rowgather.py``): 4 row DMAs per output + HBM blend round trip.
* ``bilgather`` — fused corner-block DMA + in-VMEM blend
  (``ops/bilgather.py``): 1 strided DMA per output, blended row out.

Usage:  python tools/bench_gather.py [--chains 512] [--targets 8]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _shapes(name):
    # (nd, nz, row_floats): bench_hbm_measured largest sweep point and
    # the real-config FullMT table (BENCH_r04 fullmt_real_data)
    return {
        "sweep305MB": (256, 64, 1548),
        "real119MB": (125, 25, 3133),
        "real30MB": (63, 13, 3133),
    }[name]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=512)
    ap.add_argument("--targets", type=int, default=8)
    ap.add_argument("--tables", nargs="*",
                    default=["sweep305MB", "real119MB"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from beat_tpu.ops.bilgather import (bilinear_rows_pallas, pack_table)
    from beat_tpu.ops.rowgather import gather_rows_pallas
    from beat_tpu.profiling import slope_time

    on_tpu = jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(0)
    out = {}

    for tname in args.tables:
        nd, nz, M = _shapes(tname)
        ncells = 3 * nd * nz
        tbl = jnp.asarray(
            rng.normal(size=(ncells, M)).astype(np.float32))
        n = args.chains * args.targets
        # random bilinear queries: channel c, cell (d0, z0), fractions
        c = rng.integers(0, 3, n)
        d0 = rng.integers(0, nd - 1, n)
        z0 = rng.integers(0, nz - 1, n)
        fd = rng.uniform(0, 1, n).astype(np.float32)
        fz = rng.uniform(0, 1, n).astype(np.float32)
        # continuous query coordinates: per-iteration the harness
        # re-derives (d0, z0, fd, fz) from these through a floor() —
        # NONLINEAR in the perturbation, so XLA cannot factor the
        # gather out of the timing loop (a linear w4-perturbation gets
        # algebraically distributed and the table reads hoisted)
        cdist = jnp.asarray(d0 + fd, dtype=jnp.float32)
        cdep = jnp.asarray(z0 + fz, dtype=jnp.float32)
        cchan = jnp.asarray(c, dtype=jnp.int32)

        def query(acc):
            u = cdist + acc * jnp.float32(1e-30)
            v = cdep + acc * jnp.float32(1e-30)
            d0i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, nd - 2)
            z0i = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, nz - 2)
            fdi = u - d0i
            fzi = v - z0i
            w4i = jnp.stack([(1 - fdi) * (1 - fzi), (1 - fdi) * fzi,
                             fdi * (1 - fzi), fdi * fzi], axis=1)
            cdi = cchan * nd + d0i
            base = cdi * nz + z0i
            return cdi, z0i, w4i, base

        import functools

        def timed(fn, table_arg, n_lo=8, n_hi=96):
            # fn(T, cdi, z0i, w4i, base) -> (n, M-ish) result.  The
            # table rides as a jit ARGUMENT — as a closure constant it
            # is embedded in the remote-compile request (HTTP 413 at
            # 305 MB) and invites constant-driven simplification
            @functools.partial(jax.jit, static_argnums=(0,))
            def rep(k, bump, T):
                def body(acc, _):
                    r = fn(T, *query(acc + bump))
                    # consume the WHOLE result: feeding only r[0,0] to
                    # the carry lets XLA slice through the one-hot
                    # matmul (dot → single dot product) and measure
                    # nothing
                    return acc + jnp.float32(1e-30) * jnp.sum(r), None

                acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=k)
                return acc

            return slope_time(lambda k, r: float(
                rep(k, jnp.float32(1e-7 * r), table_arg)), n_lo, n_hi)

        res = {}

        def note(k, v):
            res[k] = v
            print(f"  {tname} {k}: {v}", flush=True)

        # one-hot matmul
        def onehot(T, cdi, z0i, w4i, base):
            iota = jax.lax.iota(jnp.int32, ncells)
            w = (w4i[:, 0:1] * (iota[None] == base[:, None])
                 + w4i[:, 1:2] * (iota[None] == (base + 1)[:, None])
                 + w4i[:, 2:3] * (iota[None] == (base + nz)[:, None])
                 + w4i[:, 3:4] * (iota[None] == (base + nz + 1)[:, None])
                 ).astype(T.dtype)
            return w @ T

        note("onehot_s", timed(onehot, tbl))

        # 4-corner take
        def take4(T, cdi, z0i, w4i, base):
            return (w4i[:, 0:1] * jnp.take(T, base, axis=0)
                    + w4i[:, 1:2] * jnp.take(T, base + 1, axis=0)
                    + w4i[:, 2:3] * jnp.take(T, base + nz, axis=0)
                    + w4i[:, 3:4] * jnp.take(T, base + nz + 1, axis=0))

        note("take_s", timed(take4, tbl))

        if on_tpu:
            # first-generation row gather (4 row DMAs + XLA blend)
            def rowg(T, cdi, z0i, w4i, base):
                return (w4i[:, 0:1] * gather_rows_pallas(T, base)
                        + w4i[:, 1:2] * gather_rows_pallas(T, base + 1)
                        + w4i[:, 2:3] * gather_rows_pallas(T, base + nz)
                        + w4i[:, 3:4] * gather_rows_pallas(T,
                                                           base + nz + 1))

            note("rowgather_s", timed(rowg, tbl, n_hi=32))

            # fused corner-block gather+blend
            t4 = pack_table(tbl, 3 * nd, nz)

            def bilg(T4, cdi, z0i, w4i, base):
                return bilinear_rows_pallas(T4, cdi, z0i, w4i)

            note("bilgather_s", timed(bilg, t4))

            # numerical sanity
            cdi, z0i, w4i, base = (np.asarray(x) for x in query(0.0))
            ref = np.asarray(take4(tbl, jnp.asarray(cdi),
                                   jnp.asarray(z0i),
                                   jnp.asarray(w4i), jnp.asarray(base)))
            got = np.asarray(bilinear_rows_pallas(
                t4, jnp.asarray(cdi), jnp.asarray(z0i),
                jnp.asarray(w4i)))[:, :M]
            err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
            res["bilgather_rel_err"] = float(err)

        table_bytes = ncells * M * 4
        needed = n * 4 * M * 4
        res["table_mb"] = round(table_bytes / 1e6, 1)
        res["needed_4corner_mb"] = round(needed / 1e6, 1)
        for k in list(res):
            if k.endswith("_s"):
                res[k.replace("_s", "_ms")] = round(res[k] * 1e3, 3)
                res[k + "_eff_gbps"] = round(needed / res[k] / 1e9, 1)
                del res[k]
        out[tname] = res

    print(json.dumps({"n_out": args.chains * args.targets, **out},
                     indent=1))


if __name__ == "__main__":
    main()
