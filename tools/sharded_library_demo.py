"""
Larger-than-HBM GF library, target-sharded over a device mesh
(round-4 verdict next-round #5).

The reference's recommended FFI scale (5000-8000 chains, 250-500 RVs,
``docs/examples/FFI_static.rst:299``; SURVEY §7 hard part 2) implies
5-D seismic GF libraries of tens of GB — beyond one v5e chip's 16 GB
HBM.  This demo builds a >=20 GiB synthetic library DIRECTLY AS SHARDS
over an 8-device mesh (no single host/device copy ever exists), runs
the production stacking paths on it, and prints the per-device HBM
accounting:

1. 5-D data generated per target shard
   (``jax.make_array_from_single_device_arrays``) — per-device bytes
   == total/8,
2. the sharded XLA gather+einsum log-likelihood executes on the full
   library (``parallel.sharded_gf_logp``, the production chain/target
   mesh program),
3. the Pallas stacking layout is built SHARD-WISE and the 5-D array is
   dropped (the production ``keep_data=False`` memory path), per-device
   layout bytes accounted,
4. the fused Pallas kernel (interpret mode on CPU — Mosaic on real
   chips) runs inside ``shard_map`` on the full-size sharded layout and
   must match the XLA result,
5. the v5e-8 HBM budget math is reported.

Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/sharded_library_demo.py [--gib 20]

Output: one JSON line (committed as SHARDED_LIB_r05.json).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gib", type=float, default=20.0,
                    help="target library size in GiB (5-D f32 array)")
    ap.add_argument("--chains", type=int, default=8)
    args = ap.parse_args()

    import beat_tpu  # noqa: F401  (applies BEAT_TPU_PLATFORM before jax inits)
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from beat_tpu.ffi import SeismicGFLibrary
    from beat_tpu.ops.gfstack import stack_all_pallas, to_stacking_layout
    from beat_tpu.parallel import make_gf_mesh, sharded_gf_logp, target_sharding

    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 (virtual) devices, got {n_dev}"

    # shapes: scale the target axis to hit the requested size
    Pn, D, S, N = 128, 8, 32, 640
    bytes_per_target = Pn * D * S * N * 4
    T = max(8, int(round(args.gib * 2**30 / bytes_per_target / 8)) * 8)
    total_bytes = T * bytes_per_target
    C = args.chains

    mesh = make_gf_mesh(1, 8)
    sharding5 = target_sharding(mesh)

    t0 = time.time()
    # 1. per-shard generation: each device's target block is created
    # locally and assembled — the full array never exists in one piece
    t_per_dev = T // 8
    dev_order = list(sharding5.addressable_devices_indices_map(
        (T, Pn, D, S, N)).items())
    shards5 = []
    shard_np = {}
    for dev, idx in dev_order:
        t_lo = idx[0].start or 0
        rng = np.random.default_rng(1000 + t_lo)
        # f32 uniform, generated in place (no f64 temp): the content
        # only needs to be dense and non-degenerate
        block = rng.random((t_per_dev, Pn, D, S, N), dtype=np.float32)
        block -= 0.5
        shard_np[t_lo] = block
        shards5.append(jax.device_put(block, dev))
    data5 = jax.make_array_from_single_device_arrays(
        (T, Pn, D, S, N), sharding5, shards5)
    del shards5
    gen_s = time.time() - t0

    lib = SeismicGFLibrary(
        data=data5, duration_min=0.5, duration_sampling=0.5,
        starttime_min=0.0, starttime_sampling=0.25)

    per_dev_5d = [sh.data.nbytes for sh in data5.addressable_shards]
    assert all(b == total_bytes // 8 for b in per_dev_5d), per_dev_5d

    rng = np.random.default_rng(7)
    durations = jnp.asarray(rng.uniform(0.5, 2.0, (C, Pn)), jnp.float32)
    starttimes = jnp.asarray(rng.uniform(0, 1.5, (C, T, Pn)), jnp.float32)
    slips = jnp.asarray(rng.uniform(0, 2, (C, Pn)), jnp.float32)
    dobs = jnp.asarray(rng.standard_normal((T, N)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, (T,)), jnp.float32)

    # 2. sharded XLA gather+einsum llk over the full library
    def xla_llk(lib, durations, starttimes, slips, dobs, w):
        def one(d, s, u):
            r = dobs - lib.stack_all(d, s, u, "multilinear")
            return -0.5 * jnp.sum(w[:, None] * r * r)

        return jax.vmap(one)(durations, starttimes, slips)

    lib_spec = jax.tree_util.tree_map(lambda _: P("targets"), lib)
    in_specs = (lib_spec, P("chains"), P("chains", "targets"),
                P("chains"), P("targets"), P("targets"))
    sharded_xla = sharded_gf_logp(mesh, xla_llk, in_specs=in_specs)
    t0 = time.time()
    want = np.asarray(sharded_xla(lib, durations, starttimes, slips,
                                  dobs, w))
    xla_s = time.time() - t0

    # 3. shard-wise Pallas stacking layout; 5-D data dropped (the
    # production keep_data=False path — halves resident HBM)
    t0 = time.time()
    shards_tr = []
    tr_shape = None
    for dev, idx in dev_order:
        t_lo = idx[0].start or 0
        block_tr = np.asarray(to_stacking_layout(
            jax.device_put(shard_np.pop(t_lo), dev), jnp.float32))
        tr_shape = (T,) + block_tr.shape[1:]
        shards_tr.append(jax.device_put(block_tr, dev))
    data_tr = jax.make_array_from_single_device_arrays(
        tr_shape, sharding5, shards_tr)
    del shards_tr, data5, lib.data
    layout_s = time.time() - t0

    lib_tr = SeismicGFLibrary(
        data=None, duration_min=0.5, duration_sampling=0.5,
        starttime_min=0.0, starttime_sampling=0.25,
        data_tr=data_tr, shape5=(T, Pn, D, S, N))
    per_dev_tr = [sh.data.nbytes for sh in data_tr.addressable_shards]
    tr_bytes = int(np.prod(tr_shape)) * 4
    assert all(b == tr_bytes // 8 for b in per_dev_tr), per_dev_tr

    # 4. fused Pallas kernel in shard_map on the full-size layout
    def pallas_llk(lib, durations, starttimes, slips, dobs, w):
        def one(d, s, u):
            synth = stack_all_pallas(lib, d, s, u, "multilinear",
                                     interpret=True, mode="highest")
            r = dobs - synth
            return -0.5 * jnp.sum(w[:, None] * r * r)

        return jax.vmap(one)(durations, starttimes, slips)

    lib_tr_spec = jax.tree_util.tree_map(lambda _: P("targets"), lib_tr)
    sharded_pl = sharded_gf_logp(
        mesh, pallas_llk,
        in_specs=(lib_tr_spec, P("chains"), P("chains", "targets"),
                  P("chains"), P("targets"), P("targets")))
    t0 = time.time()
    got = np.asarray(sharded_pl(lib_tr, durations, starttimes, slips,
                                dobs, w))
    pallas_s = time.time() - t0

    rel = float(np.max(np.abs(got - want) / (np.abs(want) + 1e-30)))
    assert rel < 1e-4, f"sharded Pallas != sharded XLA: rel {rel:.2e}"

    # 5. v5e-8 HBM budget: 16 GB/chip
    v5e_hbm = 16e9
    per_chip = tr_bytes / 8
    out = {
        "library_shape5": [T, Pn, D, S, N],
        "library_gib": round(total_bytes / 2**30, 2),
        "per_device_5d_bytes": per_dev_5d[0],
        "stacking_layout_gib": round(tr_bytes / 2**30, 2),
        "per_device_layout_bytes": per_dev_tr[0],
        "per_device_equals_total_over_8": True,
        "xla_sharded_llk_s": round(xla_s, 2),
        "pallas_interpret_sharded_llk_s": round(pallas_s, 2),
        "pallas_vs_xla_max_rel": rel,
        "generate_s": round(gen_s, 1),
        "layout_build_s": round(layout_s, 1),
        "n_devices": 8,
        "v5e8_hbm_budget": {
            "per_chip_layout_gib": round(per_chip / 2**30, 2),
            "per_chip_hbm_gib": round(v5e_hbm / 2**30, 2),
            "layout_fraction_of_hbm_pct": round(100 * per_chip / v5e_hbm, 1),
            "headroom_note": (
                "keep_data=False holds ONLY the layout; remaining HBM "
                "hosts chain state + activations.  A 40 GiB library "
                "(reference kinematic-FFI scale) still fits at "
                f"{round(100 * 40 * 2**30 / 8 / v5e_hbm, 1)} % per chip."),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
