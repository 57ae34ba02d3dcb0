"""
The reference's FLAGSHIP staged workflow on REAL data: geometry → FFI
distributed-slip inversion of the 2009 Mw 6.3 L'Aquila earthquake from
the bundled InSAR scenes (ascending + descending quadtree data).

This is the native equivalent of the reference's documented example
(``docs/examples/FFI_static.rst`` + ``beat import --results
--import_from_mode geometry --mode ffi``, ``apps/beat.py:543-770``):

  1. import the real project (no pyrocko needed);
  2. geometry-mode SMC → MAP rectangular source (recovers the published
     SW-dipping normal fault: strike ≈ 146°, dip ≈ 52°, rake ≈ −110°);
  3. clone the config to ffi mode with the docs' prior narrowing
     (uparr ∈ [−0.1, 2] m, uperp ∈ [−1, 1] m) and the NNLS warm start;
  4. build the static GF library from the geometry-MAP fault (extended
     0.4/0.2 fractionally, 2 km patches) — ramp corrections are FIXED
     at their geometry-MAP values and removed from the data;
  5. import the geometry posterior as priors (hyper HDI narrowing);
  6. laplacian-regularized slip SMC posterior (expect VR ≈ 96-98 % per
     scene, Mw ≈ 6.35, slip concentrated at 5-10 km depth);
  7. render the slip-distribution money plot (posterior mean +
     uncertainty panels).

Pass ``--resolution`` to use the Atzori-style resolution-based
discretization (ε-elbow damping search) instead of the uniform grid.

Run:  python examples/laquila_ffi_staged.py [workdir] [--resolution]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLES = "/root/reference/data/examples/Laquila"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    resolution = "--resolution" in sys.argv
    dest = args[0] if args else "/tmp/laquila_staged_example"

    from beat_tpu import interop
    from beat_tpu.apps.cli import main as cli
    from beat_tpu.config import (clone_config_to_mode, dump_config,
                                 import_results_as_priors)
    from beat_tpu.models.problem import load_model
    from beat_tpu.parameter import Parameter
    from beat_tpu.samplers import SMCParams

    # 1-2. import + geometry posterior
    if not os.path.isdir(os.path.join(dest, "geometry", "stage_-1")):
        interop.import_beat_project(EXAMPLES, dest, build=False)
        prob = load_model(dest, "geometry")
        prob.sampler_params = SMCParams(n_chains=400, n_steps=80,
                                        tune_interval=20, seed=3)
        t0 = time.time()
        prob.sample()
        print(f"geometry stage: {time.time() - t0:.0f} s")
        map_pt = geometry_map(prob)
        print("geometry MAP:", {k: round(float(np.atleast_1d(v)[0]), 2)
                                for k, v in map_pt.items()
                                if k in ("strike", "dip", "rake", "slip")})

    # 3. ffi config (docs' prior narrowing + NNLS warm start)
    if not os.path.exists(os.path.join(dest, "config_ffi.yaml")):
        cfg = clone_config_to_mode(dest, "ffi")
        pc = cfg.problem_config
        pc.initialization = "lsq"
        pc.priors["uparr"] = Parameter(
            "uparr", np.array([-0.1]), np.array([2.0]),
            testvalue=np.array([1.0])).to_dict()
        pc.priors["uperp"] = Parameter(
            "uperp", np.array([-1.0]), np.array([1.0]),
            testvalue=np.array([0.0])).to_dict()
        dump_config(cfg, dest)

    # 4. static GF library from the geometry-MAP fault
    build = ["build_gfs", dest, "--mode", "ffi", "--datatypes", "geodetic",
             "--patch_length", "2", "--patch_width", "2",
             "--extension_length", "0.4", "--extension_width", "0.2"]
    if resolution:
        build += ["--discretization", "resolution"]
    cli(build)

    # 5. geometry posterior → priors (hyper HDI narrowing)
    import_results_as_priors(dest, "ffi", "geometry")

    # 6. distributed-slip posterior
    prob = load_model(dest, "ffi")
    prob.sampler_params = SMCParams(n_chains=500, n_steps=100,
                                    tune_interval=20, seed=5)
    t0 = time.time()
    q_tr, llk_tr = prob.sample()
    print(f"ffi stage: {time.time() - t0:.0f} s")

    final = np.asarray(q_tr[-1])
    map_pt = prob.ordering.to_point(final[np.argmax(np.asarray(llk_tr[-1]))])
    comp = prob.composites["geodetic"]
    fault = comp.fault
    slip = np.hypot(np.asarray(map_pt["uparr"]), np.asarray(map_pt["uperp"]))
    centers = np.concatenate([fault.get_subfault(i).patch_centers_enz()
                              for i in range(fault.nsubfaults)])
    imax = int(np.argmax(slip))
    print("FFI VRs:", {k: round(float(v), 3)
                       for k, v in comp.get_variance_reductions(map_pt).items()})
    print(f"peak slip {slip[imax]:.2f} m at {centers[imax, 2] / 1e3:.1f} km "
          f"depth, Mw {fault.magnitude(slip):.2f} "
          f"({fault.npatches} patches)")

    # 7. money plot
    cli(["plot", dest, "slip_distribution,scene_fits", "--mode", "ffi"])


def geometry_map(prob):
    from beat_tpu.backend import SampleStage

    handler = SampleStage(prob.outfolder, ordering=prob.ordering)
    pop, llks = handler.load_trace(-1).end_points()
    return prob.ordering.to_point(pop[int(np.argmax(llks))])


if __name__ == "__main__":
    main()
