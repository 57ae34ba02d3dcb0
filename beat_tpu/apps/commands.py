"""
Subcommand registrations for the ``beat-tpu`` CLI.

Each ``register_<name>(subparsers)`` wires one subcommand; handlers are
implemented incrementally as the config/model layers land
(reference: ``beat/apps/beat.py`` ``command_*`` functions).
"""

from __future__ import annotations

import logging

logger = logging.getLogger("beat_tpu.cli")


def register_sample(sub):
    p = sub.add_parser("sample", help="sample the solution space of a problem")
    p.add_argument("project_dir")
    p.add_argument("--mode", default="geometry", choices=["geometry", "ffi", "bem"])
    p.add_argument("--hypers", action="store_true", help="sample hyperparameters only")
    p.set_defaults(handler=_cmd_sample)


def _cmd_sample(args):
    from beat_tpu.models import load_model

    problem = load_model(args.project_dir, args.mode)
    if args.hypers:
        problem.estimate_hypers()
    else:
        problem.sample()
    return 0


def register_summarize(sub):
    p = sub.add_parser("summarize", help="summarize sampled posterior")
    p.add_argument("project_dir")
    p.add_argument("--mode", default="geometry")
    p.add_argument("--stage", default="-1")
    p.set_defaults(handler=_cmd_summarize)


def _cmd_summarize(args):
    import json
    import os

    from beat_tpu.backend import SampleStage, summarize_trace
    from beat_tpu.models import load_model

    problem = load_model(args.project_dir, args.mode, build=False)
    handler = SampleStage(problem.outfolder, ordering=problem.ordering)
    trace = handler.load_trace(int(args.stage))
    summary = summarize_trace(trace)
    out = os.path.join(problem.outfolder, "summary.txt")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    for name, rec in summary.items():
        print(f"{name:24s} mean={rec['mean']:+.4g} sd={rec['sd']:.4g} "
              f"r_hat={rec['r_hat']:.3f}")
    logger.info("Wrote %s", out)
    return 0


def register_check(sub):
    p = sub.add_parser("check", help="check problem setup")
    p.add_argument("project_dir")
    p.add_argument("--mode", default="geometry")
    p.add_argument("--what", default="traces")
    p.set_defaults(handler=_cmd_check)


def _cmd_check(args):
    from beat_tpu.models import load_model

    problem = load_model(args.project_dir, args.mode, build=False)
    point = problem.priors.test_point()
    synths = problem.get_synthetics(point)
    print(f"Forward model OK at test point; outputs: "
          f"{ {k: getattr(v, 'shape', v) for k, v in synths.items()} }")
    return 0
