"""
Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware
(the driver separately dry-runs the multi-chip path; see
``__graft_entry__.dryrun_multichip``).

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
