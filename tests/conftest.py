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

# XLA compilation dominates test wall-clock on this box — persist compiled
# executables across test runs.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# Pytest plugins may import jax before this conftest mutates the
# environment (the axon sitecustomize registers a TPU plugin at
# interpreter start) — force the platform through the config API too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
