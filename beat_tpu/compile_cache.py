"""
Persistent XLA compilation cache for library users.

Cold compiles through a remote TPU backend cost seconds to tens of
seconds per program; the sampler step programs recompile whenever the
process (or the ``logp`` closure) is new.  The in-process jit cache is
handled by :meth:`Problem.make_logp_fn` caching its closure; this
module covers the ACROSS-process axis: compiled executables are
serialized to disk keyed by their HLO hash, so a rerun of the same
inversion (resume, bench repetition, CLI invocation) skips the backend
compile entirely.

The ``beat-tpu`` CLI enables this via environment variables before jax
imports (``apps/cli.py:_enable_compile_cache``); library entry points
call :func:`enable_persistent_compile_cache` which uses the config API
and therefore works after import too.  A user-set
``JAX_COMPILATION_CACHE_DIR`` always wins.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("beat_tpu.compile_cache")

DEFAULT_DIR = "~/.beat_tpu/jax_cache"

_done = False


def enable_persistent_compile_cache(cache_dir: str | None = None) -> None:
    """Idempotently point jax's persistent compilation cache at
    ``cache_dir`` (default ``~/.beat_tpu/jax_cache``), honoring any
    existing user configuration.  Safe to call before or after backend
    initialization; failures (read-only filesystem, exotic backends
    that cannot serialize executables) degrade to a debug log."""
    global _done
    if _done:
        return
    _done = True
    try:
        import jax

        if (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or jax.config.jax_compilation_cache_dir):
            return  # user already chose a cache location
        path = os.path.expanduser(cache_dir or DEFAULT_DIR)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - environment-specific
        logger.debug("persistent compile cache unavailable: %s", e)
