"""Persistent XLA compilation cache setup.

The train step of a real config takes minutes to compile; every process
restart (tunnel kill, curriculum experiment, resume) re-paid it in round 2
because nothing enabled jax's persistent cache.  Verified on this stack
(CPU and the tunneled TPU backend alike): donated executables serialize and
round-trip fine — a second process reuses the entry in ~10 ms.

Entry points call :func:`enable_compilation_cache` before building any
jitted function.  ``DMCF_COMPILE_CACHE`` overrides the directory;
``DMCF_COMPILE_CACHE=0`` disables.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "cache", "jax")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at a repo-local directory.

    Returns the directory used, or None when disabled.
    """
    env = os.environ.get("DMCF_COMPILE_CACHE")
    if env == "0":
        return None
    cache_dir = cache_dir or env or _DEFAULT_DIR
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every executable: the default 1s/small-entry filters would
        # skip the many small helper jits that still cost tunnel round-trips
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - defensive
        log.warning("compilation cache setup failed: %s", e)
        return None
    return cache_dir
