"""Shared persistent-compile-cache setup (CLIs, bench, entry points).

Remote-TPU compiles take tens of seconds; the repo-local .jax_cache
(gitignored) persists them across processes. One helper so the cache
location/policy lives in exactly one place.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> None:
    """Point jax at the repo-local .jax_cache; safe no-op on failure."""
    import jax

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
