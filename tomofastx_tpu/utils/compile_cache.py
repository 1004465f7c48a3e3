"""Persistent XLA compilation cache setup.

Over the tunneled axon TPU backend a cold compile of the LSQR while-loop or
a sensitivity build_chunk costs minutes; the persistent cache makes reruns
near-instant. IMPORTANT: on this JAX build the ``JAX_COMPILATION_CACHE_DIR``
environment variable is silently ignored — the cache must be enabled through
``jax.config`` (measured round 2: scripts that only set the env var
recompiled a 105 s build_chunk on every single run while the cache directory
stayed empty). Call :func:`enable` right after ``import jax``.
"""

from __future__ import annotations

import os


def _default_dir() -> str:
    """Prefer a cache INSIDE the repo: the environment (and with it
    ~/.cache) is rebuilt between sessions, but the repo persists — a
    home-dir cache silently costs every new session the full 2-5 min
    LSQR/build compiles again. Falls back to ~/.cache when the package
    is not run from a writable checkout (e.g. site-packages install)."""
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if os.path.isdir(os.path.join(repo, ".git")) and os.access(repo, os.W_OK):
        return os.path.join(repo, ".jax_comp_cache")
    return os.path.expanduser("~/.cache/jax_comp_cache")


def enable(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent)."""
    import jax

    if cache_dir is None:
        cache_dir = _default_dir()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # 0.2 s (not the 1.0 s default): the Mansfield cold wall pays ~19
    # sub-1s glue compiles (~0.3-0.7 s each over the tunnel's remote
    # compile helper) that the default threshold refuses to persist —
    # measured round 5: they are ~6-7 s of the ~11 s cold wall. The
    # entries are KB-class; the commit_compile_cache.sh size guard
    # prunes oldest on overflow.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    return cache_dir
