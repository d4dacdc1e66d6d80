"""Persistent XLA compilation cache for recipes and benchmarks.

The flagship 3D / zoo-bundle programs take minutes to compile (the brain
bundle ~10 min on a v5e); without a persistent cache every recipe
invocation pays that again. JAX ships a disk cache but leaves it off by
default — this helper turns it on process-wide with sane thresholds.

The reference has no analogue (torch eager pays no compile); this is a
TPU/XLA-specific UX necessity. Called by every `recipes/*.py` main() and
by `bench.py`; honours an explicit `JAX_COMPILATION_CACHE_DIR` already
set in the environment.
"""
from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.expanduser("~/.jax_cache")


def enable_persistent_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (idempotent).

    Any compilation taking >1 s is cached to disk, so re-running a recipe
    (or resuming after a crash) skips straight to execution. Returns the
    cache directory in use.
    """
    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or DEFAULT_CACHE_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return cache_dir
