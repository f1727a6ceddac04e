"""Process-level JAX configuration helpers.

``setup()`` is called by every entry point (run_experiments, bench,
viewer): it enables the persistent compilation cache (the axon
remote-compile path makes first compiles of the fused train step expensive
— minutes — so caching across runs matters) and exposes a switch to force
the CPU backend (the container's sitecustomize pins ``jax_platforms`` to
"axon,cpu", which env vars cannot override).
"""

from __future__ import annotations

import os

import jax

_DONE = False


def setup(cache_dir: str | None = None, platform: str | None = None) -> None:
    global _DONE
    if platform:
        jax.config.update("jax_platforms", platform)
    if _DONE:
        return
    cache_dir = cache_dir or os.environ.get(
        "TS_JAX_CACHE_DIR", os.path.expanduser("~/.cache/ts_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    _DONE = True
