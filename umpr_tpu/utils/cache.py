"""Shared persistent-XLA-compile-cache setup.

Every entry point (main.py, bench.py, __graft_entry__.py, tools/*) wants the
same thing: compiles through this machine's remote-compile relay take
minutes on big graphs, so repeat runs must hit an on-disk cache.  One
implementation so the cache policy cannot drift between tools.
"""

from __future__ import annotations

import os

import jax

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_compile_cache(root=_REPO_ROOT):
    """Point jax's persistent compilation cache at <root>/.jax_cache.
    Safe no-op when the config keys are unavailable (old jax).

    CPU-forced runs skip the cache entirely: on relay-attached hosts the
    remote compile service also serves CPU compiles, writing AOT
    executables built for ITS processor (observed round 5: entries with
    +prefer-no-gather/+amx feature sets this host lacks, loaded with a
    cpu_aot_loader feature-mismatch warning and executing pathologically
    slowly -- ~30 s/step where a fresh local compile runs sub-second
    steps).  CPU compiles here cost seconds, not the relay's minutes, so
    the cache would buy nothing even when healthy.  Callers must set
    jax_platforms BEFORE calling this (main.py does)."""
    try:
        if "cpu" in (jax.config.jax_platforms or ""):
            return
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
