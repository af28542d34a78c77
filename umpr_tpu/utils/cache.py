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
    Safe no-op when the config keys are unavailable (old jax)."""
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
