"""Persistent XLA compilation cache.

First compile of the fused train step costs minutes; the on-disk cache makes
every later process start (resume, bench, eval) near-instant.  No reference
equivalent (torch caches nothing across runs).
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "DWCGAN_COMPILE_CACHE", os.path.expanduser("~/.cache/dwcgan_jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
