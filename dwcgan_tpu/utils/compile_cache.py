"""Persistent XLA compilation cache.

First compile of the fused train step costs minutes; the on-disk cache makes
every later process start (resume, bench, eval) near-instant.  No reference
equivalent (torch caches nothing across runs).

The cache is partitioned by a host-machine fingerprint: XLA:CPU AOT results
encode the compiling machine's ISA features, and loading an entry compiled
on a different CPU generation can hard-abort the process (observed: entries
from an AVX-512/AMX host SIGILL'ed on a host without those features — the
cpu_aot_loader only *warns* before executing).  A per-fingerprint subdir
makes foreign entries invisible instead of fatal.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _machine_fingerprint() -> str:
    """Stable-ish hash of the CPU's ISA surface (+arch)."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    digest = hashlib.sha256(f"{platform.machine()}|{flags}".encode()).hexdigest()
    return digest[:12]


def _platforms_are_accelerator(plats: str | None) -> bool:
    """True only for an explicit non-CPU first platform.

    'Platform unset' counts as unsafe: on a host with no accelerator JAX
    silently falls back to XLA:CPU, whose persistent-cache reloads can abort
    the process (see :func:`enable`).  Requiring an explicit accelerator
    selection means the fallback path never re-enables CPU persistence."""
    first = plats.split(",")[0].strip().lower() if plats else ""
    return bool(first) and first != "cpu"


def _accelerator_backend_selected() -> bool:
    """Explicit non-CPU platform selection, decided WITHOUT initializing
    the backend."""
    import jax

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    return _platforms_are_accelerator(plats)


def enable(cache_dir: str | None = None):
    """Enable the persistent cache — accelerator backends only.

    XLA:CPU persistence is DISABLED: its AOT loader compares the entry's
    compile-time feature string (which contains synthetic tuning flags like
    `+prefer-no-scatter`) against host CPUID features, warns about a
    "machine mismatch" even for entries this very machine wrote, and the
    deserialized executable then aborts the process nondeterministically
    mid-execution (reproduced: `Fatal Python error: Aborted` with the
    cpu_aot_loader E-line in back-to-back CLI runs on the 8-device virtual
    mesh).  Fresh CPU compiles are correct; only reloads are poisoned.
    """
    import jax

    if not _accelerator_backend_selected():
        # No explicit JAX_PLATFORMS: ask the backend itself (initializing it
        # if needed — enable() runs at process start anyway).  This keeps the
        # cache ON for TPU/GPU hosts that rely on JAX's default backend
        # detection (ADVICE r3) while still refusing XLA:CPU persistence.
        try:
            if jax.default_backend() == "cpu":
                return
        except Exception:
            return
    cache_dir = cache_dir or os.environ.get(
        "DWCGAN_COMPILE_CACHE", os.path.expanduser("~/.cache/dwcgan_jax_cache"))
    cache_dir = os.path.join(cache_dir, _machine_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
