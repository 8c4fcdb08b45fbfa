"""Persistent XLA compilation cache.

Remote TPU compiles in tunneled environments can take minutes; the on-disk
compilation cache makes every recompile of an unchanged program a hit across
process restarts.  Called by the CLIs and bench.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Best-effort; call AFTER platform selection.  The cache directory is
    scoped per backend — mixing remote-compiled TPU-terminal artifacts with
    host-CPU executables trips XLA's machine-feature checks."""
    import jax

    base = cache_dir or os.environ.get(
        "BYOGAN_COMPILE_CACHE", os.path.expanduser("~/.cache/byogan_jax")
    )
    try:
        backend = jax.default_backend()
        if backend == "cpu":
            # CPU compiles are fast, and XLA:CPU AOT reload emits noisy
            # machine-feature warnings (prefer-no-scatter/gather pseudo
            # features differ between AOT and JIT paths) — skip the cache.
            return
        scoped = os.path.join(base, backend)
        os.makedirs(scoped, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", scoped)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is best-effort
