"""Runtime setup helpers shared by the CLIs and bench."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/samroad_xla") -> None:
    """Persistent XLA compilation cache. On remote-attached TPUs a single
    compile takes minutes; caching makes repeat CLI invocations with the same
    shapes start in seconds."""
    import jax

    cache_dir = os.path.expanduser(path)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs
