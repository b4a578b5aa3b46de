"""Persistent XLA compile-cache enablement.

The deployment environment's sitecustomize imports jax at interpreter
startup, so setting `JAX_COMPILATION_CACHE_DIR` in Python (env-var
mutation after startup) is a silent no-op — the config default was already
captured as None. The reliable path is `jax.config.update` after import,
which this helper applies exactly once. SLAMSystem calls it from its
constructor so every entry point (CLI, tests, bench, tools) gets warm
recompiles; the first full-pipeline TPU compile is ~15 min over the
tunnel, warm runs are minutes.
"""

from __future__ import annotations

import os

_DEFAULT = "/root/.cache/jax_tpu"
_done = False


def enable(path: str | None = None) -> None:
    """Idempotently point jax at a persistent compilation cache."""
    global _done
    if _done:
        return
    _done = True
    import jax

    if jax.config.jax_compilation_cache_dir:  # already configured
        return
    cache = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover — older jax without the knob
        pass
