"""Persistent XLA compilation cache.

The reference compiles ahead of time with nvcc, so its timed window
never includes compilation (gasal_align.cu:219-236 brackets only the
kernel launch).  JAX compiles at first trace; enabling the persistent
cache makes repeated CLI/benchmark invocations comparable to the
reference's measurement protocol.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Opt-in via AGATHA_TPU_CACHE=<dir>.

    Disabled by default: remote-compile serving paths (axon) interact
    badly with the persistent cache (measured 4-6x slower end-to-end),
    while on directly-attached TPU hosts it removes recompilation from
    repeated CLI runs.
    """
    import jax

    path = path or os.environ.get("AGATHA_TPU_CACHE")
    if not path:
        return
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is best-effort; alignment works without it
