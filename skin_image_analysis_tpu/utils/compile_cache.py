"""Persistent XLA compilation cache.

In this environment compiles go through a remote-compile relay with large
constant latency (~30-90s per distinct program). The persistent cache
makes every rerun of the same program shape instant, which matters for
CLI workflows that are invoked repeatedly (train → test → explain on the
same model shapes).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/skin_tpu_xla")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    # Measured on the axon remote-compile relay: cache *reads* are slower
    # than fresh compiles (executable deserialization goes back through
    # the relay), so the persistent cache is only enabled on directly
    # attached backends. Override with SKIN_TPU_COMPILE_CACHE=dir.
    platforms = (jax.config.jax_platforms or "").split(",")
    forced = "SKIN_TPU_COMPILE_CACHE" in os.environ
    if platforms and platforms[0] == "axon" and not forced:
        return

    cache_dir = cache_dir or os.environ.get(
        "SKIN_TPU_COMPILE_CACHE", _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or already-initialized backend: best effort
