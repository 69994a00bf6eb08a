"""Multi-host initialization.

The reference's only "distribution" was Open MPI launching independent
processes (README.md:54). On TPU pods the equivalent substrate is
``jax.distributed.initialize()`` — after it, ``jax.devices()`` spans the
whole slice and the existing mesh/sharding code scales unchanged (DCN
coordination between hosts, ICI collectives within the slice).

Call :func:`maybe_initialize` once at CLI startup; it is a no-op on a
single host (the common case here) and controlled by the standard
JAX_COORDINATOR_ADDRESS / TPU environment when launched on a pod.
"""

from __future__ import annotations

import os

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed when a multi-host environment is
    detected; returns True when running multi-host."""
    global _initialized
    if _initialized:
        return True
    multi_host = any(
        os.environ.get(var)
        for var in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    if not multi_host:
        return False
    import jax

    jax.distributed.initialize()
    _initialized = True
    return True


def process_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
