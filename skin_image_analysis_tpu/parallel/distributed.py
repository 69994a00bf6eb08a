"""Multi-host / multi-process initialization and data sharding.

The reference's only "distribution" was Open MPI launching independent
processes (README.md:54). The TPU-native substrate is
``jax.distributed.initialize()`` — after it, ``jax.devices()`` spans the
whole slice/cluster and the existing mesh/sharding code scales
unchanged: DCN coordinates between hosts, collectives ride ICI within a
slice, and the same ``with_sharding_constraint``-annotated train step
runs from 1 chip to a pod.

Three pieces:

- :func:`maybe_initialize` — call once at CLI startup. No-op on a
  single host; initializes from the standard TPU-pod environment, or
  from explicit ``SIA_COORDINATOR`` / ``SIA_NUM_PROCESSES`` /
  ``SIA_PROCESS_ID`` variables for torchrun-style CPU/GPU launches.
- :func:`process_shard` — the contiguous row range this process owns:
  each host decodes/loads ONLY its shard of the cohort (the multi-host
  form of the decode-once arena).
- :func:`global_batch` — assemble a device-sharded GLOBAL array from
  each process's local rows (``jax.make_array_from_process_local_data``)
  so the jitted step sees one logical batch.

Proven cross-process: a 2-process Gloo cluster trains the production
step to parameters identical with the single-process run
(tests/test_multiprocess.py).
"""

from __future__ import annotations

import os

import numpy as np

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed when a multi-process environment is
    detected; returns True when running multi-process.

    Detection, in priority order:

    1. ``SIA_COORDINATOR`` (+ ``SIA_NUM_PROCESSES``, ``SIA_PROCESS_ID``)
       — explicit, launcher-agnostic;
    2. the standard JAX/TPU-pod variables (``JAX_COORDINATOR_ADDRESS``
       etc.), where ``jax.distributed.initialize()`` self-configures.
    """
    global _initialized
    if _initialized:
        return True

    import jax

    if os.environ.get("SIA_COORDINATOR"):
        missing = [v for v in ("SIA_NUM_PROCESSES", "SIA_PROCESS_ID")
                   if not os.environ.get(v)]
        if missing:
            raise ValueError(
                f"SIA_COORDINATOR is set but {', '.join(missing)} "
                "is/are not — the three variables configure one cluster "
                "and must be set together (see docs/OPERATIONS.md)")
        jax.distributed.initialize(
            coordinator_address=os.environ["SIA_COORDINATOR"],
            num_processes=int(os.environ["SIA_NUM_PROCESSES"]),
            process_id=int(os.environ["SIA_PROCESS_ID"]),
        )
        _initialized = True
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
    jax.distributed.initialize()
    _initialized = True
    return True


def process_shard(n_rows: int) -> tuple[int, int]:
    """[start, end) of the cohort rows this process loads.

    Contiguous equal-ish split (first ``n_rows % p`` processes take one
    extra row) — for DECODE/CACHE ownership, where uneven shards are
    fine. Per-step batch assembly through :func:`global_batch` needs
    EQUAL local row counts on every process (a uniform NamedSharding
    cannot represent uneven shards): draw per-step batches with
    ``global_B % process_count == 0``, padding any cohort tail with
    ``valid=False`` rows (the batch dicts carry a validity mask that
    makes padding semantically inert).
    Single process: the whole range.
    """
    import jax

    p, i = jax.process_count(), jax.process_index()
    base, extra = divmod(n_rows, p)
    start = i * base + min(i, extra)
    return start, start + base + (1 if i < extra else 0)


def global_batch(mesh, local: dict, data_axis: str = "data") -> dict:
    """Assemble one global device-sharded batch dict from each process's
    local rows. Every process passes its own ``local`` arrays (host
    numpy, leading dim = global_batch/process_count — the SAME on every
    process; see :func:`process_shard` for the uneven-tail recipe); the
    result behaves as a single [global_B, ...] array sharded over the
    mesh's data axis.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rows = {k: int(np.shape(v)[0]) if np.ndim(v) else -1
            for k, v in local.items()}
    if len(set(rows.values())) > 1:
        raise ValueError(
            f"global_batch needs one row count across all arrays, got "
            f"{rows} — pad uneven tails with valid=False rows instead"
        )

    sharding = NamedSharding(mesh, P(data_axis))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local.items()
    }


def process_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
