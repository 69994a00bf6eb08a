"""Device-mesh construction.

The reference has no distributed code (single MPS/CPU device; the only
multi-device line is a vestigial ``nn.DataParallel`` in the ToneClassifier
side project, CNNTrial.py:89-90). Scale-out here is the JAX way: one
``jax.sharding.Mesh`` with a ``data`` axis (DP — batch sharded, gradient
all-reduce rides ICI) and a ``model`` axis (TP — the ~51M-param flatten
Dense sharded when asked). All collectives are emitted by the compiler from
sharding annotations; there is no hand-written NCCL/MPI anywhere.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from skin_image_analysis_tpu.config import MeshConfig


def create_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a (data, model) mesh over all (or the given) devices.

    ``data_parallel == -1`` means "every device not claimed by the model
    axis". On one chip this degenerates to a 1x1 mesh, so the same pjit'd
    train step runs unchanged from 1 to N chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel
    if dp == -1:
        if n % mp:
            raise ValueError(f"{n} devices not divisible by model_parallel={mp}")
        dp = n // mp
    if dp * mp != n:
        raise ValueError(
            f"mesh {dp}x{mp} does not cover {n} devices; "
            "set data_parallel=-1 to auto-fill"
        )
    try:
        arr = mesh_utils.create_device_mesh((dp, mp), devices=devices)
    except Exception:
        arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))
