"""Worker for tests/test_multiprocess.py: one process of a Gloo CPU
cluster training the production step on its shard of a global batch.

Usage: python tests/_mp_worker.py <process_id> <num_processes> <port>

Prints one JSON line: {"pid", "global_devices", "checksum"} where
checksum is a float over the final params — identical across processes
(replicated params) and identical to the single-process run.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
# 2 virtual CPU devices per process -> 2*nproc global devices
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

if nproc > 1:
    from skin_image_analysis_tpu.parallel.distributed import maybe_initialize

    os.environ["SIA_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["SIA_NUM_PROCESSES"] = str(nproc)
    os.environ["SIA_PROCESS_ID"] = str(pid)
    assert maybe_initialize()

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.parallel.distributed import (
    global_batch,
    process_shard,
)
from skin_image_analysis_tpu.train.state import create_train_state
from skin_image_analysis_tpu.train.step import make_train_step

GLOBAL_B = 8
SIZE = 16
STEPS = 3

mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))

model_cfg = ModelConfig(
    conv_features=(4, 8), linear_features=(8,), dropout=(0.0,),
    image_size=SIZE, compute_dtype="float32",
)
# same seed in every process -> identical (replicated) initial params
state, _ = create_train_state(
    model_cfg, OptimConfig(learning_rate=1e-2), jax.random.key(0),
    batch_size=GLOBAL_B,
)
step = make_train_step(mesh=mesh, preprocess_fn=None)

rng = np.random.default_rng(42)  # same stream everywhere: GLOBAL data
for i in range(STEPS):
    pixels = rng.standard_normal((GLOBAL_B, SIZE, SIZE, 3)).astype(np.float32)
    labels = rng.integers(0, 2, GLOBAL_B).astype(np.int32)
    lo, hi = process_shard(GLOBAL_B)
    batch = global_batch(mesh, {
        "pixels": pixels[lo:hi],
        "label": labels[lo:hi],
        "row_id": np.arange(lo, hi, dtype=np.int32),
        "valid": np.ones(hi - lo, bool),
    })
    state, metrics = step(state, batch)

# checksum over the replicated params: sum of abs-sums per leaf
leaves = jax.tree.leaves(state.params)
checksum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float64))) for l in leaves))
loss = float(metrics["loss"])
print(json.dumps({
    "pid": pid,
    "global_devices": len(jax.devices()),
    "checksum": checksum,
    "last_loss": loss,
}), flush=True)
