"""vmap/pjit-parallel HPO trial populations.

The reference parallelizes its Optuna sweep by launching independent
processes under Open MPI on a supercomputer (README.md:54) — N hosts, N
processes, zero code. The TPU-native replacement runs a *population* of
same-architecture trials as one XLA program: parameters for K trials are
stacked on a leading axis with ``vmap``, the learning rate becomes a
traced per-trial scalar, and the stacked pytree is sharded over the mesh's
data axis so trials spread across chips under ``jit`` (GSPMD) — K trials
for roughly the wall-clock of one.

Different-architecture trials (the full search space of hpo.space) still
run sequentially per shape — each architecture compiles once — which is
the shape-bucketing fallback documented in SURVEY.md §7 "hard parts".
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.models.cnn import build_model
from skin_image_analysis_tpu.ops.losses import nll_loss


def _stack_batches(pixels: np.ndarray, labels: np.ndarray, batch_size: int,
                   seed: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[n_batches, B, ...] device arrays from host data (shared across
    trials; per-trial divergence comes from init + lr + dropout keys)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(labels))
    n_batches = len(labels) // batch_size
    idx = order[: n_batches * batch_size].reshape(n_batches, batch_size)
    return jnp.asarray(pixels[idx]), jnp.asarray(labels[idx].astype(np.int32))


def train_population(
    model_cfg: ModelConfig,
    learning_rates: np.ndarray,
    train_pixels: np.ndarray,
    train_labels: np.ndarray,
    valid_pixels: np.ndarray,
    valid_labels: np.ndarray,
    epochs: int = 10,
    batch_size: int = 32,
    seed: int = 0,
    mesh: Mesh | None = None,
    trial_axis: str = "data",
) -> dict[str, Any]:
    """Train K = len(learning_rates) stacked trials; returns per-epoch
    validation accuracy [epochs, K] and the final stacked params.
    """
    k = len(learning_rates)
    model = build_model(model_cfg)
    lrs = jnp.asarray(np.asarray(learning_rates, np.float32))

    tb_pixels, tb_labels = _stack_batches(
        train_pixels, train_labels, batch_size, seed
    )
    vb_pixels, vb_labels = _stack_batches(
        valid_pixels, valid_labels, batch_size, seed + 1
    )

    def to_f32(px):
        x = px.astype(jnp.float32)
        return x / 255.0 if px.dtype == jnp.uint8 else x

    def init_one(key):
        dummy = jnp.zeros(
            (1, model_cfg.image_size, model_cfg.image_size, 3), jnp.float32
        )
        params = model.init({"params": key}, dummy, train=False)["params"]
        return params, optax.scale_by_adam().init(params)

    keys = jax.random.split(jax.random.key(seed), k)
    params, opt_state = jax.vmap(init_one)(keys)

    if mesh is not None and k % mesh.shape[trial_axis] == 0:
        shard = NamedSharding(mesh, P(trial_axis))
        spec = jax.tree.map(lambda _: shard, params)
        params = jax.device_put(params, spec)
        opt_state = jax.device_put(
            opt_state, jax.tree.map(lambda _: shard, opt_state)
        )

    def loss_fn(p, pixels, labels, dkey):
        log_probs = model.apply(
            {"params": p}, to_f32(pixels), train=True, rngs={"dropout": dkey}
        )
        return nll_loss(log_probs, labels)

    def one_trial_step(p, opt, lr, pixels, labels, dkey):
        grads = jax.grad(loss_fn)(p, pixels, labels, dkey)
        updates, opt = optax.scale_by_adam().update(grads, opt)
        p = jax.tree.map(lambda w, u: w - lr * u, p, updates)
        return p, opt

    vstep = jax.vmap(one_trial_step, in_axes=(0, 0, 0, None, None, 0))

    @jax.jit
    def train_epoch(params, opt_state, epoch_key):
        def body(carry, batch):
            p, opt, key = carry
            key, sub = jax.random.split(key)
            dkeys = jax.random.split(sub, k)
            pixels, labels = batch
            p, opt = vstep(p, opt, lrs, pixels, labels, dkeys)
            return (p, opt, key), None

        (params, opt_state, _), _ = jax.lax.scan(
            body, (params, opt_state, epoch_key), (tb_pixels, tb_labels)
        )
        return params, opt_state

    def eval_one(p, pixels, labels):
        log_probs = model.apply({"params": p}, to_f32(pixels), train=False)
        return jnp.sum(jnp.argmax(log_probs, -1) == labels)

    veval = jax.vmap(eval_one, in_axes=(0, None, None))

    @jax.jit
    def valid_accuracy(params):
        def body(total, batch):
            pixels, labels = batch
            return total + veval(params, pixels, labels), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((k,), jnp.int32), (vb_pixels, vb_labels)
        )
        return total / (vb_labels.shape[0] * vb_labels.shape[1])

    root = jax.random.key(seed + 17)
    history = []
    for epoch in range(epochs):
        params, opt_state = train_epoch(
            params, opt_state, jax.random.fold_in(root, epoch)
        )
        history.append(np.asarray(valid_accuracy(params)))

    return {
        "accuracy_history": np.stack(history),  # [epochs, K]
        "final_accuracy": history[-1],
        "params": params,
        "learning_rates": np.asarray(learning_rates),
    }
