"""Jitted train / eval steps, optionally sharded over a device mesh.

Replaces the reference's per-batch Python loop body
(tone_bias_train.py:124-157: .to(device), zero_grad, forward, NLL loss,
backward, step, running argmax stats) with one compiled XLA program per
batch: forward + backward + optimizer update + metrics fused, donated
state, batch sharded over the mesh's data axis so the gradient all-reduce
rides ICI.

Batches are dicts ``{"pixels": [B,H,W,3] f32, "label": [B] i32,
"row_id": [B] i32, "valid": [B] bool}`` — ``row_id`` is the TPU-native form
of the reference Dataset's third tuple element (tone_bias_dataset.py:343),
and ``valid`` masks padding rows so static batch shapes never change
metric semantics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skin_image_analysis_tpu.ops.losses import nll_loss
from skin_image_analysis_tpu.train.state import TrainState


def _loss_and_metrics(
    apply_fn, params, batch_stats, batch, dropout_rng, class_weights,
    preprocess_fn, aug_rng,
):
    pixels = batch["pixels"]
    if preprocess_fn is not None:
        # Fused into the same XLA program as the forward/backward pass:
        # uint8 batches stay uint8 across the host->HBM transfer and are
        # cast/cropped/flipped/normalized on device.
        pixels = preprocess_fn(pixels, aug_rng)
    if batch_stats is not None:
        log_probs, mutated = apply_fn(
            {"params": params, "batch_stats": batch_stats},
            pixels,
            train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        new_stats = mutated["batch_stats"]
    else:
        log_probs = apply_fn(
            {"params": params},
            pixels,
            train=True,
            rngs={"dropout": dropout_rng},
        )
        new_stats = None
    valid = batch.get("valid")
    labels = batch["label"]
    if valid is None:
        loss = nll_loss(log_probs, labels, class_weights)
        preds = jnp.argmax(log_probs, axis=-1)
        correct = jnp.sum(preds == labels)
        count = labels.shape[0]
        return loss, (correct, count, new_stats)
    else:
        # Masked mean: padded rows contribute nothing to loss or counts.
        picked = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
        w = valid.astype(jnp.float32)
        if class_weights is not None:
            w = w * jnp.asarray(class_weights)[labels]
        loss = -jnp.sum(w * picked) / jnp.maximum(jnp.sum(w), 1.0)
        preds = jnp.argmax(log_probs, axis=-1)
        correct = jnp.sum((preds == labels) & valid)
        count = jnp.sum(valid)
    return loss, (correct, count, new_stats)


def make_train_step(
    class_weights=None,
    mesh: Mesh | None = None,
    data_axis: str = "data",
    preprocess_fn: Callable | None = None,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Build the compiled train step.

    With a mesh, the batch is constrained to the data axis and params to
    their (replicated / TP) shardings already attached to the state; XLA
    emits the grad all-reduce. Without a mesh this is plain single-device
    jit — the same code path either way.
    """
    cw = None if class_weights is None else jnp.asarray(class_weights)

    def step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        if mesh is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, NamedSharding(mesh, P(data_axis))
            )
        step_rng = jax.random.fold_in(state.rng, state.step)
        dropout_rng, aug_rng = jax.random.split(step_rng)
        grad_fn = jax.value_and_grad(
            partial(_loss_and_metrics, state.apply_fn), has_aux=True
        )
        (loss, (correct, count, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, dropout_rng, cw,
            preprocess_fn, aug_rng,
        )
        state = state.apply_gradients(grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        metrics = {"loss": loss, "correct": correct, "count": count}
        return state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_multi_train_step(
    k: int,
    class_weights=None,
    mesh: Mesh | None = None,
    data_axis: str = "data",
    preprocess_fn: Callable | None = None,
) -> Callable:
    """k train steps inside ONE compiled program (lax.scan), gathering
    pixel batches from the device-resident uint8 arena by index.

    Every dispatch through the remote relay costs ~2 ms (docs/PERF.md);
    scanning k steps per dispatch amortizes it and keeps the whole epoch
    on device — the arena never moves, only [k, B] index/label arrays
    cross the host link per super-step.

    Signature: ``multi(state, arena, idx [k,B] i32, label [k,B] i32,
    valid [k,B] bool) -> (state, {"loss" [k], "correct" [k], "count"
    [k]})``. Steps whose ``valid`` row is all-False are inert: gradients
    are computed but the update is skipped (lax.cond), so padded tail
    super-steps neither move parameters nor advance the RNG step.

    When ``preprocess_fn`` is the Pallas planar kernel (it advertises
    ``supports_rows``) and there is no mesh, the batch gather fuses into
    the kernel itself: the grid DMA fetches arena plane ``rows[i]``
    directly, so the materialized uint8 batch copy disappears.
    """
    cw = None if class_weights is None else jnp.asarray(class_weights)
    fuse_gather = mesh is None and getattr(
        preprocess_fn, "supports_rows", False
    )

    @partial(jax.jit, donate_argnums=(0,))
    def multi(state, arena, idx, label, valid):
        assert idx.shape[0] == k, (
            f"make_multi_train_step built for k={k} but got "
            f"{idx.shape[0]}-step index arrays"
        )

        def one_step(state: TrainState, xs):
            i, lb, vd = xs
            step_rng = jax.random.fold_in(state.rng, state.step)
            dropout_rng, aug_rng = jax.random.split(step_rng)
            if fuse_gather:
                pixels = preprocess_fn(arena, aug_rng, rows=i)
                pf = None
            else:
                pixels = jnp.take(arena, i, axis=0)
                pf = preprocess_fn
            batch = {"pixels": pixels, "label": lb, "valid": vd}
            if mesh is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, NamedSharding(mesh, P(data_axis))
                )
            grad_fn = jax.value_and_grad(
                partial(_loss_and_metrics, state.apply_fn), has_aux=True
            )
            (loss, (correct, count, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, batch, dropout_rng, cw,
                pf, aug_rng,
            )

            def apply(s):
                s = s.apply_gradients(grads)
                if new_stats is not None:
                    s = s.replace(batch_stats=new_stats)
                return s

            state = jax.lax.cond(jnp.any(vd), apply, lambda s: s, state)
            return state, {"loss": loss, "correct": correct, "count": count}

        state, metrics = jax.lax.scan(one_step, state, (idx, label, valid))
        return state, metrics

    return multi


def make_multi_eval_step(
    k: int,
    mesh: Mesh | None = None,
    data_axis: str = "data",
    preprocess_fn: Callable | None = None,
) -> Callable:
    """k eval batches inside ONE compiled program (lax.scan), gathering
    pixels from the device-resident uint8 arena by index — the eval
    mirror of :func:`make_multi_train_step`.

    Per-batch eval dispatches cost ~2 ms each through the remote relay
    (docs/PERF.md); a per-epoch full-test fairness pass at ISIC-2020
    scale (~130 batches at B=256) pays that tax per batch. Scanning k
    batches per dispatch amortizes it; only [k, B] index/row_id/valid
    arrays cross the host link.

    Signature: ``multi(params, apply_fn, arena, idx [k,B] i32,
    row_id [k,B] i32, valid [k,B] bool, batch_stats=None) ->
    {"pred" [k,B], "log_probs" [k,B,C], "row_id" [k,B], "valid" [k,B]}``.
    Padded tail batches ride through with ``valid=False`` rows; the host
    filter drops them exactly as with per-batch eval.
    """
    fuse_gather = mesh is None and getattr(
        preprocess_fn, "supports_rows", False
    )

    @partial(jax.jit, static_argnums=(1,))
    def multi(params, apply_fn, arena, idx, row_id, valid,
              batch_stats=None):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats

        def one_batch(carry, xs):
            i, rid, vd = xs
            if fuse_gather:
                pixels = preprocess_fn(arena, None, rows=i)
            else:
                pixels = jnp.take(arena, i, axis=0)
                if mesh is not None:
                    pixels = jax.lax.with_sharding_constraint(
                        pixels, NamedSharding(mesh, P(data_axis))
                    )
                if preprocess_fn is not None:
                    pixels = preprocess_fn(pixels, None)
            log_probs = apply_fn(variables, pixels, train=False)
            preds = jnp.argmax(log_probs, axis=-1)
            return carry, {
                "pred": preds,
                "log_probs": log_probs,
                "row_id": rid,
                "valid": vd,
            }

        _, out = jax.lax.scan(one_batch, None, (idx, row_id, valid))
        return out

    return multi


def make_eval_step(
    mesh: Mesh | None = None,
    data_axis: str = "data",
    preprocess_fn: Callable | None = None,
) -> Callable[[Any, Callable, dict], dict]:
    """Compiled eval step: forward (no dropout) + argmax.

    Returns per-example ``{"pred", "log_probs", "row_id", "valid"}``; the
    host (or the on-device metric reductions in metrics.device) joins preds
    back to metadata by row_id — the predict_with_instance equivalent
    (tone_bias_test.py:161-237).
    """

    def step(
        params: Any, apply_fn: Callable, batch: dict, batch_stats: Any = None
    ) -> dict:
        if mesh is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, NamedSharding(mesh, P(data_axis))
            )
        pixels = batch["pixels"]
        if preprocess_fn is not None:
            pixels = preprocess_fn(pixels, None)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        log_probs = apply_fn(variables, pixels, train=False)
        preds = jnp.argmax(log_probs, axis=-1)
        out = {
            "pred": preds,
            "log_probs": log_probs,
            "row_id": batch["row_id"],
        }
        if "valid" in batch:
            out["valid"] = batch["valid"]
        return out

    return jax.jit(step, static_argnums=(1,))


def make_five_crop_eval_step(
    crop_size: int,
    normalize_imagenet: bool = False,
    channels_fn: Callable | None = None,
    input_affine: tuple | None = None,
) -> Callable[[Any, Callable, dict], dict]:
    """Five-crop test-time-augmentation eval step (the experiment
    CNNTrialDataset.py:61-65 documents: four corners + center, predictions
    averaged).

    Expects ``batch["pixels"]`` at canonical (pre-crop) size. The five
    crops are concatenated along the batch axis and ride ONE batched
    forward (a 5x-larger MXU batch, not five dispatches — the cost that
    made the reference shelve the idea, CNNTrialDataset.py:97-104, mostly
    amortizes on the systolic array). Per-crop log-probs are averaged
    (geometric-mean ensemble over the softmax probabilities) before the
    argmax. ``channels_fn`` maps the cropped f32 RGB batch to the model
    input (e.g. data.ita.ita_input for the ITA-matrix CNN); identity when
    None.
    """
    from skin_image_analysis_tpu.ops.preprocess import (
        five_crop_batch,
        preprocess_batch,
    )

    def step(
        params: Any, apply_fn: Callable, batch: dict, batch_stats: Any = None
    ) -> dict:
        # crop first (dtype-preserving), then run the standard eval
        # preprocess on the 5B batch — cast/scale/normalize stay owned by
        # ops.preprocess (the resize inside is a no-op at crop_size)
        x = five_crop_batch(batch["pixels"], crop_size)
        x = preprocess_batch(
            x, None, image_size=crop_size, train=False,
            normalize_imagenet=normalize_imagenet and channels_fn is None,
            input_affine=(input_affine if channels_fn is None else None),
        )
        if channels_fn is not None:
            x = channels_fn(x)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        log_probs = apply_fn(variables, x, train=False)
        log_probs = jnp.mean(
            log_probs.reshape(5, -1, log_probs.shape[-1]), axis=0
        )
        out = {
            "pred": jnp.argmax(log_probs, axis=-1),
            "log_probs": log_probs,
            "row_id": batch["row_id"],
        }
        if "valid" in batch:
            out["valid"] = batch["valid"]
        return out

    return jax.jit(step, static_argnums=(1,))
