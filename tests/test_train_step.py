"""Train-step semantics: learning happens, padding is inert, state donation
round-trips (reference loop: tone_bias_train.py:99-171)."""

import numpy as np

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.train import create_train_state, make_train_step
from skin_image_analysis_tpu.train.step import make_eval_step

SMALL = ModelConfig(
    conv_features=(8, 16),
    linear_features=(32,),
    dropout=(0.1,),
    image_size=32,
    compute_dtype="float32",
)


def _toy_batch(rng, n=16, size=32):
    labels = rng.integers(0, 2, n).astype(np.int32)
    # mean-separable images: label 1 bright, label 0 dark
    pixels = rng.normal(0, 0.05, (n, size, size, 3)).astype(np.float32)
    pixels += labels[:, None, None, None] * 0.8 + 0.1
    return {
        "pixels": jnp.asarray(pixels),
        "label": jnp.asarray(labels),
        "row_id": jnp.arange(n, dtype=jnp.int32),
        "valid": jnp.ones((n,), bool),
    }


def test_loss_decreases():
    rng = np.random.default_rng(0)
    state, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=1e-3), jax.random.key(0), batch_size=4
    )
    step = make_train_step()
    batch = _toy_batch(rng)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_padding_is_inert():
    """A batch with padded rows must give the same loss/metrics as the
    unpadded batch."""
    rng = np.random.default_rng(1)
    batch = _toy_batch(rng, n=8)
    padded = {
        "pixels": jnp.concatenate([batch["pixels"], jnp.full((4, 32, 32, 3), 9.0)]),
        "label": jnp.concatenate([batch["label"], jnp.zeros((4,), jnp.int32)]),
        "row_id": jnp.concatenate([batch["row_id"], -jnp.ones((4,), jnp.int32)]),
        "valid": jnp.concatenate([batch["valid"], jnp.zeros((4,), bool)]),
    }
    state, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=0.0), jax.random.key(0), batch_size=4
    )
    step = make_train_step()
    state1, m1 = step(state, batch)
    # re-create state (donated)
    state, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=0.0), jax.random.key(0), batch_size=4
    )
    state2, m2 = step(state, padded)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    assert int(m1["correct"]) == int(m2["correct"])
    assert int(m1["count"]) == int(m2["count"]) == 8


def test_eval_step():
    rng = np.random.default_rng(2)
    state, model = create_train_state(
        SMALL, OptimConfig(), jax.random.key(0), batch_size=4
    )
    batch = _toy_batch(rng, n=8)
    ev = make_eval_step()
    out = ev(state.params, state.apply_fn, batch)
    assert out["pred"].shape == (8,)
    assert out["log_probs"].shape == (8, 2)
    assert (np.asarray(out["row_id"]) == np.arange(8)).all()


def test_class_weighted_loss():
    rng = np.random.default_rng(3)
    batch = _toy_batch(rng, n=8)
    state, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=0.0), jax.random.key(0), batch_size=4
    )
    stepw = make_train_step(class_weights=(2.96221865, 0.60153444))
    _, mw = stepw(state, batch)
    state, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=0.0), jax.random.key(0), batch_size=4
    )
    stepu = make_train_step()
    _, mu = stepu(state, batch)
    assert float(mw["loss"]) != float(mu["loss"])
