"""The HPO objective: short proxy-training of a sampled architecture.

Behavior parity with the reference objective (tone_bias_optuna.py:234-288):
a 300-row sample of the tone metadata, 2/3-1/3 split, EPOCHS=10 epochs with
per-epoch caps (<=384 train, <=128 valid examples at batch 32), per-epoch
``trial.report(accuracy, epoch)`` + median-prune check, returning the final
validation accuracy.

TPU-native shape: the sampled data lives on device once as uint8 arrays
(no per-trial DataLoader forks), each candidate's train step is jitted at
its own shapes, and batches are fixed-size so each architecture compiles
exactly once per trial.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.config import HpoConfig
from skin_image_analysis_tpu.hpo.space import define_isic_model
from skin_image_analysis_tpu.hpo.study import TrialPruned
from skin_image_analysis_tpu.train.state import create_train_state
from skin_image_analysis_tpu.train.step import make_eval_step, make_train_step


class ArrayDataset:
    """In-memory (pixels uint8 [N,S,S,3], labels i32 [N]) split."""

    def __init__(self, pixels: np.ndarray, labels: np.ndarray):
        self.pixels = pixels
        self.labels = labels.astype(np.int32)
        self._device_pixels = None

    def device_pixels(self) -> jnp.ndarray:
        if self._device_pixels is None:
            self._device_pixels = jnp.asarray(self.pixels)
        return self._device_pixels

    def __len__(self) -> int:
        return len(self.labels)

    @staticmethod
    def sample_split(
        pixels: np.ndarray,
        labels: np.ndarray,
        sample_size: int,
        seed: int,
        train_fraction: float = 2 / 3,
    ) -> tuple["ArrayDataset", "ArrayDataset"]:
        """Reference get_isic(): random sample → 2/3-1/3 split
        (tone_bias_optuna.py:175-231)."""
        rng = np.random.default_rng(seed)
        n = min(sample_size, len(labels))
        idx = rng.permutation(len(labels))[:n]
        cut = int(train_fraction * n)
        return (
            ArrayDataset(pixels[idx[:cut]], labels[idx[:cut]]),
            ArrayDataset(pixels[idx[cut:]], labels[idx[cut:]]),
        )


def _batches(ds: ArrayDataset, batch_size: int, limit: int, rng: np.random.Generator):
    """Batches gather from the device-resident pixel arena — per-trial
    training never re-ships pixels over the host link."""
    order = rng.permutation(len(ds))
    stop = min(limit, (len(ds) // batch_size) * batch_size)
    arena = ds.device_pixels()
    for start in range(0, stop, batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size:
            return
        yield {
            "pixels": arena[jnp.asarray(idx)],
            "label": jnp.asarray(ds.labels[idx]),
            "row_id": jnp.asarray(idx.astype(np.int32)),
            "valid": jnp.ones((batch_size,), bool),
        }


def make_objective(
    train_pixels: np.ndarray,
    labels: np.ndarray,
    cfg: HpoConfig = HpoConfig(),
    image_size: int | None = None,
    compute_dtype: str = "bfloat16",
):
    """Build an ``objective(trial) -> accuracy`` over in-memory data."""
    if image_size is None:
        image_size = train_pixels.shape[1]

    def objective(trial: Any) -> float:
        model_cfg, optim_cfg = define_isic_model(
            trial, image_size=image_size, compute_dtype=compute_dtype
        )
        rng = np.random.default_rng(cfg.seed + 1000 + trial.number)
        train_ds, valid_ds = ArrayDataset.sample_split(
            train_pixels, labels, cfg.sample_size, cfg.seed + trial.number
        )
        state, _ = create_train_state(
            model_cfg, optim_cfg, jax.random.key(cfg.seed + trial.number),
            batch_size=cfg.batch_size,
        )
        train_step = make_train_step()
        eval_step = make_eval_step()

        accuracy = 0.0
        for epoch in range(cfg.epochs):
            for batch in _batches(
                train_ds, cfg.batch_size, cfg.n_train_examples, rng
            ):
                state, _ = train_step(state, batch)
            correct = total = 0
            for batch in _batches(
                valid_ds, cfg.batch_size, cfg.n_valid_examples, rng
            ):
                out = eval_step(state.params, state.apply_fn, batch)
                correct += int(
                    (np.asarray(out["pred"]) == np.asarray(batch["label"])).sum()
                )
                total += len(np.asarray(out["pred"]))
            accuracy = correct / max(total, 1)
            trial.report(accuracy, epoch)
            if trial.should_prune():
                raise TrialPruned()
        return accuracy

    return objective
