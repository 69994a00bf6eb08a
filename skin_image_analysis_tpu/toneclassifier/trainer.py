"""Tone-classifier trainer: ResNet transfer on {light, dark}.

Capability parity with notebooks/ToneClassifier/CNNTrial.py: ResNet
backbone with a Dropout(0.5)+Dense(2) head (:80-87), class-weighted loss
(:95-96), AdamW lr=1e-3 (:99), train augmentation = RandomHorizontalFlip
+ RandomCrop(224) + ImageNet Normalize (CNNTrialDataset.py:54-60),
per-epoch accuracy/precision/recall/F1 logged wandb-style (:150-156), and
an optional weighted-with-replacement oversampler (the sampler the
reference builds at :65-71). The reference's single multi-GPU line
(nn.DataParallel, :89-90) is subsumed by the standard mesh data-parallel
train step.

Labels: fitzpatrick I/II → 0 (light), III-VI → 1 (dark)
(CNNTrialDataset.py:11-25); rows whose image file is missing on disk are
dropped (:41-46).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

import jax

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.data.dataset import LesionTable
from skin_image_analysis_tpu.data.loader import BatchIterator, HostImageStore
from skin_image_analysis_tpu.ops.preprocess import AugmentConfig, make_preprocess_fn
from skin_image_analysis_tpu.toneclassifier.class_weight import (
    balanced_class_weights,
)
from skin_image_analysis_tpu.train.state import create_train_state
from skin_image_analysis_tpu.train.step import make_eval_step, make_train_step
from skin_image_analysis_tpu.utils.metrics_log import MetricsLogger, binary_metrics


@dataclass(frozen=True)
class ToneTrainConfig:
    model_name: str = "resnet50"
    image_size: int = 224
    canonical_size: int = 256
    batch_size: int = 32
    epochs: int = 10
    learning_rate: float = 1e-3     # AdamW (CNNTrial.py:99)
    weight_decay: float = 0.01
    use_class_weights: bool = True
    oversample: bool = False        # WeightedRandomSampler equivalent
    seed: int = 0
    compute_dtype: str = "bfloat16"
    out_dir: str = "tone_runs"


class ToneTable(LesionTable):
    """LesionTable with skin-tone labels (light=0/dark=1) instead of
    diagnosis labels (fitzpatrick_converter, CNNTrialDataset.py:11-25)."""

    def __init__(self, metadata_df, root_dir):
        df = metadata_df[metadata_df["fitzpatrick_skin_type"].notna()].copy()
        # drop rows without an image on disk (CNNTrialDataset.py:41-46)
        exists = [
            os.path.exists(os.path.join(root_dir, f"{i}.jpg"))
            for i in df["isic_id"]
        ]
        df = df[np.asarray(exists)]
        df["tone_label"] = [
            "light" if t in ("I", "II") else "dark"
            for t in df["fitzpatrick_skin_type"]
        ]
        super().__init__(
            df, root_dir, class_names=("light", "dark"),
            label_column="tone_label",
        )


def _oversampled_order(labels: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Weighted-with-replacement epoch order equalizing expected class
    frequency (the reference's WeightedRandomSampler, CNNTrial.py:65-71)."""
    weights = balanced_class_weights(labels)[labels]
    p = weights / weights.sum()
    return rng.choice(len(labels), size=len(labels), replace=True, p=p)


def train_tone_classifier(
    train_df,
    test_df,
    root_dir: str,
    cfg: ToneTrainConfig = ToneTrainConfig(),
    verbose: bool = True,
) -> dict:
    """Returns {state, history, test_metrics, out_dir}."""
    train_table = ToneTable(train_df, root_dir)
    test_table = ToneTable(test_df, root_dir)
    train_store = HostImageStore(train_table, cfg.canonical_size)
    test_store = HostImageStore(test_table, cfg.canonical_size)

    class_weights = (
        tuple(balanced_class_weights(train_table.labels))
        if cfg.use_class_weights
        else None
    )

    model_cfg = ModelConfig(
        name=cfg.model_name, num_classes=2, image_size=cfg.image_size,
        compute_dtype=cfg.compute_dtype,
    )
    optim_cfg = OptimConfig(
        optimizer="adamw", learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
    )
    state, model = create_train_state(
        model_cfg, optim_cfg, jax.random.key(cfg.seed),
        batch_size=cfg.batch_size,
    )

    train_pre = make_preprocess_fn(
        cfg.image_size, train=True,
        augment=AugmentConfig(random_crop=True, horizontal_flip=True),
        normalize_imagenet=True,
    )
    eval_pre = make_preprocess_fn(
        cfg.image_size, train=False, normalize_imagenet=True
    )
    train_step = make_train_step(
        class_weights=class_weights, preprocess_fn=train_pre
    )
    eval_step = make_eval_step(preprocess_fn=eval_pre)

    order_fn = (
        (lambda rng: _oversampled_order(train_table.labels, rng))
        if cfg.oversample
        else None
    )
    train_loader = BatchIterator(
        train_store, cfg.batch_size, shuffle=True, drop_remainder=True,
        seed=cfg.seed + 1, order_fn=order_fn,
    )
    test_loader = BatchIterator(
        test_store, cfg.batch_size, shuffle=False, drop_remainder=False
    )

    history = []
    with MetricsLogger(cfg.out_dir, run_name=f"tone_{cfg.model_name}") as logger:
        step_idx = 0
        for epoch in range(cfg.epochs):
            losses = []
            for batch in train_loader:
                state, metrics = train_step(state, batch)
                loss = float(metrics["loss"])
                losses.append(loss)
                logger.log({"train_loss": loss}, step=step_idx)
                step_idx += 1

            # async-dispatch all eval batches; one fetch for the pass
            outs = []
            host_labels = []
            for batch in test_loader:
                outs.append(
                    eval_step(state.params, state.apply_fn, batch,
                              state.batch_stats)
                )
                host_labels.append(np.asarray(batch["label"]))
            outs = jax.device_get(outs)
            preds, labels = [], []
            for out, lab in zip(outs, host_labels):
                valid = out["valid"]
                preds.append(out["pred"][valid])
                labels.append(lab[valid])
            m = binary_metrics(np.concatenate(preds), np.concatenate(labels))
            m["epoch"] = epoch
            m["train_loss_mean"] = float(np.mean(losses)) if losses else 0.0
            logger.log(m, step=step_idx)
            history.append(m)
            if verbose:
                print(f"epoch {epoch}: {m}")

    return {
        "state": state,
        "history": history,
        "test_metrics": history[-1] if history else {},
        "out_dir": cfg.out_dir,
    }
