"""Tone-classifier trainer: ResNet transfer on {light, dark}.

Capability parity with notebooks/ToneClassifier/CNNTrial.py: ResNet
backbone with a Dropout(0.5)+Dense(2) head (:80-87), class-weighted loss
(:95-96), AdamW lr=1e-3 (:99), train augmentation = RandomHorizontalFlip
+ RandomCrop(224) + ImageNet Normalize (CNNTrialDataset.py:54-60),
per-epoch accuracy/precision/recall/F1 logged wandb-style (:150-156), and
an optional weighted-with-replacement oversampler (:65-71). The
reference's single multi-GPU line (nn.DataParallel, :89-90) is subsumed
by the standard mesh data-parallel train step.

Labels: fitzpatrick I/II → 'light' (0), III-VI → 'dark' (1)
(CNNTrialDataset.py:11-25); rows whose image file is missing on disk are
dropped (:41-46). The training loop itself is the generic
train.classify.train_classifier.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from skin_image_analysis_tpu.data.dataset import LesionTable
from skin_image_analysis_tpu.train.classify import ClassifyConfig, train_classifier


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
    freeze_backbone: bool = False   # frozen-feature transfer (head-only)
    input_mode: str = "rgb"         # "ita" = stage-3 ITA-matrix CNN
    five_crop_eval: bool = False    # 5-crop TTA (CNNTrialDataset.py:61-65)
    seed: int = 0
    compute_dtype: str = "bfloat16"
    out_dir: str = "tone_runs"
    steps_per_dispatch: int = 1     # >1: scanned multi-step dispatch
    keep_best: str = ""             # metric → save session_model_best
    early_stop_patience: int = 0    # stop after N non-improving epochs


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


def train_tone_classifier(
    train_df,
    test_df,
    root_dir: str,
    cfg: ToneTrainConfig = ToneTrainConfig(),
    verbose: bool = True,
) -> dict:
    """Returns {state, history, test_metrics, out_dir}."""
    return train_classifier(
        ToneTable(train_df, root_dir),
        ToneTable(test_df, root_dir),
        ClassifyConfig(
            model_name=cfg.model_name,
            num_classes=2,
            image_size=cfg.image_size,
            canonical_size=cfg.canonical_size,
            batch_size=cfg.batch_size,
            epochs=cfg.epochs,
            learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            optimizer="adamw",
            use_class_weights=cfg.use_class_weights,
            oversample=cfg.oversample,
            freeze_backbone=cfg.freeze_backbone,
            input_mode=cfg.input_mode,
            five_crop_eval=cfg.five_crop_eval,
            augment=True,
            normalize_imagenet=True,
            seed=cfg.seed,
            compute_dtype=cfg.compute_dtype,
            out_dir=cfg.out_dir,
            steps_per_dispatch=cfg.steps_per_dispatch,
            checkpoint_best=bool(cfg.keep_best),
            best_metric=cfg.keep_best or "accuracy",
            early_stop_patience=cfg.early_stop_patience,
        ),
        verbose=verbose,
    )
