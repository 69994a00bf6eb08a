"""Class-weight computation for the imbalanced tone task.

Parity with notebooks/ToneClassifier/ClassWeight.py: 'balanced' weights
w_c = n_samples / (n_classes * n_c) — the sklearn formula that produced the
reference's hard-coded [2.96221865, 0.60153444] for dark/light counts
622/3063 (CNNTrial.py:95-96) — plus the small-image census
(ClassWeight.py:25-33)."""

from __future__ import annotations

from typing import Sequence

import numpy as np


def balanced_class_weights(labels: Sequence[int], n_classes: int = 2) -> np.ndarray:
    labels = np.asarray(labels)
    counts = np.bincount(labels, minlength=n_classes).astype(np.float64)
    if (counts == 0).any():
        raise ValueError(f"empty class in labels: counts={counts}")
    return labels.size / (n_classes * counts)


def count_small_images(paths: Sequence[str], min_size: int = 224) -> int:
    """How many images have either side below min_size (the reference's
    check before committing to RandomCrop(224))."""
    from PIL import Image

    small = 0
    for p in paths:
        with Image.open(p) as im:
            w, h = im.size
        if w < min_size or h < min_size:
            small += 1
    return small
