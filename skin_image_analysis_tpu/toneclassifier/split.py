"""Train/test split persistence for the tone-classifier task.

Parity with notebooks/ToneClassifier/TestTrainSplit.py: 70/30
sample-based split written to trainmeta.csv / testmeta.csv (seeded here)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def split_metadata_csv(
    metadata_csv: str,
    out_dir: str | None = None,
    frac: float = 0.7,
    seed: int | None = 0,
) -> tuple[str, str]:
    """Returns (trainmeta_path, testmeta_path)."""
    df = pd.read_csv(metadata_csv)
    rng = np.random.default_rng(seed)
    train = df.sample(frac=frac, random_state=rng)
    test = df.drop(train.index)
    out_dir = out_dir or os.path.dirname(os.path.abspath(metadata_csv))
    train_path = os.path.join(out_dir, "trainmeta.csv")
    test_path = os.path.join(out_dir, "testmeta.csv")
    train.to_csv(train_path, index=False)
    test.to_csv(test_path, index=False)
    return train_path, test_path
