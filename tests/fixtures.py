"""Synthetic ISIC-style dataset fixtures.

Builds a tiny image folder + ``metadata.csv`` with the exact columns the
ingest layer consumes (isic_id, fitzpatrick_skin_type, benign_malignant,
sex, age_approx, patient_id, diagnosis, anatom_site_general, attribution),
including rows that must be filtered out (null skin type, indeterminate
diagnosis) — standing in for the reference's ``tone/`` download
(tone_bias_dataset.py:141-165).
"""

from __future__ import annotations

import csv
import os

import numpy as np
from PIL import Image

FITZ = ["I", "II", "III", "IV", "V", "VI"]


def make_synthetic_dataset(
    root: str, n: int = 48, seed: int = 0, image_size: int = 64,
    base_gap: int = 120, noise: int = 60, label_noise: float = 0.0
) -> list[dict]:
    """``base_gap``/``noise`` set the brightness separation vs in-class
    spread of the label signal; ``label_noise`` flips that fraction of
    image appearances relative to their label. Defaults reproduce the
    easy (fully separable) cohort; a HARD cohort (e.g. base_gap=30,
    noise=60, label_noise=0.15) keeps HPO/accuracy spreads informative
    instead of saturating at 1.0."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    rows = []
    for i in range(n):
        isic_id = f"ISIC_{i:07d}"
        if i % 12 == 11:
            fitz = ""  # null skin type → must be dropped
        else:
            fitz = FITZ[rng.integers(0, 6)]
        if i % 12 == 10:
            bm = "indeterminate/benign"  # must be dropped
        else:
            bm = "malignant" if rng.random() < 0.4 else "benign"
        rows.append(
            {
                "isic_id": isic_id,
                "attribution": "synthetic",
                "copyright_license": "CC-0",
                "age_approx": int(rng.integers(20, 90)),
                "anatom_site_general": "torso",
                "benign_malignant": bm,
                "diagnosis": "melanoma" if bm == "malignant" else "nevus",
                "fitzpatrick_skin_type": fitz,
                "patient_id": f"IP_{i % 7:07d}",
                "sex": "male" if rng.random() < 0.5 else "female",
            }
        )
        # Tiny JPEG whose mean brightness correlates with the label so a
        # model can actually learn from the fixture.
        appear_malignant = bm == "malignant"
        if label_noise and rng.random() < label_noise:
            appear_malignant = not appear_malignant
        mid = 120
        base = (mid - base_gap // 2 if appear_malignant
                else mid + base_gap // 2)
        img = rng.integers(0, noise, (image_size, image_size, 3)) + base
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(root, f"{isic_id}.jpg"), quality=90
        )

    with open(os.path.join(root, "metadata.csv"), "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    return rows


def random_instances(rng: np.random.Generator, n: int = 200) -> dict[int, dict]:
    """Random prediction-annotated instance dicts for metric tests."""
    out = {}
    for i in range(n):
        label = "malignant" if rng.random() < 0.4 else "benign"
        pred = label if rng.random() < 0.7 else (
            "benign" if label == "malignant" else "malignant"
        )
        out[i] = {
            "prediction": pred,
            "benign_malignant": label,
            "skin_tone": "dark" if rng.random() < 0.5 else "light",
            "sex": "female" if rng.random() < 0.5 else "male",
            "control": "poor" if rng.random() < 0.5 else "rich",
            "age": 50,
        }
    return out
