"""HAM-10000 metadata ingest (the jgi_ham_2018_* notebooks' dataset).

The reference's HAM notebooks (jgi_ham_2018_tf.ipynb,
jgi_ham_2018_torch.ipynb ``HamDataset``) consume the HAM-10000 CSV
(lesion_id, image_id, dx, dx_type, age, sex, localization) with the
7-class ``dx`` labels {akiec, bcc, bkl, df, mel, nv, vasc}, and the TF
notebook binarizes to benign/malignant for the transfer-learning run.
This module provides both framings on the same LesionTable contract used
everywhere else, so the HAM-2018 configs in BASELINE.json run through the
standard pipeline.
"""

from __future__ import annotations

import pandas as pd

DX_CLASSES = ("akiec", "bcc", "bkl", "df", "mel", "nv", "vasc")

# Standard HAM binarization: melanoma, basal-cell carcinoma and actinic
# keratoses/intraepithelial carcinoma are the malignant classes.
MALIGNANT_DX = {"mel", "bcc", "akiec"}


def read_ham_metadata(
    csv_path: str, binary: bool = True
) -> pd.DataFrame:
    """HAM-10000 CSV → DataFrame in the ISIC LesionTable shape.

    Adds ``isic_id`` (from image_id), ``benign_malignant`` (binary
    framing) and keeps ``dx`` for the 7-class framing
    (label_column='dx' with class_names=DX_CLASSES).
    """
    df = pd.read_csv(csv_path)
    required = {"image_id", "dx"}
    missing = required - set(df.columns)
    if missing:
        raise ValueError(f"not a HAM-10000 metadata csv; missing {missing}")
    df = df.copy()
    df["isic_id"] = df["image_id"]
    df["benign_malignant"] = [
        "malignant" if dx in MALIGNANT_DX else "benign" for dx in df["dx"]
    ]
    # columns the fairness layer joins on; HAM has no Fitzpatrick labels,
    # so skin_tone stays absent unless provided upstream (e.g. via the
    # ITA pipeline's image_tone_binary estimates).
    if "sex" not in df.columns:
        df["sex"] = None
    if "age_approx" not in df.columns and "age" in df.columns:
        df["age_approx"] = df["age"]
    return df


def attach_ita_tone(df: pd.DataFrame, modal_ita_by_image: dict) -> pd.DataFrame:
    """Attach an estimated binary skin_tone column from modal-ITA values
    (data.ita.image_tone_binary semantics) so the fairness audit can run
    on cohorts without Fitzpatrick annotations."""
    from skin_image_analysis_tpu.data.ita import FITZ_THRESHOLDS

    df = df.copy()
    tones = []
    for image_id in df["isic_id"]:
        ita = modal_ita_by_image.get(image_id)
        if ita is None or ita != ita:  # missing or NaN
            tones.append(None)
        else:
            tones.append("light" if ita >= FITZ_THRESHOLDS[3] else "dark")
    df["skin_tone"] = tones
    return df
