"""LesionTable — the metadata<->tensor bridge.

The reference's ``HibaDataset`` returns ``(image, label, idx)`` triples so
predictions can be re-associated with full metadata rows after shuffling
(tone_bias_dataset.py:343, rationale tone_bias_test.py:218-227). The
TPU-native equivalent is :class:`LesionTable`: a frozen view over the split
DataFrame that exposes

- dense numpy arrays (``labels``, ``row_ids`` and integer *group codes* for
  skin_tone / sex / control) that travel on-device inside the batch dict
  ``{"pixels", "label", "row_id"}``; and
- the per-row ``instance(idx)`` dict with the exact keys the reference's
  ``lookup_path`` emits (tone_bias_dataset.py:364-393), used by the
  fairness layer and CLIs.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import numpy as np
import pandas as pd

CLASS_NAMES = ("benign", "malignant")

# Fixed vocabulary → integer codes used by the on-device metric reductions.
GROUP_VOCABS: dict[str, tuple[str, ...]] = {
    "skin_tone": ("light", "dark"),
    "sex": ("male", "female"),
    "control": ("poor", "rich"),
}


def _encode(values: Sequence[Any], vocab: tuple[str, ...]) -> np.ndarray:
    """Map values to vocab indices; unknown/missing → -1 (excluded from groups)."""
    lut = {v: i for i, v in enumerate(vocab)}
    return np.asarray([lut.get(v, -1) for v in values], dtype=np.int32)


class LesionTable:
    """Immutable table of lesion instances for one split (train or test)."""

    def __init__(
        self,
        metadata_df: pd.DataFrame,
        root_dir: str,
        class_names: Sequence[str] = CLASS_NAMES,
        label_column: str = "benign_malignant",
    ):
        self.metadata_df = metadata_df.reset_index(drop=True)
        self.root_dir = root_dir
        self.class_names = tuple(class_names)
        self.label_column = label_column

        values = self.metadata_df[label_column]
        self.labels = _encode(values, self.class_names)
        if (self.labels < 0).any():
            bad = sorted(set(values) - set(self.class_names))
            raise ValueError(f"unknown {label_column} values: {bad}")
        self.row_ids = np.arange(len(self.metadata_df), dtype=np.int32)
        self.group_codes = {
            col: _encode(self.metadata_df[col], vocab)
            for col, vocab in GROUP_VOCABS.items()
            if col in self.metadata_df.columns
        }

    def __len__(self) -> int:
        return len(self.metadata_df)

    def get_class_names(self) -> tuple[str, ...]:
        return self.class_names

    def get_class(self, index: int) -> str:
        return self.class_names[index]

    #: probe order when ``<isic_id>.jpg`` is absent — the ISIC-2020
    #: archive distributes ``<isic_id>.dcm`` DICOMs (jgi_isic_2020
    #: notebook); png covers re-exports; uppercase variants cover
    #: camera exports (.JPG) on case-sensitive filesystems
    _EXT_PROBE = (".jpg", ".jpeg", ".png", ".dcm",
                  ".JPG", ".JPEG", ".PNG", ".DCM")

    def get_file_path(self, image_name: str) -> str:
        """``<root>/<isic_id>.jpg`` (reference: tone_bias_dataset.py:357-362),
        falling back through ``.jpeg``/``.png``/``.dcm`` when the jpg is
        not on disk (probed once per image, memoized — file_paths() runs
        per loader init and per instance lookup; the loader dispatches
        decode by extension)."""
        cache = self.__dict__.setdefault("_path_cache", {})
        hit = cache.get(image_name)
        if hit is not None:
            return hit
        default = os.path.join(self.root_dir, image_name + ".jpg")
        path = default
        if not os.path.exists(default):
            for ext in self._EXT_PROBE[1:]:
                p = os.path.join(self.root_dir, image_name + ext)
                if os.path.exists(p):
                    path = p
                    break
            # else: missing either way; decode reports the row
        cache[image_name] = path
        return path

    def file_paths(self) -> list[str]:
        return [self.get_file_path(n) for n in self.metadata_df["isic_id"]]

    def instance(self, idx: int) -> dict[str, Any]:
        """Full metadata dict for row ``idx`` — key set matches the
        reference's ``lookup_path`` (tone_bias_dataset.py:389-392)."""
        row = self.metadata_df.iloc[int(idx)]
        image_name = row["isic_id"]
        return {
            "file_path": self.get_file_path(image_name),
            "image_name": image_name,
            "patient_id": row.get("patient_id"),
            "diagnosis": row.get("diagnosis"),
            "benign_malignant": row["benign_malignant"],
            "age": row.get("age_approx"),
            "sex": row.get("sex"),
            "location": row.get("anatom_site_general"),
            "skin_type": row.get("fitzpatrick_skin_type"),
            "skin_tone": row.get("skin_tone"),
            "control": row.get("control"),
        }

    # Back-compat alias mirroring the reference API name.
    lookup_path = instance

    def instances_for(self, row_ids: Sequence[int]) -> dict[int, dict]:
        return {int(i): self.instance(int(i)) for i in row_ids}
