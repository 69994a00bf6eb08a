"""ISIC-2020 DICOM ingest (gated).

The reference reads the ISIC-2020 Challenge DICOMs with pydicom in its
exploratory notebooks (jgi_isic_2020_torch.ipynb ``DicomDataset``;
jgi_ham_2018_tf.ipynb cells 83-96). pydicom is not installed in this
environment, so this module gates on importability: with pydicom present
it decodes pixel arrays (applying Modality/VOI rescale when tagged) into
the same canonical-uint8 contract as the JPEG path; without it, a clear
ImportError points at the JPEG path.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def have_pydicom() -> bool:
    try:
        import pydicom  # noqa: F401

        return True
    except ImportError:
        return False


def read_dicom_image(path: str) -> np.ndarray:
    """One DICOM file → uint8 RGB HWC array."""
    try:
        import pydicom
    except ImportError as e:
        raise ImportError(
            "pydicom is not available in this environment; convert DICOMs "
            "to JPEG offline or install pydicom to use the ISIC-2020 "
            "archive path"
        ) from e

    ds = pydicom.dcmread(path)
    arr = ds.pixel_array
    slope = float(getattr(ds, "RescaleSlope", 1.0))
    intercept = float(getattr(ds, "RescaleIntercept", 0.0))
    arr = arr.astype(np.float32) * slope + intercept
    lo, hi = float(arr.min()), float(arr.max())
    if hi > lo:
        arr = (arr - lo) / (hi - lo)
    arr = (arr * 255.0).astype(np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[-1] != 3:
        arr = arr[..., :3]
    return arr


class DicomFolder:
    """Minimal folder reader mirroring the notebook DicomDataset: lists
    ``*.dcm``, exposes decode to canonical uint8."""

    def __init__(self, root: str, canonical_size: int = 224):
        self.root = root
        self.size = canonical_size
        self.names: Sequence[str] = sorted(
            n for n in os.listdir(root) if n.lower().endswith(".dcm")
        )

    def __len__(self) -> int:
        return len(self.names)

    def decode(self, idx: int) -> np.ndarray:
        import cv2

        img = read_dicom_image(os.path.join(self.root, self.names[idx]))
        interp = cv2.INTER_AREA if img.shape[0] > self.size else cv2.INTER_LINEAR
        return cv2.resize(img, (self.size, self.size), interpolation=interp)
