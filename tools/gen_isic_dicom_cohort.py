"""Generate a synthetic ISIC-2020-scale FULL-RESOLUTION DICOM cohort.

The real ISIC-2020 archive ships ~33k dermoscopy DICOMs at 1024px-class
resolution (jgi_isic_2020_torch.ipynb reads them with pydicom and
down-resizes inside DicomDataset); this writes n .dcm files at
``size``x``size`` in the archive's mixed transfer syntaxes —
encapsulated JPEG (1.2.840.10008.1.2.4.50, the dominant real syntax)
with a slice of uncompressed implicit-VR RGB — plus the tone-bias
``metadata.csv`` schema, so the FULL pipeline (extension probing,
from-scratch DICOM parse, canonical decode, arenas, training) can be
driven at real archive resolution.

Usage: python tools/gen_isic_dicom_cohort.py [root] [n] [size] [seed]
"""
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.test_dicom import make_encapsulated_jpeg, make_implicit_rgb

FITZ = ["I", "II", "III", "IV", "V", "VI"]

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/isic_fullres"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
size = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
seed = int(sys.argv[4]) if len(sys.argv) > 4 else 9
os.makedirs(root, exist_ok=True)
rng = np.random.default_rng(seed)
rows = []
yy, xx = np.mgrid[0:size, 0:size]
for i in range(n):
    isic_id = f"ISIC_{i:07d}"
    fitz = "" if i % 12 == 11 else FITZ[rng.integers(0, 6)]
    bm = ("indeterminate/benign" if i % 12 == 10
          else ("malignant" if rng.random() < 0.4 else "benign"))
    rows.append({
        "isic_id": isic_id, "attribution": "synthetic",
        "copyright_license": "CC-0", "age_approx": int(rng.integers(20, 90)),
        "anatom_site_general": "torso", "benign_malignant": bm,
        "diagnosis": "melanoma" if bm.startswith("malignant") else "nevus",
        "fitzpatrick_skin_type": fitz,
        "patient_id": f"IP_{i % 97:07d}",
        "sex": "male" if rng.random() < 0.5 else "female",
    })
    # Label-correlated brightness + a lesion blob so training is real.
    base = 90.0 if bm == "malignant" else 150.0
    img = np.full((size, size, 3), base, np.float32)
    cy, cx = rng.integers(size // 4, 3 * size // 4, 2)
    r = rng.integers(size // 10, size // 4)
    img[((yy - cy) ** 2 + (xx - cx) ** 2) < r * r] -= 35.0
    img += rng.normal(0, 20, (size, size, 3))
    arr = np.clip(img, 0, 255).astype(np.uint8)
    blob = make_implicit_rgb(arr) if i % 5 == 0 else make_encapsulated_jpeg(arr)
    with open(os.path.join(root, f"{isic_id}.dcm"), "wb") as f:
        f.write(blob)
    if i % 250 == 0:
        print(i, flush=True)
with open(os.path.join(root, "metadata.csv"), "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
    w.writeheader()
    w.writerows(rows)
print("done", n, "at", size)
