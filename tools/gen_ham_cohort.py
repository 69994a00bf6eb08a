"""Generate a synthetic HAM-10000-scale cohort: 10,015 images at 450x600
(the real HAM dimensions), 7-class dx metadata with class-dependent tone
signal so the model can actually learn."""
import csv
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from skin_image_analysis_tpu.data.ham import DX_CLASSES

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ham_scale"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 10015
os.makedirs(root, exist_ok=True)
rng = np.random.default_rng(7)
# real HAM class frequencies (approx): nv dominates
freqs = {"nv": 0.67, "mel": 0.11, "bkl": 0.11, "bcc": 0.05,
         "akiec": 0.033, "vasc": 0.014, "df": 0.012}
classes = list(freqs)
p = np.array([freqs[c] for c in classes]); p /= p.sum()
rows = []
for i in range(n):
    image_id = f"ISIC_{i:07d}"
    dx = classes[rng.choice(len(classes), p=p)]
    rows.append({"lesion_id": f"HAM_{i:07d}", "image_id": image_id,
                 "dx": dx, "dx_type": "histo",
                 "age": int(rng.integers(20, 90)),
                 "sex": ["male", "female"][int(rng.integers(2))],
                 "localization": "back"})
    # class-dependent base color + blob so binary/dx heads can learn
    ci = DX_CLASSES.index(dx) if dx in DX_CLASSES else 0
    base = np.full((450, 600, 3), 120 + 12 * ci, np.float32)
    yy, xx = np.mgrid[0:450, 0:600]
    cy, cx = rng.integers(120, 330), rng.integers(150, 450)
    r = rng.integers(40, 110)
    blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
    base[blob] += 40 + 6 * ci
    base += rng.normal(0, 18, base.shape)
    img = np.clip(base, 0, 255).astype(np.uint8)
    Image.fromarray(img).save(os.path.join(root, f"{image_id}.jpg"),
                              quality=85)
    if i % 2000 == 0:
        print(i, flush=True)
with open(os.path.join(root, "HAM10000_metadata.csv"), "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
    w.writeheader()
    w.writerows(rows)
print("done", n)
