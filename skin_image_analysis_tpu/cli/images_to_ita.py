#!/usr/bin/env python
"""ITA-matrix preprocessor CLI — the reference's ImagesToITAMatrices
(notebooks/ToneClassifier/ImagesToITAMatrices.py) rebuilt device-side::

    python cli/images_to_ita.py <image dir> <output dir>
        [--batch-size N] [--size N] [--summary-csv PATH]

Decodes every image, computes the per-pixel ITA matrix on the accelerator
in batches (vs the reference's per-image ProcessPoolExecutor(6) CPU loop),
and saves one ``<name>.npy`` per image. Resumable: images whose output
already exists are skipped (ImagesToITAMatrices.py:136-140). Optionally
writes a summary CSV with per-image modal ITA + Fitzpatrick band + binary
tone (the colourmapclassifier features).
"""

from __future__ import annotations

import os
import sys
import time

from skin_image_analysis_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    from skin_image_analysis_tpu.cli._common import parse

    argv = list(sys.argv[1:] if argv is None else argv)
    positional, opts = parse(
        argv, {"batch-size": 32, "size": 224, "summary-csv": ""}
    )
    if len(positional) != 2:
        print("Usage: <image dir> <output dir> [--batch-size N] [--size N] "
              "[--summary-csv PATH]")
        return 1
    image_dir, out_dir = positional
    os.makedirs(out_dir, exist_ok=True)

    import jax.numpy as jnp  # noqa: E402

    from skin_image_analysis_tpu.data.ita import ita_pipeline  # noqa: E402
    from skin_image_analysis_tpu.data.loader import decode_image  # noqa: E402

    names = sorted(
        n for n in os.listdir(image_dir)
        if n.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    # resumable: skip existing outputs
    todo = [
        n for n in names
        if not os.path.exists(
            os.path.join(out_dir, os.path.splitext(n)[0] + ".npy")
        )
    ]
    print(f"{len(names)} images, {len(todo)} to process")

    size = opts["size"]
    bs = opts["batch-size"]
    summary = []
    start = time.time()
    for i in range(0, len(todo), bs):
        chunk = todo[i : i + bs]
        batch = np.stack(
            [decode_image(os.path.join(image_dir, n), size) for n in chunk]
        )
        # pad to full batch so one shape compiles
        pad = bs - len(chunk)
        if pad:
            batch = np.concatenate([batch, np.zeros((pad, size, size, 3),
                                                    np.uint8)])
        out = ita_pipeline(jnp.asarray(batch))
        ita = np.asarray(out["ita"])[: len(chunk)]
        modal = np.asarray(out["modal_ita"])[: len(chunk)]
        tone = np.asarray(out["tone"])[: len(chunk)]
        for j, n in enumerate(chunk):
            stem = os.path.splitext(n)[0]
            np.save(os.path.join(out_dir, f"{stem}.npy"), ita[j])
            summary.append(
                {"image": stem, "modal_ita": float(modal[j]),
                 "tone": int(tone[j])}
            )
        print(f"  {min(i + bs, len(todo))}/{len(todo)}")
    elapsed = time.time() - start
    if todo:
        print(f"processed {len(todo)} images in {elapsed:.1f}s "
              f"({len(todo) / elapsed:.1f} img/s)")

    if opts["summary-csv"] and summary:
        import csv

        with open(opts["summary-csv"], "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["image", "modal_ita", "tone"])
            writer.writeheader()
            writer.writerows(summary)
        print(f"wrote {opts['summary-csv']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
