#!/usr/bin/env python
"""Import a reference (jpope8/skin-image-analysis) model artifact::

    python cli/import_reference.py <reference results folder> <out folder>
    python cli/import_reference.py ref/results/balanced_2024-10-12_09-22-38 \
        results/imported_balanced_2024-10-12_09-22-38
    python cli/import_reference.py skin_cancer_xception_model.keras \
        results/imported_xception [--classes a,b,...] [--image-size N]

Torch path: converts the reference's whole-module ``session_model.pth``
pickle (tone_bias_model.py:305-316) into our ``session_model.msgpack`` —
without importing the reference's code or executing the pickle — and
copies the frozen split CSVs plus the epoch-record JSON files.

Keras path (a ``.keras`` first argument): converts the TF pipeline's
saved Xception transfer model (jgi_ham_2018_tf.ipynb cell 75,
``skin_cancer_xception_model.keras``) with the notebook's raw-0-255
input convention folded exactly into the stem conv. ``--classes`` names
the label space (default benign,malignant / the 7 HAM dx classes);
``--image-size`` sets the serve resolution when the artifact's spatial
dims are dynamic.

Either way the output folder then works with every CLI here::

    python cli/tone_bias_test.py tone <out folder>       # fairness audit
    python cli/tone_bias_serve.py <out folder> --port 8000
    python cli/tone_bias_export.py <out folder> model.stablehlo
    python cli/tone_bias_train.py tone 5 <out folder>    # continue training

A bare ``session_model.pth`` file also works as the first argument.
"""

from __future__ import annotations

import json
import os
import sys

USAGE = (
    "Usage: <reference experiment folder | session_model.pth | "
    "model.keras> <output folder> [--classes a,b,...] [--image-size N]"
)


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    class_names = None
    image_size = None
    pos: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--classes" and i + 1 < len(argv):
            class_names = [c for c in argv[i + 1].split(",") if c]
            i += 2
        elif a == "--image-size" and i + 1 < len(argv):
            image_size = int(argv[i + 1])
            i += 2
        elif a.startswith("--"):
            print(f"unknown flag {a}")
            print(USAGE)
            return 1
        else:
            pos.append(a)
            i += 1
    if len(pos) != 2:
        print(USAGE)
        print("Example: ref_results/balanced_2024-10-12_09-22-38 "
              "results/imported_balanced_2024-10-12_09-22-38")
        return 1
    src, out = pos

    if src.endswith(".keras"):
        from skin_image_analysis_tpu.migrate import (
            KerasImportError,
            import_keras_experiment,
        )

        try:
            summary = import_keras_experiment(
                src, out, class_names=class_names, image_size=image_size
            )
        except KerasImportError as e:
            print(f"import failed: {e}")
            return 1
        print(json.dumps(summary, indent=2))
        print(f"imported -> {out}")
        return 0

    from skin_image_analysis_tpu.migrate import (
        TorchPickleError,
        import_reference_experiment,
    )

    if os.path.isfile(src):
        folder, model_name = os.path.split(src)
    else:
        folder, model_name = src, "session_model.pth"
    try:
        summary = import_reference_experiment(
            folder, out, model_name=model_name
        )
    except TorchPickleError as e:
        print(f"import failed: {e}")
        return 1
    print(json.dumps(summary, indent=2))
    print(f"imported -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
