#!/usr/bin/env python
"""Import a reference (jpope8/skin-image-analysis) experiment folder::

    python cli/import_reference.py <reference results folder> <out folder>
    python cli/import_reference.py ref/results/balanced_2024-10-12_09-22-38 \
        results/imported_balanced_2024-10-12_09-22-38

Converts the reference's whole-module ``session_model.pth`` pickle
(tone_bias_model.py:305-316) into our ``session_model.msgpack`` —
without importing the reference's code or executing the pickle — and
copies the frozen split CSVs plus the epoch-record JSON files. The
output folder then works with every CLI here::

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


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 2:
        print("Usage: <reference experiment folder | session_model.pth> "
              "<output folder>")
        print("Example: ref_results/balanced_2024-10-12_09-22-38 "
              "results/imported_balanced_2024-10-12_09-22-38")
        return 1
    src, out = argv

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
