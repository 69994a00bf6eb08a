#!/usr/bin/env python
"""Export a trained experiment for deployment serving::

    python cli/tone_bias_export.py <experiment folder> <out.stablehlo>
        [--canonical-size N] [--platforms tpu,cpu]

Serializes the FULL inference program (uint8 pixels -> preprocess ->
forward -> {log_probs, pred, p_malignant}) via jax.export with a
symbolic batch dimension: one self-contained StableHLO artifact (weights
embedded) serves any batch size on any JAX runtime without the model's
Python code — the TPU-native replacement for the reference's
pickle-the-module deployment (tone_bias_model.py:305-338). Writes a
JSON manifest next to the artifact.
"""

from __future__ import annotations

import os
import sys


def main(argv: list[str] | None = None) -> int:
    from skin_image_analysis_tpu.cli._common import parse

    argv = list(sys.argv[1:] if argv is None else argv)
    positional, opts = parse(
        argv, {"canonical-size": 0, "platforms": "", "quantize": "",
               "calib-root": "", "calib-rows": 256, "calib-mode": "max"},
        bool_flags={"normalize-imagenet", "best"},
    )
    if len(positional) != 2:
        print("Usage: <experiment folder> <out path> "
              "[--canonical-size N] [--platforms tpu,cpu] "
              "[--normalize-imagenet] "
              "[--quantize int8|int8-weights --calib-root <image root> "
              "[--calib-rows N] [--calib-mode max|percentile[:p]]]  "
              "(int8-weights works on ANY model "
              "family and needs no calibration; --calib-root there "
              "only feeds the fidelity report)")
        return 1
    folder, out_path = positional

    from skin_image_analysis_tpu.serve import export_model

    calib = report = None
    report_is_calib = False
    if opts["quantize"]:
        if not opts["calib-root"] and opts["quantize"] != "int8-weights":
            print("--quantize int8 needs --calib-root (the image root; "
                  "calibration rows come from the experiment's "
                  "session_train.csv, the fidelity report from "
                  "session_test.csv)")
            return 1
        if opts["calib-root"]:
            # weight-only quantization never consumes calibration rows —
            # only the fidelity report's held-out split; skip the
            # train-split decode (minutes on a real cohort)
            calib, report, report_is_calib = _load_calibration(
                folder, opts["calib-root"], opts["calib-rows"],
                report_only=opts["quantize"] == "int8-weights")

    from skin_image_analysis_tpu.cli._common import model_file

    manifest = export_model(
        folder, out_path,
        model_filename=os.path.basename(
            model_file(folder, best=opts["best"])),
        canonical_size=opts["canonical-size"] or None,
        # True forces it; default None = read the folder's
        # train_config.json (False if absent)
        normalize_imagenet=opts["normalize-imagenet"] or None,
        platforms=(
            [p.strip() for p in opts["platforms"].split(",") if p.strip()]
            or None
        ),
        quantize=opts["quantize"] or None,
        calib_mode=opts["calib-mode"],
        calib_pixels=calib,
        report_pixels=report,
        report_on_calibration_rows=report_is_calib,
    )
    if manifest.get("quantization"):
        print(f"quantization: {manifest['quantization']}")
    print(f"exported {manifest['bytes'] / 1e6:.1f} MB "
          f"({manifest['model']}, batch={manifest['input']['shape'][0]}, "
          f"platforms={manifest['platforms']}) -> {out_path}")
    print(f"manifest: {out_path}.json")
    return 0


def _load_calibration(folder: str, root: str, n_rows: int,
                      report_only: bool = False):
    from skin_image_analysis_tpu.serve.quantize import calibration_rows

    try:
        return calibration_rows(folder, root, n_rows,
                                report_only=report_only)
    except ValueError as e:
        raise SystemExit(str(e))


if __name__ == "__main__":
    raise SystemExit(main())
