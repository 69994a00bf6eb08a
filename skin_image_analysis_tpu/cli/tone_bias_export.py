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
        argv, {"canonical-size": 0, "platforms": ""},
        bool_flags={"normalize-imagenet"},
    )
    if len(positional) != 2:
        print("Usage: <experiment folder> <out path> "
              "[--canonical-size N] [--platforms tpu,cpu] "
              "[--normalize-imagenet]")
        return 1
    folder, out_path = positional

    from skin_image_analysis_tpu.serve import export_model

    manifest = export_model(
        folder, out_path,
        canonical_size=opts["canonical-size"] or None,
        # True forces it; default None = read the folder's
        # train_config.json (False if absent)
        normalize_imagenet=opts["normalize-imagenet"] or None,
        platforms=(
            [p.strip() for p in opts["platforms"].split(",") if p.strip()]
            or None
        ),
    )
    print(f"exported {manifest['bytes'] / 1e6:.1f} MB "
          f"({manifest['model']}, batch={manifest['input']['shape'][0]}, "
          f"platforms={manifest['platforms']}) -> {out_path}")
    print(f"manifest: {out_path}.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
