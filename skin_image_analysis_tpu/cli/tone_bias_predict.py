#!/usr/bin/env python
"""Batch inference CLI (serving path — new capability)::

    python cli/tone_bias_predict.py <image root> <experiment folder> <out.csv>
        [--batch-size N] [--metadata CSV] [--images] [--best]

Runs the trained model over a cohort and writes one row per image:
isic_id, prediction, p_malignant, benign_malignant (when labeled),
skin_tone, sex — the flat artifact downstream systems consume.

``--images`` scores every image file in ``<image root>`` directly (no
metadata needed — the production bulk-scoring mode for unlabeled
cohorts); rows then carry isic_id, prediction, p_malignant only.
``--best`` loads the --keep-best checkpoint.
"""

from __future__ import annotations

import os
import sys

from skin_image_analysis_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    from skin_image_analysis_tpu.cli._common import parse

    argv = list(sys.argv[1:] if argv is None else argv)
    positional, opts = parse(argv, {"batch-size": 64, "metadata": ""},
                             bool_flags={"best", "images"})
    if len(positional) != 3:
        print("Usage: <image root> <experiment folder> <out.csv> "
              "[--batch-size N] [--metadata CSV] [--images] [--best]")
        return 1
    root, folder, out_csv = positional

    from skin_image_analysis_tpu.data import LesionTable, read_isic_metadata
    from skin_image_analysis_tpu.data.loader import BatchIterator, HostImageStore
    from skin_image_analysis_tpu.models.cnn import build_model
    from skin_image_analysis_tpu.ops.preprocess import make_preprocess_fn
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib
    from skin_image_analysis_tpu.train.evaluate import collect_predictions

    unlabeled = bool(opts["images"])
    if unlabeled:
        # score every image file in the root — no metadata required
        # (the bulk-scoring mode for unlabeled production cohorts).
        # Extensions match case-insensitively (.JPG camera exports) and
        # stems dedupe: a name present under two extensions must yield
        # ONE row, since the loader resolves by stem anyway.
        exts = {".jpg", ".jpeg", ".png", ".dcm"}
        stems: dict[str, str] = {}
        for entry in os.scandir(root):
            if not entry.is_file():
                continue
            stem, ext = os.path.splitext(entry.name)
            if ext.lower() in exts:
                stems.setdefault(stem, entry.name)
        if not stems:
            raise SystemExit(f"--images: no image files under {root}")
        names = sorted(stems)
        # pixels are all that matters; the placeholder label satisfies
        # LesionTable's contract (same trick as calibration_rows)
        df = pd.DataFrame({"isic_id": names,
                           "benign_malignant": "benign"})
    elif opts["metadata"]:
        meta = opts["metadata"]
        df = read_isic_metadata(
            os.path.dirname(os.path.abspath(meta)) or root,
            csv_name=os.path.basename(meta), seed=0,
        )
    else:
        df = pd.read_csv(os.path.join(folder, "session_test.csv"), index_col=0)

    from skin_image_analysis_tpu.cli._common import model_file

    model_cfg, loaded = ckpt_lib.load_model(
        model_file(folder, best=opts["best"])
    )
    params, batch_stats = ckpt_lib.split_variables(loaded)
    model = build_model(model_cfg)
    table = LesionTable(df, root)
    store = HostImageStore(table, canonical_size=model_cfg.image_size)
    loader = BatchIterator(store, opts["batch-size"], shuffle=False)
    from skin_image_analysis_tpu.cli._common import input_convention

    norm, affine = input_convention(folder)
    out = collect_predictions(
        params, model.apply, loader,
        preprocess_fn=make_preprocess_fn(
            model_cfg.image_size, train=False, normalize_imagenet=norm,
            input_affine=affine,
        ),
        batch_stats=batch_stats,
    )
    # prediction NAMES come from the folder's label space (transfer
    # folders predict light/dark or HAM dx classes, not the default
    # benign/malignant — the index would be right but the name wrong)
    import json

    class_names = list(table.class_names)
    cfg_path = os.path.join(folder, "train_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            class_names = list(
                json.load(f).get("class_names", class_names))

    order = np.argsort(out["row_id"])
    rows = []
    for i in order:
        rid = int(out["row_id"][i])
        row = {
            "isic_id": str(table.metadata_df["isic_id"].iloc[rid]),
            "prediction": class_names[int(out["pred"][i])],
            "p_malignant": float(out["score_malignant"][i]),
        }
        if not unlabeled:
            inst = table.instance(rid)
            row.update(
                benign_malignant=inst["benign_malignant"],
                skin_tone=inst["skin_tone"],
                sex=inst["sex"],
            )
        rows.append(row)
    pd.DataFrame(rows).to_csv(out_csv, index=False)
    print(f"wrote {out_csv} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
