#!/usr/bin/env python
"""Standalone evaluation CLI — reference surface
(tone_bias_test.py:565-652)::

    python cli/tone_bias_test.py <image root> <experiment folder>
    python cli/tone_bias_test.py ../tone results/balanced_2024-10-12_09-22-38/

Loads the experiment's frozen ``session_test.csv`` + model artifact,
runs the full fairness audit, prints the record and wall time.
"""

from __future__ import annotations

import json
import os
import sys
import time

from skin_image_analysis_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pandas as pd  # noqa: E402

from skin_image_analysis_tpu.data import LesionTable  # noqa: E402
from skin_image_analysis_tpu.data.loader import BatchIterator, HostImageStore  # noqa: E402
from skin_image_analysis_tpu.models.cnn import build_model  # noqa: E402
from skin_image_analysis_tpu.ops.preprocess import make_preprocess_fn  # noqa: E402
from skin_image_analysis_tpu.train import checkpoint as ckpt_lib  # noqa: E402
from skin_image_analysis_tpu.train.evaluate import evaluate_fairness  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    from skin_image_analysis_tpu.cli._common import parse

    argv = list(sys.argv[1:] if argv is None else argv)
    positional, opts = parse(
        argv, {"metadata": "", "batch-size": 64, "grid": ""},
        bool_flags={"best"},
    )
    if len(positional) != 2:
        print("Usage: <root directory of ISIC images> <root dir of model> "
              "[--metadata other_metadata.csv] [--grid out.png] [--best]")
        print("Example: tone results/balanced_2024-10-12_09-22-38/")
        print("--metadata evaluates the model cross-dataset against a "
              "different cohort (e.g. the HIBA subset) instead of the "
              "experiment's frozen test split")
        return 1
    root, folder = positional

    start = time.time()
    if opts["metadata"]:
        from skin_image_analysis_tpu.data import read_isic_metadata

        test_df = read_isic_metadata(
            os.path.dirname(os.path.abspath(opts["metadata"])) or root,
            csv_name=os.path.basename(opts["metadata"]),
            seed=0,
        )
    else:
        test_df = pd.read_csv(
            os.path.join(folder, "session_test.csv"), index_col=0
        )
    from skin_image_analysis_tpu.cli._common import model_file

    model_cfg, loaded = ckpt_lib.load_model(
        model_file(folder, best=opts["best"])
    )
    params, batch_stats = ckpt_lib.split_variables(loaded)
    model = build_model(model_cfg)
    table = LesionTable(test_df, root)
    store = HostImageStore(table, canonical_size=model_cfg.image_size)
    loader = BatchIterator(store, batch_size=opts["batch-size"], shuffle=False)
    from skin_image_analysis_tpu.cli._common import input_convention

    norm, affine = input_convention(folder)
    eval_pre = make_preprocess_fn(
        model_cfg.image_size, train=False, normalize_imagenet=norm,
        input_affine=affine,
    )
    record = evaluate_fairness(
        params, model.apply, loader, table,
        preprocess_fn=eval_pre,
        batch_stats=batch_stats,
    )
    print(json.dumps(record, indent=2))

    if opts["grid"]:
        # prediction-grid figure (reference visualize_model,
        # tone_bias_test.py:69-96)
        import numpy as np

        from skin_image_analysis_tpu.explain.viz import (
            visualize_predictions_grid,
        )
        from skin_image_analysis_tpu.train.evaluate import collect_predictions

        out = collect_predictions(
            params, model.apply, loader,
            preprocess_fn=eval_pre,
            batch_stats=batch_stats,
        )
        k = min(6, len(out["pred"]))
        row_ids = out["row_id"][:k]
        images = store.images[row_ids].astype(np.float32) / 255.0
        pred_names = [table.class_names[int(p)] for p in out["pred"][:k]]
        true_names = [
            table.instance(int(r))["benign_malignant"] for r in row_ids
        ]
        visualize_predictions_grid(
            images, pred_names, true_names, n_images=k,
            save_path=opts["grid"],
        )
        print(f"wrote {opts['grid']}")
    elapsed = time.time() - start
    print(f"Evaluation complete in {elapsed // 60:.0f}m {elapsed % 60:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
