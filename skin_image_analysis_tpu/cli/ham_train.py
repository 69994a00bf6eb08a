#!/usr/bin/env python
"""HAM-10000 training CLI (jgi_ham_2018_* notebook configs)::

    python cli/ham_train.py <image root> <metadata csv> <epochs>
        [--classes binary|dx] [--model xception|resnet50|efficientnet_b0|skin_cancer_list]
        [--batch-size N] [--lr F] [--image-size N] [--freeze-backbone]
        [--keep-best accuracy|auc|f1|loss] [--early-stop N] [--out DIR]

``binary`` trains benign/malignant (mel/bcc/akiec malignant — the TF
notebook's transfer config); ``dx`` trains the 7-class dx labels (the
torch notebook's HamDataset framing). ``--keep-best`` saves
``session_model_best.msgpack`` at each improvement; ``--early-stop N``
stops after N non-improving epochs (metric defaults to ``accuracy``
here — every classify epoch evaluates; the flagship trainer defaults
to ``loss``).
"""

from __future__ import annotations

import os
import sys

from skin_image_analysis_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main(argv: list[str] | None = None) -> int:
    from skin_image_analysis_tpu.cli._common import init_runtime, parse

    init_runtime()

    argv = list(sys.argv[1:] if argv is None else argv)
    positional, opts = parse(
        argv,
        {"classes": "binary", "model": "xception", "batch-size": 32,
         "lr": 1e-3, "image-size": 224, "canonical-size": 256,
         "out": "ham_runs", "seed": 0, "steps-per-dispatch": 8,
         "keep-best": "", "early-stop": 0},
        bool_flags={"freeze-backbone"},
    )
    if len(positional) != 3:
        print("Usage: <image root> <metadata csv> <epochs> "
              "[--classes binary|dx] [--model NAME] "
              "[--keep-best METRIC] [--early-stop N] ...")
        return 1
    root, csv_path, epochs = positional[0], positional[1], int(positional[2])

    import numpy as np  # noqa: E402

    from skin_image_analysis_tpu.data.dataset import LesionTable  # noqa: E402
    from skin_image_analysis_tpu.data.ham import DX_CLASSES, read_ham_metadata  # noqa: E402
    from skin_image_analysis_tpu.train.classify import (  # noqa: E402
        ClassifyConfig,
        train_classifier,
    )

    df = read_ham_metadata(csv_path)
    # keep only rows whose image exists (HamDataset behavior)
    exists = [
        os.path.exists(os.path.join(root, f"{i}.jpg")) for i in df["isic_id"]
    ]
    df = df[np.asarray(exists)]
    rng = np.random.default_rng(opts["seed"])
    order = rng.permutation(len(df))
    cut = int(0.7 * len(df))
    train_df = df.iloc[order[:cut]]
    test_df = df.iloc[order[cut:]]

    if opts["classes"] == "dx":
        kw = dict(class_names=DX_CLASSES, label_column="dx")
        n_classes = 7
    else:
        kw = {}
        n_classes = 2
    train_table = LesionTable(train_df, root, **kw)
    test_table = LesionTable(test_df, root, **kw)

    cfg = ClassifyConfig(
        model_name=opts["model"], num_classes=n_classes,
        image_size=opts["image-size"], canonical_size=opts["canonical-size"],
        batch_size=opts["batch-size"], epochs=epochs,
        learning_rate=opts["lr"], seed=opts["seed"], out_dir=opts["out"],
        freeze_backbone=opts["freeze-backbone"],
        steps_per_dispatch=opts["steps-per-dispatch"],
        checkpoint_best=bool(opts["keep-best"]),
        best_metric=opts["keep-best"] or "accuracy",
        early_stop_patience=int(opts["early-stop"]),
    )
    out = train_classifier(train_table, test_table, cfg)
    print(f"final test metrics: {out['test_metrics']}")
    print(f"model artifact: {out['model_path']} (serve/export with "
          "tone_bias_serve.py / tone_bias_export.py)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
