#!/usr/bin/env python
"""Skin-tone classifier training CLI — the ToneClassifier sub-project's
trainer surface (notebooks/ToneClassifier/CNNTrial.py)::

    python cli/tone_classifier_train.py <image root> <epochs>
        [--model resnet50|resnet18|xception|efficientnet_b0|skin_cancer_list]
        [--batch-size N] [--lr F] [--image-size N] [--oversample]
        [--freeze-backbone] [--input rgb|ita] [--five-crop]
        [--keep-best accuracy|auc|f1|loss] [--early-stop N]
        [--no-class-weights] [--out DIR]

``--keep-best`` saves ``session_model_best.msgpack`` at each metric
improvement; ``--early-stop N`` stops after N non-improving epochs
(metric defaults to ``accuracy`` — every classify epoch evaluates).

``--input ita`` trains on fused on-device [ITA/90, skin-mask] channels —
stage 3 of the ToneClassifier plan (readme.md's "ITA-matrix CNN", which
the reference only prepared .npy matrices for). ``--five-crop`` evaluates
with 4-corner+center test-time augmentation (the documented
CNNTrialDataset.py:61-65 experiment) as one 5x-batched forward.

Splits the cohort 70/30 (TestTrainSplit semantics), trains the ResNet
transfer model on {light, dark} Fitzpatrick-derived labels with
class-weighted loss + flip/crop/ImageNet-normalize augmentation, and logs
per-step losses and per-epoch accuracy/precision/recall/F1.
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
        {"model": "resnet50", "batch-size": 32, "lr": 1e-3,
         "image-size": 224, "out": "tone_runs", "seed": 0,
         "canonical-size": 256, "input": "rgb",
         "steps-per-dispatch": 8, "keep-best": "", "early-stop": 0},
        bool_flags={"oversample", "no-class-weights", "freeze-backbone",
                    "five-crop"},
    )
    if len(positional) != 2:
        print("Usage: <image root> <epochs> [--model NAME] [--batch-size N]"
              " [--lr F] [--image-size N] [--oversample]"
              " [--freeze-backbone] [--input rgb|ita] [--five-crop]"
              " [--keep-best METRIC] [--early-stop N]"
              " [--no-class-weights] [--out DIR]")
        return 1
    root, epochs = positional[0], int(positional[1])

    import pandas as pd  # noqa: E402

    from skin_image_analysis_tpu.data.ingest import shuffle_split  # noqa: E402
    from skin_image_analysis_tpu.toneclassifier.trainer import (  # noqa: E402
        ToneTrainConfig,
        train_tone_classifier,
    )

    df = pd.read_csv(os.path.join(root, "metadata.csv"))
    df = df[df["fitzpatrick_skin_type"].notna()]
    train_df, test_df = shuffle_split(df, ratio=0.7, seed=opts["seed"])

    cfg = ToneTrainConfig(
        model_name=opts["model"],
        image_size=opts["image-size"],
        canonical_size=opts["canonical-size"],
        batch_size=opts["batch-size"],
        epochs=epochs,
        learning_rate=opts["lr"],
        use_class_weights=not opts["no-class-weights"],
        oversample=opts["oversample"],
        freeze_backbone=opts["freeze-backbone"],
        input_mode=opts["input"],
        five_crop_eval=opts["five-crop"],
        seed=opts["seed"],
        out_dir=opts["out"],
        steps_per_dispatch=opts["steps-per-dispatch"],
        keep_best=opts["keep-best"],
        early_stop_patience=int(opts["early-stop"]),
    )
    out = train_tone_classifier(train_df, test_df, root, cfg)
    print(f"final test metrics: {out['test_metrics']}")
    print(f"metrics log: {os.path.join(cfg.out_dir, 'metrics.jsonl')}")
    print(f"model artifact: {out['model_path']} (serve/export with "
          "tone_bias_serve.py / tone_bias_export.py)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
